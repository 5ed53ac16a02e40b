"""Retrieval-index and corpus-model construction over ``documents``.

Three training-data-pipeline operators the reference's scraper-era
code never had but a 100 TB corpus engine needs:

- ``inverted_index_stats``: posting-list construction (term -> df, cf,
  best document, posting head) — the batch half of a retrieval index,
  complementing ``bm25_topk``'s query-time half.
- ``nb_token_label_stats``: class-conditional token statistics with
  add-one smoothing — the exact counts a naive-Bayes / fastText-style
  quality-filter trainer consumes, expressed as two hash aggregations.
- ``doc_winnowing_fingerprints``: winnowing fingerprint selection
  (Schleimer et al., SIGMOD 2002 — the MOSS algorithm): k-gram rolling
  hashes, minimum per sliding window, distinct selected values. All
  per-document array math — zero shuffles beyond the scan fan-out.

Everything is value-verified against DuckDB: hashes are the 60-bit
md5 family (cross-engine exact), scores go through ratio6's pure-int
rescaling, every top-k carries a unique-key tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources.io import fan_out, load_table
from .catalog import QuerySpec, ratio6, ratio6_sql, register
from .text_queries import _SQL_TOKS

# 60-bit md5 int of an arbitrary string expression (the cross-engine
# hash family shared with minhash_md5_near_dups).
def _md5_60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _sql_md5_60(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# --- inverted_index_stats: posting-list construction -----------------------
# term -> document frequency, collection frequency, the best document
# (highest tf, smallest doc_id on ties), and the posting-list head
# (the 5 smallest doc_ids). Scale shape: one shuffle to the
# (term, doc) grain, one to the term grain; the posting head is taken
# through a row_number window BEFORE any collect_list, so no task ever
# materializes a full posting list (at 100 TB a hot term's postings
# are millions of rows — slicing after collect would OOM the executor;
# slicing before keeps state at 5 rows per term).

def _inverted_index(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    tf = (
        d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # best doc per term: max over (tf, -doc_id) picks highest tf,
    # then smallest doc_id — a single max-aggregate, no window.
    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
        F.max(F.struct(F.col("tf"), (-F.col("doc_id")).alias("nd"))).alias("_b"),
    )
    head = (
        tf.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("term").orderBy(F.col("doc_id"))
            ),
        )
        .filter(F.col("rn") <= 5)
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("posting_head"))
    )
    return (
        stats.join(head, "term")
        .select(
            "term",
            "df",
            "cf",
            F.col("_b.tf").alias("top_doc_tf"),
            (-F.col("_b.nd")).alias("top_doc_id"),
            "posting_head",
        )
        .orderBy(F.col("df").desc(), F.col("cf").desc(), F.col("term"))
        .limit(50)
    )


_INVERTED_SQL = f"""
WITH tf AS (
  SELECT term, doc_id, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents)
  GROUP BY term, doc_id
),
ranked AS (
  SELECT term, doc_id, tf,
    ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS brn
  FROM tf
)
SELECT t.term,
  COUNT(*) AS df,
  CAST(SUM(t.tf) AS BIGINT) AS cf,
  MAX(CASE WHEN r.brn = 1 THEN r.tf END) AS top_doc_tf,
  MAX(CASE WHEN r.brn = 1 THEN r.doc_id END) AS top_doc_id,
  (list_sort(list(t.doc_id)))[1:5] AS posting_head
FROM tf t
JOIN ranked r ON t.term = r.term AND t.doc_id = r.doc_id
GROUP BY t.term
ORDER BY df DESC, cf DESC, t.term
LIMIT 50
"""

register(QuerySpec(
    "inverted_index_stats", _inverted_index, _INVERTED_SQL,
    "posting-list construction: term -> df/cf, best doc (tf-desc "
    "tie doc_id), 5-smallest-doc posting head taken through a window "
    "before any collect (full lists never materialize)",
    ("text", "index", "agg"),
))


# --- nb_token_label_stats: naive-Bayes class-conditional counts ------------
# For each (lang, token): in how many documents of that language does
# the token appear (document grain, not occurrence grain), versus how
# many documents of OTHER languages — the exact sufficient statistics
# of a multinomial/Bernoulli naive-Bayes quality filter. The
# discriminativeness score is the add-one-smoothed likelihood ratio
#   (df_in+1)(N_out+2) / (df_out+1)(N_in+2)
# computed in pure int64 via ratio6 (num*2e6 stays in int64 up to
# ~50M documents per class; beyond that, rescale to per-million counts
# first). Top 10 tokens per language by (score desc, token).
# Scale shape: two hash aggregations plus a broadcast of the 5-row
# class-size table; the final window partitions by language only
# AFTER the data has collapsed to (lang, token) grain.

def _nb_token_label(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    per_doc = d.select(
        "lang", "doc_id",
        F.explode(F.array_distinct(X.tokens(F.col("text")))).alias("token"),
    )
    df_cl = per_doc.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("df_in"))
    df_tot = df_cl.groupBy("token").agg(F.sum("df_in").alias("df_all"))
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_in"))
    total = d.agg(F.count(F.lit(1)).alias("n_all"))
    scored = (
        df_cl.join(df_tot, "token")
        .join(F.broadcast(sizes), "lang")
        .crossJoin(F.broadcast(total))
        .select(
            "lang", "token", "df_in",
            (F.col("df_all") - F.col("df_in")).alias("df_out"),
            "n_in",
            ratio6(
                "(df_in + 1) * (n_all - n_in + 2)",
                "(df_all - df_in + 1) * (n_in + 2)",
            ).alias("nb_score"),
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("nb_score").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "token", "df_in", "df_out",
                F.col("n_in").alias("n_docs_lang"), "nb_score")
        .orderBy("lang", F.col("nb_score").desc(), "token")
    )


_NB_SQL = f"""
WITH per_doc AS (
  SELECT lang, doc_id, unnest(list_distinct({_SQL_TOKS})) AS token
  FROM documents
),
df_cl AS (
  SELECT lang, token, COUNT(*) AS df_in FROM per_doc GROUP BY lang, token
),
df_tot AS (SELECT token, CAST(SUM(df_in) AS BIGINT) AS df_all FROM df_cl GROUP BY token),
sizes AS (SELECT lang, COUNT(*) AS n_in FROM documents GROUP BY lang),
total AS (SELECT COUNT(*) AS n_all FROM documents),
scored AS (
  SELECT c.lang, c.token, c.df_in, t.df_all - c.df_in AS df_out, s.n_in,
    {ratio6_sql("(c.df_in + 1) * (n_all - s.n_in + 2)",
                "(t.df_all - c.df_in + 1) * (s.n_in + 2)")} AS nb_score
  FROM df_cl c JOIN df_tot t ON c.token = t.token
  JOIN sizes s ON c.lang = s.lang CROSS JOIN total
)
SELECT lang, token, df_in, df_out, n_in AS n_docs_lang, nb_score
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY lang ORDER BY nb_score DESC, token) AS rn
  FROM scored
)
WHERE rn <= 10
ORDER BY lang, nb_score DESC, token
"""

register(QuerySpec(
    "nb_token_label_stats", _nb_token_label, _NB_SQL,
    "naive-Bayes sufficient statistics: per-language document "
    "frequencies and add-one likelihood-ratio scores (pure-int64 "
    "ratio6), top 10 discriminative tokens per language",
    ("text", "ml", "agg"),
))


# --- doc_winnowing_fingerprints: MOSS-style fingerprint selection ----------
# Per document: hash every k-gram (k=3 tokens, 60-bit md5), slide a
# w=4 window over the hash sequence, record the minimum of each
# window; the distinct recorded values are the document's winnowing
# fingerprints (guaranteed to include at least one hash from every
# w-window — the property that makes shared-substring detection
# robust to alignment). Everything is per-row higher-order-function
# array math: the only exchange in the plan is the scan fan-out, so
# the operator is embarrassingly parallel at any scale.

_WIN_K = 3   # tokens per gram
_WIN_W = 4   # grams per window


def _winnowing(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    toks = X.tokens(F.col("text"))
    grams = F.transform(
        X.shingle_starts(F.size(toks), _WIN_K),
        lambda i: _md5_60(F.concat_ws(" ", F.slice(toks, i, _WIN_K))),
    )
    wins = F.transform(
        X.shingle_starts(F.size(F.col("hs")), _WIN_W),
        lambda j: F.array_min(F.slice(F.col("hs"), j, _WIN_W)),
    )
    fps = F.array_distinct(F.col("wins"))
    return (
        d.select("doc_id", grams.alias("hs"))
        .select("doc_id", F.size("hs").alias("n_grams"), wins.alias("wins"))
        .select(
            "doc_id", "n_grams",
            F.size("wins").alias("n_windows"),
            F.size(fps).alias("n_fps"),
            F.array_min(fps).alias("fp_min"),
            F.array_max(fps).alias("fp_max"),
            F.when(
                F.size("wins") > 0, ratio6("size(array_distinct(wins))", "size(wins)")
            ).alias("fp_density"),
        )
        .orderBy("doc_id")
    )


_WINNOW_SQL = f"""
WITH g AS (
  SELECT doc_id,
    list_transform(
      range(1, greatest(len(toks) - {_WIN_K - 1}, 0) + 1),
      i -> {_sql_md5_60(f"array_to_string(toks[i:i+{_WIN_K - 1}], ' ')")}
    ) AS hs
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
),
w AS (
  SELECT doc_id, len(hs) AS n_grams,
    list_transform(
      range(1, greatest(len(hs) - {_WIN_W - 1}, 0) + 1),
      j -> list_min(hs[j:j+{_WIN_W - 1}])
    ) AS wins
  FROM g
)
SELECT doc_id, n_grams,
  len(wins) AS n_windows,
  len(list_distinct(wins)) AS n_fps,
  list_min(list_distinct(wins)) AS fp_min,
  list_max(list_distinct(wins)) AS fp_max,
  CASE WHEN len(wins) > 0 THEN
    {ratio6_sql("len(list_distinct(wins))", "len(wins)")}
  END AS fp_density
FROM w
ORDER BY doc_id
"""

register(QuerySpec(
    "doc_winnowing_fingerprints", _winnowing, _WINNOW_SQL,
    "winnowing fingerprint selection (k-gram md5 hashes, min per "
    "sliding window, distinct survivors) — per-document array math, "
    "zero shuffles beyond the scan fan-out",
    ("text", "dedup", "fingerprint"),
))
