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
        # comma-join the (already window-sliced) head: the driver's pandas
        # canonicalizer cannot hash raw list cells, same rule as
        # customer_order_history (analytics_queries.py:23-26).
        .agg(
            F.array_join(
                F.sort_array(F.collect_list("doc_id")), ","
            ).alias("posting_head")
        )
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
  array_to_string((list_sort(list(t.doc_id)))[1:5], ',') AS posting_head
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
# computed in pure int64 via ratio6. Headroom (r7 ADVICE correction):
# ratio6's internal x2,000,000 rescale means the NUMERATOR product
# (df_in+1)(N_out+2) must stay <= 4.6e12 — with df_in up to the class
# size and N_out up to the corpus, that is ~2M docs per class against
# a ~2M-doc complement (NOT the ~50M a bare int64 product suggests);
# beyond that, rescale df/N to per-thousand units before the multiply.
# DuckDB errors loudly on overflow, non-ANSI Spark wraps silently, so
# the assert_true guard below raises instead.
# Top 10 tokens per language by (score desc, token).
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
    # loud ceiling on ratio6's x2e6 rescale: numerator product < 4.6e12
    guarded_df_in = F.coalesce(
        F.assert_true(
            (F.col("df_in") + 1) * (F.col("n_all") - F.col("n_in") + 2)
            < F.lit(4_600_000_000_000),
            F.lit("nb_token_label_stats: (df_in+1)*(N_out+2) exceeds "
                  "ratio6 int64 headroom (x2e6 rescale) — rescale "
                  "counts to per-thousand units first"),
        ).cast("long"),
        F.col("df_in"),
    )
    scored = (
        df_cl.join(df_tot, "token")
        .join(F.broadcast(sizes), "lang")
        .crossJoin(F.broadcast(total))
        .withColumn("df_in", guarded_df_in)
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


def _shift(c: Column, by: int) -> Column:
    """The array minus its first ``by`` elements (element-aligned
    shift for zip_with sliding-window composition)."""
    return F.slice(c, by + 1, F.greatest(F.size(c) - by, F.lit(0)))


def _winnowing(spark: SparkSession, sf: str) -> DataFrame:
    # Two evaluation traps shape this query (measured 275 s -> 1 s at
    # the sf1 tier across the fixes):
    #
    # 1. No common-subexpression elimination inside higher-order-
    #    function lambdas: `slice(hs, j, w)` per window re-evaluates
    #    the WHOLE upstream hs expression (tokenize + md5) once per
    #    window -> O(n^2) md5 passes per document. The window minima
    #    are instead composed shift-and-zip (zip_with the array with
    #    its shifted self: pairwise least, then min-of-pairs 2 apart
    #    for w=4) — element-wise, constant re-evaluation. zip_with
    #    NULL-PADS the shorter side, so every composed array is
    #    re-sliced to the true sliding length before the padded tail
    #    is read (concat_ws skips nulls, least ignores them —
    #    silently wrong values the DuckDB gate would catch).
    # 2. CollapseProject inlines aliased columns into every consumer:
    #    seven stat columns referencing `wins` re-run the whole chain
    #    seven times. Each stage is let-bound (functions/binding.py)
    #    so it evaluates once, and the multi-column result leaves the
    #    expression through ONE exploded single-element struct — a
    #    generator barrier projections cannot collapse through.
    from ..functions.binding import let

    d = fan_out(load_table(spark, sf, "documents"))

    def _win(c: Column, by: int, f) -> Column:
        return F.slice(
            F.zip_with(c, _shift(c, by), f),
            1, F.greatest(F.size(c) - by, F.lit(0)),
        )

    def _stats(fp: Column, w: Column, hs: Column) -> Column:
        nf, nw = F.size(fp), F.size(w)
        density = F.when(
            nw > 0,
            # ratio6's exact half-up int rescale; counts are far below
            # 2^53 so the double divide+floor equals integer div
            F.floor((nf * 2_000_000 + nw) / (2 * nw)).cast("double")
            / F.lit(1_000_000.0),
        )
        return F.struct(
            F.size(hs).alias("n_grams"), nw.alias("n_windows"),
            nf.alias("n_fps"), F.array_min(fp).alias("fp_min"),
            F.array_max(fp).alias("fp_max"), density.alias("fp_density"),
        )

    body = let(X.tokens(F.col("text")), lambda tk: let(
        F.slice(
            F.zip_with(
                _win(tk, 1, lambda a, b: F.concat_ws(" ", a, b)),
                _shift(tk, 2), lambda a, c: F.concat_ws(" ", a, c)),
            1, F.greatest(F.size(tk) - 2, F.lit(0)),
        ),
        lambda g3: let(F.transform(g3, _md5_60), lambda hs: let(
            _win(_win(hs, 1, lambda a, b: F.least(a, b)), 2,
                 lambda a, b: F.least(a, b)),
            lambda w: let(F.array_distinct(w),
                          lambda fp: _stats(fp, w, hs)),
        )),
    ))
    return (
        d.select("doc_id", F.explode(F.array(body)).alias("s"))
        .select("doc_id", "s.*")
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
    ("text", "dedup", "fingerprint", "bench"),
))


# --- rrf_hybrid_fusion: reciprocal-rank fusion of sparse + dense ------------
# The hybrid-retrieval composition every RAG/search stack runs: one
# query (document 0 / vector 0), a BM25 lexical ranking over the
# corpus and an exact cosine dense ranking over the embeddings
# (vec_id aligns 1:1 with doc_id in the lake), fused with
# RRF(d) = sum over lists of 1e6 div (60 + rank_d) in pure integers.
# Both input lists are truncated to their top-100 BEFORE fusion (the
# standard k-bounded RRF — at 100 TB neither ranking ever
# materializes beyond its cutoff). Sparse scores reuse bm25_topk's
# fully rational DECIMAL(38) formula (k1=6/5, b=3/4, ratio idf);
# dense ranks come from the proven brute-force cosine family. The
# only corpus-sized exchanges are the two index aggregations; the
# fusion itself is a 200-row full-outer join.

_RRF_K = 60
_RRF_CUT = 100
_RRF_TOP = 15


def _rrf_fusion(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import similarity_search as ANN

    d = fan_out(load_table(spark, sf, "documents"))
    e = load_table(spark, sf, "embeddings")

    # dense arm: exact cosine ranks against vector 0
    dense = (
        ANN.brute_force_topk(
            e, e.filter(F.col("vec_id") == 0), "vec_id", "embedding",
            k=_RRF_CUT, score_decimals=6,
        )
        .select(F.col("neighbor_id").alias("doc_id"),
                F.col("rnk").cast("long").alias("dense_rank"))
    )

    # sparse arm: BM25 over the 3 strongest terms of document 0
    toks = d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    top3 = (
        tf.filter(F.col("doc_id") == 0)
        .withColumn("qrn", F.row_number().over(
            Window.orderBy(F.desc("tf"), F.asc("w"))))
        .filter(F.col("qrn") <= 3)
        .select("w")
    )
    # document frequency counted ONLY for the 3 query terms (was a
    # full-vocabulary groupBy(w) whose other ~|V| rows were thrown
    # away at the 3-term join — guide §1.2: don't compute what you
    # discard; the semi-joined count is identical for those terms)
    qterms = (
        tf.join(F.broadcast(top3), "w")
        .groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    scalars = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("t_tokens"),
    )
    # DECIMAL(38) ceiling (r7 ADVICE): DuckDB's twin runs in HUGEINT
    # (int128, ~1.7e38 max) but Spark decimal products NULL silently in
    # non-ANSI mode past precision 38, so the engines diverge exactly
    # when the x2e6-rescaled numerator (n_docs+1)*22*tf*t_tokens*2e6
    # leaves 38 digits — i.e. n_docs * tf * t_tokens > ~2.3e30
    # (comfortable for any real corpus: 1e11 docs x 1e4 tf x 1e14
    # tokens ~ 1e29, ~20x headroom; past that, rescale t_tokens to
    # per-million units before the multiply, which cancels in the
    # ratio). The assert_true below turns a silent-NULL overflow into
    # a loud error on the Spark side.
    big = "CAST({} AS DECIMAL(38,0))"
    num = (
        F.expr(big.format("n_docs + 1")) * 22 * F.col("tf") * F.col("t_tokens")
    )
    den = F.expr(big.format("df + 1")) * (
        F.expr(big.format("10 * tf")) * F.col("t_tokens")
        + 3 * F.col("t_tokens")
        + F.expr(big.format("9 * dl")) * F.col("n_docs")
    )
    guarded_tf = F.coalesce(
        F.assert_true(
            F.col("n_docs").cast("double") * F.col("tf").cast("double")
            * F.col("t_tokens").cast("double") < F.lit(2.3e30),
            F.lit("rrf_hybrid_fusion: BM25 numerator exceeds DECIMAL(38) "
                  "headroom (x2e6 rescale) — rescale t_tokens to "
                  "per-million units first"),
        ).cast("long"),
        F.col("tf"),
    )
    sparse = (
        tf.filter(F.col("doc_id") != 0)
        .join(F.broadcast(qterms), "w")
        .join(dl, "doc_id")
        .join(F.broadcast(scalars))
        .withColumn("tf", guarded_tf)
        .select("doc_id", (num * 2_000_000 + den).alias("__n"),
                (2 * den).alias("__d"))
        .select("doc_id", F.expr("__n div __d").cast("long").alias("tm"))
        .groupBy("doc_id")
        .agg(F.sum("tm").cast("long").alias("score_micro"))
        .withColumn("sparse_rank", F.row_number().over(
            Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))).cast("long"))
        .filter(F.col("sparse_rank") <= _RRF_CUT)
        .select("doc_id", "sparse_rank")
    )

    fused = (
        sparse.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id", "sparse_rank", "dense_rank",
            (
                F.coalesce(
                    F.expr(f"1000000 div ({_RRF_K} + sparse_rank)"), F.lit(0))
                + F.coalesce(
                    F.expr(f"1000000 div ({_RRF_K} + dense_rank)"), F.lit(0))
            ).cast("long").alias("rrf_micro"),
        )
    )
    return fused.orderBy(
        F.desc("rrf_micro"), F.asc("doc_id")).limit(_RRF_TOP)


_RRF_SQL = f"""
WITH dense AS (
  SELECT neighbor_id AS doc_id,
    CAST(ROW_NUMBER() OVER (ORDER BY s DESC, neighbor_id ASC) AS BIGINT)
      AS dense_rank
  FROM (
    SELECT c.vec_id AS neighbor_id,
      list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS s
    FROM embeddings c
    CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE c.vec_id != 0
  )
  QUALIFY dense_rank <= {_RRF_CUT}
),
toks AS (SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents),
tf AS MATERIALIZED (
  SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
vocab AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
qterms AS (
  SELECT t.w, v.df FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY tf DESC, w ASC) AS qrn
    FROM tf WHERE doc_id = 0
  ) t JOIN vocab v ON t.w = v.w
  WHERE t.qrn <= 3
),
scalars AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tokens FROM dl),
scored AS (
  SELECT t.doc_id,
    (CAST(s.n_docs + 1 AS HUGEINT) * 22 * t.tf * s.t_tokens * 2000000
     + CAST(q.df + 1 AS HUGEINT)
       * (CAST(10 * t.tf AS HUGEINT) * s.t_tokens + 3 * s.t_tokens
          + CAST(9 * d.dl AS HUGEINT) * s.n_docs))
    // (2 * CAST(q.df + 1 AS HUGEINT)
          * (CAST(10 * t.tf AS HUGEINT) * s.t_tokens + 3 * s.t_tokens
             + CAST(9 * d.dl AS HUGEINT) * s.n_docs)) AS tm
  FROM tf t
  JOIN qterms q ON t.w = q.w
  JOIN dl d ON t.doc_id = d.doc_id
  CROSS JOIN scalars s
  WHERE t.doc_id != 0
),
sparse AS (
  SELECT doc_id,
    CAST(ROW_NUMBER() OVER (ORDER BY SUM(tm) DESC, doc_id ASC) AS BIGINT)
      AS sparse_rank
  FROM scored GROUP BY doc_id
  QUALIFY sparse_rank <= {_RRF_CUT}
)
SELECT COALESCE(s.doc_id, d.doc_id) AS doc_id,
  s.sparse_rank, d.dense_rank,
  CAST(COALESCE(1000000 // ({_RRF_K} + s.sparse_rank), 0)
     + COALESCE(1000000 // ({_RRF_K} + d.dense_rank), 0) AS BIGINT)
    AS rrf_micro
FROM sparse s FULL OUTER JOIN dense d ON s.doc_id = d.doc_id
ORDER BY rrf_micro DESC, doc_id ASC
LIMIT {_RRF_TOP}
"""

register(QuerySpec(
    "rrf_hybrid_fusion", _rrf_fusion, _RRF_SQL,
    "reciprocal-rank fusion of a BM25 lexical ranking and an exact "
    "cosine dense ranking for one query document (k-bounded top-100 "
    "lists, 1e6 div (60+rank) integer RRF, 200-row fusion join)",
    ("text", "vector", "retrieval", "join", "bench"),
))


# --- source_vocab_jaccard: vocabulary overlap between sources ---------------
# Which sources speak the same language? Distinct (source, token)
# grain, then a token-equality self-join counting intersections and
# inclusion-exclusion for the union — Jaccard per source pair. Scale
# shape: the grain collapse happens FIRST (corpus rows -> |V| x
# sources), the self-join runs on the collapsed grain, and the pair
# matrix is #sources^2 rows. The hot-token skew of a raw-corpus
# self-join never appears because each (source, token) is distinct.

def _source_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    st = (
        d.select("source", F.explode(F.array_distinct(
            X.tokens(F.col("text")))).alias("token"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n_vocab"))
    a = st.select(F.col("source").alias("src_a"), "token")
    b = st.select(F.col("source").alias("src_b"), "token")
    inter = (
        a.join(b, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n_vocab").alias("va"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n_vocab").alias("vb"))
    return (
        inter.join(F.broadcast(sa), "src_a").join(F.broadcast(sb), "src_b")
        .select(
            "src_a", "src_b", "n_inter",
            (F.col("va") + F.col("vb") - F.col("n_inter")).alias("n_union"),
            ratio6("n_inter", "va + vb - n_inter").alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


_SRC_JACCARD_SQL = f"""
WITH st AS (
  SELECT DISTINCT source, unnest(list_distinct({_SQL_TOKS})) AS token
  FROM documents
),
sizes AS (SELECT source, COUNT(*) AS n_vocab FROM st GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_inter
  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b, i.n_inter,
  sa.n_vocab + sb.n_vocab - i.n_inter AS n_union,
  {ratio6_sql("i.n_inter", "sa.n_vocab + sb.n_vocab - i.n_inter")} AS jaccard
FROM inter i
JOIN sizes sa ON i.src_a = sa.source
JOIN sizes sb ON i.src_b = sb.source
ORDER BY i.src_a, i.src_b
"""

register(QuerySpec(
    "source_vocab_jaccard", _source_jaccard, _SRC_JACCARD_SQL,
    "pairwise vocabulary Jaccard between sources on the collapsed "
    "distinct (source, token) grain — inclusion-exclusion union, "
    "skew-free self-join",
    ("text", "dedup", "join"),
))


# --- token_simpson_diversity: log-free lexical diversity per source ---------
# Gini-Simpson diversity 1 - sum(p_i^2): the probability two randomly
# drawn tokens differ — the log-free cousin of Shannon entropy (the
# same monotone-surrogate discipline as bigram_pmi_topk), so it is
# exactly representable in integers. Headroom (r7 ADVICE correction):
# the binding bound is NOT total^2 <= int64 (~3e9 tokens) but ratio6's
# internal x2,000,000 rescale — sum_sq * 2e6 must stay in int64, and
# worst-case (one dominant token) sum_sq ~ n_tokens^2, so the safe
# ceiling is ~1.5e6 tokens per source (sum_sq <= 2.3e12). Beyond that,
# rescale counts to per-thousand units before squaring (or shard the
# source). DuckDB errors loudly on BIGINT overflow; non-ANSI Spark
# wraps silently, so the guard below raises instead.

def _simpson(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    cnts = (
        d.select("source", F.explode(X.tokens(F.col("text"))).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    guarded_sum_sq = F.coalesce(
        F.assert_true(
            F.col("sum_sq") < F.lit(2_300_000_000_000),
            F.lit("token_simpson_diversity: sum(cnt^2) exceeds ratio6 "
                  "int64 headroom (x2e6 rescale) — rescale counts to "
                  "per-thousand units or shard the source"),
        ).cast("long"),
        F.col("sum_sq"),
    )
    return (
        cnts.groupBy("source")
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
        )
        .withColumn("sum_sq", guarded_sum_sq)
        .select(
            "source", "n_tokens", "n_distinct",
            (F.lit(1.0) - ratio6("sum_sq", "n_tokens * n_tokens"))
            .alias("simpson_diversity"),
        )
        .orderBy("source")
    )


_SIMPSON_SQL = f"""
WITH cnts AS (
  SELECT source, token, COUNT(*) AS cnt
  FROM (SELECT source, unnest({_SQL_TOKS}) AS token FROM documents)
  GROUP BY source, token
)
SELECT source,
  CAST(SUM(cnt) AS BIGINT) AS n_tokens,
  CAST(COUNT(*) AS BIGINT) AS n_distinct,
  1.0 - {ratio6_sql("SUM(cnt * cnt)", "SUM(cnt) * SUM(cnt)")}
    AS simpson_diversity
FROM cnts
GROUP BY source
ORDER BY source
"""

register(QuerySpec(
    "token_simpson_diversity", _simpson, _SIMPSON_SQL,
    "Gini-Simpson lexical diversity per source (1 - sum p^2, the "
    "log-free entropy surrogate) in exact integer arithmetic",
    ("text", "agg", "quality"),
))


# --- greedy_vocab_cover: submodular data selection (greedy max-cover) -------
# The data-selection primitive behind coverage-driven corpus pruning:
# greedily pick K documents maximizing NEW vocabulary covered (the
# classic (1 - 1/e) greedy for monotone submodular functions; ties
# break to the smallest doc_id). The coverage universe is the BIGRAM
# vocabulary (unigrams saturate in one pick on small tiers; bigrams
# keep the marginal-gain curve meaningful). Each round is one
# anti-join against the covered set + one argmax aggregation — the
# covered set is the union of <= K documents' vocabularies, so it
# stays broadcastable at any corpus scale; the corpus-sized grain is
# touched once per round (and is checkpointed once, so the K rounds
# never re-derive it). Rounds that find no doc with uncovered units
# emit nothing (both engines), so the output is exactly the
# achievable prefix of K picks with gains and the cumulative
# covered-vocabulary size.

_COVER_K = 5


def _greedy_cover(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.binding import let

    d = fan_out(load_table(spark, sf, "documents"))
    # bigrams via shift-and-zip (element-wise, O(n) per doc) rather
    # than per-position slice() in transform() (O(n^2) per doc — the
    # winnowing lesson above); zip_with null-pads, so slice back to
    # the true n-1 length before the nulls are read. Tokens are
    # let-bound: the zip shape references them four times, and inline
    # they'd re-run the tokenize regex 4x per row.
    bigrams = let(X.tokens(F.col("text")), lambda tk: F.array_distinct(F.slice(
        F.zip_with(
            tk,
            F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        1, F.greatest(F.size(tk) - 1, F.lit(0)),
    )))
    dt = (
        d.select("doc_id", F.explode(bigrams).alias("token"))
        .localCheckpoint(eager=True)
    )
    covered: DataFrame | None = None
    picked: DataFrame | None = None
    out: DataFrame | None = None
    for r in range(1, _COVER_K + 1):
        remaining = dt
        if covered is not None:
            remaining = remaining.join(F.broadcast(covered), "token", "left_anti")
        if picked is not None:
            remaining = remaining.join(F.broadcast(picked), "doc_id", "left_anti")
        gains = remaining.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("gain"))
        # each round's pick and covered set are tiny (1 row / <= K doc
        # vocabularies) — eager-checkpoint them so round r+1's plan
        # starts from materialized state instead of re-deriving the
        # whole prefix chain (the standard iterative-algorithm
        # lineage cut, same reason k-means/PageRank truncate lineage)
        best = gains.agg(
            F.max(F.struct(F.col("gain"),
                           (-F.col("doc_id")).alias("nd"))).alias("b")
        ).select(
            F.lit(r).alias("pick_rank"),
            (-F.col("b.nd")).alias("doc_id"),
            F.col("b.gain").alias("gain"),
        ).localCheckpoint(eager=True)
        new_tokens = dt.join(
            F.broadcast(best.select("doc_id")), "doc_id", "left_semi"
        ).select("token")
        covered = (
            new_tokens if covered is None
            else covered.union(new_tokens).distinct()
        ).localCheckpoint(eager=True)
        row = best.crossJoin(
            F.broadcast(covered.agg(
                F.count(F.lit(1)).alias("covered_total"))))
        picked = (
            best.select("doc_id") if picked is None
            else picked.union(best.select("doc_id"))
        )
        out = row if out is None else out.union(row)
    assert out is not None
    return out.filter(F.col("doc_id").isNotNull()).orderBy("pick_rank")


def _greedy_cover_sql() -> str:
    parts = [
        "dt AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(bgs) AS token FROM ("
        "SELECT doc_id, list_distinct(list_transform("
        f"range(1, greatest(len(toks) - 1, 0) + 1), "
        "i -> array_to_string(toks[i:i+1], ' '))) AS bgs "
        f"FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)))"
    ]
    prev_cov = None
    pick_names = []
    for r in range(1, _COVER_K + 1):
        conds = []
        if prev_cov:
            # NOT EXISTS (not NOT IN): DuckDB plans it as an anti
            # hash join instead of a per-row subquery scan
            conds.append(
                f"NOT EXISTS (SELECT 1 FROM {prev_cov} c "
                f"WHERE c.token = dt.token)")
        if pick_names:
            union_ids = " UNION ALL ".join(
                f"SELECT doc_id FROM {p}" for p in pick_names)
            conds.append(
                f"NOT EXISTS (SELECT 1 FROM ({union_ids}) pk "
                f"WHERE pk.doc_id = dt.doc_id)")
        where = ("WHERE " + " AND ".join(conds)) if conds else ""
        parts.append(
            f"g{r} AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS gain "
            f"FROM dt {where} GROUP BY doc_id)")
        parts.append(
            f"p{r} AS (SELECT doc_id, gain FROM g{r} "
            f"ORDER BY gain DESC, doc_id LIMIT 1)")
        new_cov = (
            f"SELECT DISTINCT token FROM dt "
            f"WHERE doc_id IN (SELECT doc_id FROM p{r})"
        )
        if prev_cov:
            parts.append(
                f"c{r} AS MATERIALIZED (SELECT token FROM {prev_cov} UNION {new_cov})")
        else:
            parts.append(f"c{r} AS MATERIALIZED ({new_cov})")
        prev_cov = f"c{r}"
        pick_names.append(f"p{r}")
    selects = " UNION ALL ".join(
        f"SELECT {r} AS pick_rank, doc_id, gain, "
        f"(SELECT CAST(COUNT(*) AS BIGINT) FROM c{r}) AS covered_total "
        f"FROM p{r}"
        for r in range(1, _COVER_K + 1)
    )
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT * FROM ({selects}) ORDER BY pick_rank")


register(QuerySpec(
    "greedy_vocab_cover", _greedy_cover, _greedy_cover_sql(),
    "greedy submodular max-cover data selection: K rounds of "
    "anti-join + argmax picking the document adding the most NEW "
    "vocabulary (broadcastable covered set, ties to smallest doc_id)",
    ("text", "mixing", "iterative"),
))
