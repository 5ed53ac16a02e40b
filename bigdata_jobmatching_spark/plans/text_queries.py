"""Text-analysis workload over the ``documents`` table.

The training-data-pipeline text ops (language-ID, quality scoring,
token counting, fingerprinting) plus the reference's keyword-catalog
extraction pattern (extract_skills_udf, parse_jobs.py:302-352)
rebuilt as a broadcast catalog join. Everything is native column
expressions, verified value-exact against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources.io import fan_out, load_table
from .catalog import QuerySpec, ratio6, ratio6_sql, register

# DuckDB twin of functions.text.normalize_text / tokens
_SQL_NORM = "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
_SQL_TOKS = f"CASE WHEN {_SQL_NORM} = '' THEN [] ELSE string_split({_SQL_NORM}, ' ') END"


# --- doc_stats: token/char counts, ratios, BPE-ish token estimate ---------

def _doc_stats(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    # One fused normalize+split feeds all five signals
    # (functions/text.doc_stat_struct); the five standalone helpers
    # would re-run the normalize regex chain three times per row.
    # Emitted through an exploded one-element struct — the generator
    # barrier that keeps CollapseProject from re-inlining the chain
    # into every output column (the winnowing lesson, SCALING.md).
    return (
        d.select("doc_id", F.explode(F.array(X.doc_stat_struct(F.col("text")))).alias("s"))
        .select("doc_id", "s.*")
    )


_DOC_STATS_SQL = f"""
WITH tok AS (SELECT doc_id, text, {_SQL_TOKS} AS toks, {_SQL_NORM} AS norm FROM documents)
SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(COALESCE(list_sum(list_transform(toks, w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT) AS n_bpe_tokens,
  CASE WHEN length(text) > 0
       THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
       ELSE 0.0 END AS punct_ratio,
  CASE WHEN len(toks) > 0
       THEN CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE) / len(toks)
       ELSE 0.0 END AS mean_word_len
FROM tok
"""

register(QuerySpec(
    "doc_stats", _doc_stats, _DOC_STATS_SQL,
    "token counting + char stats + BPE-ish subword estimate (native exprs)",
    ("text", "projection", "bench"),
))


# --- doc_language_id: stopword-profile argmax ------------------------------

def _lang_id(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        X.detect_language(F.col("text")).alias("detected_lang"),
    )


def _sql_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in X.LANG_PROFILES[lang])
    return f"len(list_filter(toks, t -> t IN ({words})))"


_LANG_SQL = f"""
WITH tok AS (SELECT doc_id, lang, {_SQL_TOKS} AS toks FROM documents),
hits AS (
  SELECT doc_id, lang,
    {_sql_hits('en')} AS h_en, {_sql_hits('fr')} AS h_fr,
    {_sql_hits('es')} AS h_es, {_sql_hits('de')} AS h_de,
    len(toks) AS n
  FROM tok
)
SELECT doc_id, lang AS labeled_lang,
  CASE WHEN n = 0 OR greatest(h_en, h_fr, h_es, h_de) = 0 THEN 'und'
       WHEN h_en >= h_fr AND h_en >= h_es AND h_en >= h_de THEN 'en'
       WHEN h_fr >= h_es AND h_fr >= h_de THEN 'fr'
       WHEN h_es >= h_de THEN 'es'
       ELSE 'de' END AS detected_lang
FROM hits
"""

register(QuerySpec(
    "doc_language_id", _lang_id, _LANG_SQL,
    "language-ID heuristic via stopword-profile argmax",
    ("text", "langid"),
))


# --- doc_quality: composite quality score in [0,1] -------------------------

def _quality(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    return d.select(
        "doc_id",
        X.quality_score(F.col("text")).alias("quality_score"),
    )


_EN = ", ".join(f"'{w}'" for w in X.LANG_PROFILES["en"])
_QUALITY_SQL = f"""
WITH tok AS (SELECT doc_id, text, {_SQL_TOKS} AS toks FROM documents),
sig AS (
  SELECT doc_id,
    len(toks) AS n_tok,
    CASE WHEN len(toks) > 0
         THEN CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS mwl,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(toks, t -> t IN ({_EN}))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS swr,
    CASE WHEN length(text) > 0
         THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
         ELSE 0.0 END AS pr
  FROM tok
)
SELECT doc_id,
  ((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
   + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
   + (CASE WHEN swr >= 0.05 THEN 1.0 ELSE 0.0 END)
   + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 4.0 AS quality_score
FROM sig
"""

register(QuerySpec(
    "doc_quality", _quality, _QUALITY_SQL,
    "document quality scoring (parsing_quality_score shape, parse_jobs.py:437-441)",
    ("text", "quality"),
))


# --- keyword_catalog_tags: broadcast catalog join (skills-extraction shape)

_KEYWORD_CATALOG: list[tuple[str, str]] = [
    ("spark", "engine"), ("hash", "engine"), ("vector", "engine"),
    ("join", "operator"), ("filter", "operator"), ("sort", "operator"),
    ("merge", "operator"), ("window", "operator"), ("scan", "operator"),
    ("stream", "runtime"), ("batch", "runtime"), ("query", "runtime"),
]


def _keyword_tags(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    catalog = spark.createDataFrame(_KEYWORD_CATALOG, "keyword string, category string")
    toks = d.select(
        "doc_id", "source", F.explode(F.array_distinct(X.tokens(F.col("text")))).alias("keyword")
    )
    tagged = toks.join(F.broadcast(catalog), "keyword")
    # count(*), not countDistinct: the explode runs over the per-doc
    # array_distinct'ed token set, so each (doc_id, keyword) occurs at
    # most once by construction — identical value, and the plain count
    # drops the distinct-aggregate's extra exchange and map-side
    # partial-aggregates before the shuffle (r15, guide §2.3)
    counts = tagged.groupBy("category", "keyword").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("category").orderBy(F.desc("n_docs"), F.asc("keyword"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("category", "keyword", "n_docs", F.col("rnk").cast("int").alias("rnk"))
    )


_CATALOG_VALUES = ", ".join(f"('{k}', '{c}')" for k, c in _KEYWORD_CATALOG)
_KEYWORD_SQL = f"""
WITH catalog(keyword, category) AS (VALUES {_CATALOG_VALUES}),
toks AS (
  SELECT doc_id, source, unnest(list_distinct({_SQL_TOKS})) AS keyword FROM documents
),
counts AS (
  SELECT c.category, c.keyword, COUNT(DISTINCT t.doc_id) AS n_docs
  FROM toks t JOIN catalog c ON t.keyword = c.keyword
  GROUP BY c.category, c.keyword
)
SELECT category, keyword, n_docs, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY category ORDER BY n_docs DESC, keyword ASC) AS rnk
  FROM counts
) WHERE rnk <= 3
"""

register(QuerySpec(
    "keyword_catalog_tags", _keyword_tags, _KEYWORD_SQL,
    "broadcast keyword-catalog join + top-k per category (skills extraction, parse_jobs.py:302-352)",
    ("text", "join", "topk", "bench"),
))


# --- doc_fingerprints: canonical md5 fingerprint per document -------------

def _fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    return d.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))


_FP_SQL = f"""
SELECT doc_id,
  md5(array_to_string(list_sort(list_distinct({_SQL_TOKS})), ' ')) AS fp
FROM documents
"""

register(QuerySpec(
    "doc_fingerprints", _fingerprints, _FP_SQL,
    "canonical token-set md5 fingerprint (doc identity for exact dedup)",
    ("text", "fingerprint"),
))


# --- doc_gopher_filter: Gopher-rule quality gate ---------------------------
# The five-rule document filter a pretraining pipeline runs before
# dedup (word-count band, mean-word-length band, alphabetic-word
# ratio, stopword evidence, bigram repetition). The oracle recomputes
# every signal with DuckDB list lambdas from the same constants.

def _gopher(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    s = X.gopher_stats(F.col("text"))
    return d.select(
        "doc_id",
        s["n_words"].alias("n_words"),
        s["mean_word_len"].alias("mean_word_len"),
        s["alpha_word_ratio"].alias("alpha_word_ratio"),
        s["stop_hits"].alias("stop_hits"),
        s["top_bigram_frac"].alias("top_bigram_frac"),
        s["passes"].alias("passes"),
    )


_GOPHER_SQL = f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
sig AS (
  SELECT doc_id, toks, len(toks) AS n,
    CASE WHEN len(toks) > 0
         THEN CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS mwl,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS alpha,
    len(list_filter(toks, t -> t IN ({_EN}))) AS stop_hits,
    list_slice(
      list_transform(
        list_zip(list_slice(toks, 1, len(toks) - 1), list_slice(toks, 2, len(toks))),
        p -> p[1] || ' ' || p[2]),
      1, {X.GOPHER_REPETITION_CAP}) AS bg
  FROM tok
),
rep AS (
  SELECT doc_id, n, mwl, alpha, stop_hits,
    CASE WHEN len(bg) > 0
         THEN CAST(list_max(list_transform(list_distinct(bg), d -> len(list_filter(bg, x -> x = d)))) AS DOUBLE) / len(bg)
    END AS tbf
  FROM sig
)
SELECT doc_id,
  CAST(n AS BIGINT) AS n_words,
  round(mwl, 6) AS mean_word_len,
  round(alpha, 6) AS alpha_word_ratio,
  CAST(stop_hits AS BIGINT) AS stop_hits,
  round(tbf, 6) AS top_bigram_frac,
  (n >= {X.GOPHER_MIN_WORDS} AND n <= {X.GOPHER_MAX_WORDS}
   AND mwl >= {X.GOPHER_MIN_MEAN_WORD_LEN} AND mwl <= {X.GOPHER_MAX_MEAN_WORD_LEN}
   AND alpha >= {X.GOPHER_MIN_ALPHA_RATIO}
   AND stop_hits >= {X.GOPHER_MIN_STOP_HITS}
   AND COALESCE(tbf <= {X.GOPHER_MAX_TOP_BIGRAM_FRAC}, FALSE)) AS passes
FROM rep
"""

register(QuerySpec(
    "doc_gopher_filter", _gopher, _GOPHER_SQL,
    "Gopher-rule document quality filter (word/mwl bands, alpha ratio, "
    "stopword evidence, capped bigram repetition; arXiv:2112.11446 Table A1)",
    ("text", "quality"),
))


# --- tfidf_top_terms: native TF-IDF without MLlib --------------------------
# Classic smooth-idf (sklearn formula: ln((N+1)/(df+1)) + 1) built
# from two aggregations: tf at (doc, term) grain, df at term grain.
# The df side is tiny (vocabulary-sized) and broadcasts; N rides in as
# a broadcast scalar — the fact-sized tf table is shuffled exactly
# once. Ranking uses the 6dp-rounded score with a term tie-break, so
# the window is engine-reproducible.

_TFIDF_K = 3


def _tfidf(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    tf = (
        d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        # one materialization feeds BOTH consumers (r15): without it
        # the broadcast df side re-ran the whole scan -> fan_out ->
        # tokenize -> explode -> tf aggregation chain a second time
        # (plan: two identical Generate+2xHashAggregate subtrees)
        .localCheckpoint(eager=False)
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # scalar count straight off the scan: the fan_out exchange is for
    # compute-heavy projections, a COUNT(*) pays it for nothing
    n = load_table(spark, sf, "documents").agg(
        F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * (
                    F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _TFIDF_K)
        .select("doc_id", "term", "tf", "score", "rnk")
    )


_TFIDF_SQL = f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
tf AS (
  SELECT doc_id, t AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS t FROM tok)
  GROUP BY doc_id, t
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
    round(tf.tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN df USING (term), n
)
SELECT doc_id, term, tf, score, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
  FROM scored
) WHERE rnk <= {_TFIDF_K}
"""

register(QuerySpec(
    "tfidf_top_terms", _tfidf, _TFIDF_SQL,
    "per-document top-k TF-IDF terms (smooth idf) from two aggregations "
    "and a broadcast vocabulary join — no MLlib, no UDFs",
    ("text", "agg", "topk", "bench"),
))


# --- doc_repetition_stats: repetition signals for quality filtering --------
# The Gopher-family repetition measures at token grain: distinct-token
# ratio, hottest-token share, hottest-bigram share. One explode +
# two-level aggregation; every ratio is exact-integer arithmetic
# rounded at the end, so the oracle agrees bit-for-bit.

def _repetition(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    tok = d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("t"))
    per_tok = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    tok_stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    big = d.select("doc_id", F.explode(X.bigram_zip(F.col("text"))).alias("p")).select(
        "doc_id", F.concat_ws(" ", F.col("p.0"), F.col("p.1")).alias("bg")
    )
    per_big = big.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    big_stats = per_big.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bg_c")
    )
    j = tok_stats.join(big_stats, "doc_id", "left")
    return j.select(
        "doc_id", "n_tokens",
        ratio6("n_distinct", "n_tokens").alias("distinct_ratio"),
        ratio6("top_c", "n_tokens").alias("top_token_share"),
        F.coalesce(ratio6("top_bg_c", "n_bigrams"), F.lit(0.0)).alias("top_bigram_share"),
    )


_REPETITION_SQL = f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
flat AS (SELECT doc_id, unnest(toks) AS t FROM tok),
per_tok AS (SELECT doc_id, t, COUNT(*) AS c FROM flat GROUP BY doc_id, t),
tok_stats AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct, MAX(c) AS top_c
  FROM per_tok GROUP BY doc_id
),
bg_flat AS (
  SELECT doc_id, p[1] || ' ' || p[2] AS bg
  FROM (SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p
        FROM tok WHERE len(toks) >= 2)
),
per_bg AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg_flat GROUP BY doc_id, bg),
bg_stats AS (
  SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bg_c FROM per_bg GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
  {ratio6_sql('t.n_distinct', 't.n_tokens')} AS distinct_ratio,
  {ratio6_sql('t.top_c', 't.n_tokens')} AS top_token_share,
  COALESCE({ratio6_sql('b.top_bg_c', 'b.n_bigrams')}, 0.0) AS top_bigram_share
FROM tok_stats t LEFT JOIN bg_stats b ON t.doc_id = b.doc_id
"""

register(QuerySpec(
    "doc_repetition_stats", _repetition, _REPETITION_SQL,
    "token/bigram repetition shares per document (Gopher-family "
    "repetition signals for corpus filtering)",
    ("text", "agg", "quality"),
))


# --- doc_repetition_ngram: higher-order Gopher repetition shares ----------
# Extends doc_repetition_stats to trigram/4-gram grain (the Gopher
# filter uses top-n-gram shares for n=2..4). Shares are exact-integer
# ratio6 arithmetic — no raw double rounding (the round-3 failure
# class). Docs with fewer than 3 tokens have no trigrams and are
# excluded on both engines.

def _rep_ngram(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.binding import let

    d = fan_out(load_table(spark, sf, "documents"))

    def grams(n: int):
        # The tokenize chain is let-bound (functions/binding.py): the
        # transform lambda below otherwise re-evaluates the regex split
        # once PER SHINGLE POSITION — O(n^2) regex work per document
        # (the winnowing HOF-lambda trap, measured 56x there).
        return let(X.tokens(F.col("text")), lambda tk: F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.array_join(F.slice(tk, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")))

    def stats(n: int, label: str) -> DataFrame:
        g = d.select("doc_id", F.explode(grams(n)).alias("g"))
        per = g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        return per.groupBy("doc_id").agg(
            F.sum("c").alias(f"n_{label}"), F.max("c").alias(f"top_{label}")
        )

    j = stats(3, "tri").join(stats(4, "four"), "doc_id", "left")
    return j.select(
        "doc_id", "n_tri",
        ratio6("top_tri", "n_tri").alias("top_trigram_share"),
        F.coalesce(ratio6("top_four", "n_four"), F.lit(0.0)).alias("top_fourgram_share"),
    )


_REP_NGRAM_SQL = f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
tri AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
    i -> array_to_string(toks[i:i+2], ' '))) AS g
  FROM tok WHERE len(toks) >= 3
),
tstat AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tri, MAX(c) AS top_tri FROM (
    SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY 1, 2
  ) GROUP BY 1
),
four AS (
  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 2),
    i -> array_to_string(toks[i:i+3], ' '))) AS g
  FROM tok WHERE len(toks) >= 4
),
fstat AS (
  SELECT doc_id, SUM(c) AS n_four, MAX(c) AS top_four FROM (
    SELECT doc_id, g, COUNT(*) AS c FROM four GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT t.doc_id, t.n_tri,
  {ratio6_sql('t.top_tri', 't.n_tri')} AS top_trigram_share,
  COALESCE({ratio6_sql('f.top_four', 'f.n_four')}, 0.0) AS top_fourgram_share
FROM tstat t LEFT JOIN fstat f ON t.doc_id = f.doc_id
"""

register(QuerySpec(
    "doc_repetition_ngram", _rep_ngram, _REP_NGRAM_SQL,
    "top trigram/4-gram repetition shares per document (Gopher n-gram "
    "family, exact-integer ratios)",
    ("text", "agg", "quality"),
))


# --- doc_duplicate_ngram_frac: duplicated n-gram fractions ----------------
# The second half of the Gopher repetition family: the FRACTION of
# n-grams that are repeats (1 - distinct/total) for n=5 and n=8 —
# high values mean templated/boilerplate text. Exact-integer ratio6
# arithmetic throughout; docs with fewer than 5 tokens are excluded
# (no 5-grams) on both engines.

def _dup_ngram_frac(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.binding import let

    d = fan_out(load_table(spark, sf, "documents"))

    def grams(tk, n: int):
        return F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.array_join(F.slice(tk, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    def pair(tk, n: int):
        # let-bind the gram array so total/distinct sizes read ONE
        # materialized value instead of re-building the shingles twice.
        return let(grams(tk, n), lambda g: F.struct(
            F.size(g).alias("n"), F.size(F.array_distinct(g)).alias("d")))

    # Tokenize once per row; emit all four counters through a single
    # exploded one-element struct — a generator barrier CollapseProject
    # cannot inline through (the winnowing lesson, SCALING.md).
    body = let(X.tokens(F.col("text")), lambda tk: F.struct(
        pair(tk, 5).alias("g5"), pair(tk, 8).alias("g8")))

    flat = (
        d.select("doc_id", F.explode(F.array(body)).alias("s"))
        .select(
            "doc_id",
            F.col("s.g5.n").alias("n_g5"), F.col("s.g5.d").alias("d_g5"),
            F.col("s.g8.n").alias("n_g8"), F.col("s.g8.d").alias("d_g8"),
        )
        .filter(F.col("n_g5") > 0)
    )
    return flat.select(
        "doc_id",
        ratio6("n_g5 - d_g5", "n_g5").alias("dup_5gram_frac"),
        # n_g8 = 0 for docs with < 8 tokens (the old left-join NULL):
        # guard before ratio6 so ANSI mode never sees a 0 divisor.
        F.when(F.col("n_g8") > 0, ratio6("n_g8 - d_g8", "n_g8"))
        .otherwise(F.lit(0.0)).alias("dup_8gram_frac"),
    )


_DUP_NGRAM_SQL = f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g5 AS (
  SELECT doc_id, len(gs) AS n_g5, len(list_distinct(gs)) AS d_g5 FROM (
    SELECT doc_id, list_transform(range(1, len(toks) - 3),
      i -> array_to_string(toks[i:i+4], ' ')) AS gs
    FROM tok WHERE len(toks) >= 5
  )
),
g8 AS (
  SELECT doc_id, len(gs) AS n_g8, len(list_distinct(gs)) AS d_g8 FROM (
    SELECT doc_id, list_transform(range(1, len(toks) - 6),
      i -> array_to_string(toks[i:i+7], ' ')) AS gs
    FROM tok WHERE len(toks) >= 8
  )
)
SELECT a.doc_id,
  {ratio6_sql('a.n_g5 - a.d_g5', 'a.n_g5')} AS dup_5gram_frac,
  COALESCE({ratio6_sql('b.n_g8 - b.d_g8', 'b.n_g8')}, 0.0) AS dup_8gram_frac
FROM g5 a LEFT JOIN g8 b ON a.doc_id = b.doc_id
"""

register(QuerySpec(
    "doc_duplicate_ngram_frac", _dup_ngram_frac, _DUP_NGRAM_SQL,
    "duplicated 5-gram/8-gram fractions per document (Gopher "
    "dup-ngram family, exact-integer ratios)",
    ("text", "agg", "quality"),
))


# --- source_lang_mismatch: label-vs-detected language audit ---------------
# Corpus-health: per (source, labeled lang), how often does the
# stopword-profile detector disagree with the label? High mismatch
# rates localize mislabeled slices before training. Rates are
# exact-integer ratio6.

def _lang_mismatch(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    det = X.detect_language(F.col("text"))
    return (
        d.select("source", F.col("lang").alias("labeled"), det.alias("detected"))
        .groupBy("source", "labeled")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("detected") != F.col("labeled"))
                    & (F.col("detected") != "und"),
                    1,
                ).otherwise(0)
            ).alias("n_mismatch"),
            F.sum(
                F.when(F.col("detected") == "und", 1).otherwise(0)
            ).alias("n_undetected"),
        )
        .select(
            "source", "labeled", "n_docs", "n_mismatch", "n_undetected",
            ratio6("n_mismatch", "n_docs").alias("mismatch_rate"),
        )
    )


_LANG_MISMATCH_SQL = f"""
WITH tok AS (SELECT doc_id, source, lang, {_SQL_TOKS} AS toks FROM documents),
hits AS (
  SELECT doc_id, source, lang,
    {_sql_hits('en')} AS h_en, {_sql_hits('fr')} AS h_fr,
    {_sql_hits('es')} AS h_es, {_sql_hits('de')} AS h_de,
    len(toks) AS n
  FROM tok
),
det AS (
  SELECT source, lang AS labeled,
    CASE WHEN n = 0 OR greatest(h_en, h_fr, h_es, h_de) = 0 THEN 'und'
         WHEN h_en >= h_fr AND h_en >= h_es AND h_en >= h_de THEN 'en'
         WHEN h_fr >= h_es AND h_fr >= h_de THEN 'fr'
         WHEN h_es >= h_de THEN 'es'
         ELSE 'de' END AS detected
  FROM hits
),
agg AS (
  SELECT source, labeled, COUNT(*) AS n_docs,
    CAST(SUM(CASE WHEN detected != labeled AND detected != 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
    CAST(SUM(CASE WHEN detected = 'und' THEN 1 ELSE 0 END) AS BIGINT) AS n_undetected
  FROM det GROUP BY 1, 2
)
SELECT source, labeled, n_docs, n_mismatch, n_undetected,
  {ratio6_sql('n_mismatch', 'n_docs')} AS mismatch_rate
FROM agg
"""

register(QuerySpec(
    "source_lang_mismatch", _lang_mismatch, _LANG_MISMATCH_SQL,
    "per-(source, labeled-lang) detector disagreement rates — "
    "mislabeled-slice audit before training",
    ("text", "langid", "quality"),
))


# --- doc_tokenizer_fertility: subword-per-word ratio per source -----------
# Tokenizer fertility (BPE-ish subword count / whitespace word count)
# per source — the pretraining metric that decides token budgets per
# slice. Both counts are exact integers; the ratio is ratio6.

def _fertility(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.binding import let

    d = fan_out(load_table(spark, sf, "documents"))
    # ws + bpe from ONE let-bound tokenize through the exploded-struct
    # barrier — token_count + bpe_ish_token_count separately would run
    # the normalize regex chain twice per row (SCALING.md addendum 6).
    body = let(X.tokens(F.col("text")), lambda tk: F.struct(
        F.size(tk).cast("long").alias("ws"),
        F.aggregate(
            F.transform(tk, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        ).alias("bpe"),
    ))
    return (
        d.select("source", F.explode(F.array(body)).alias("s"))
        .select("source", F.col("s.ws").alias("ws"), F.col("s.bpe").alias("bpe"))
        .groupBy("source")
        .agg(
            F.sum("ws").alias("n_words"),
            F.sum("bpe").alias("n_subwords"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_words") > 0)
        .select(
            "source", "n_docs", "n_words", "n_subwords",
            ratio6("n_subwords", "n_words").alias("fertility"),
        )
    )


_FERTILITY_SQL = f"""
WITH tok AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
per AS (
  SELECT source,
    CAST(len(toks) AS BIGINT) AS ws,
    CAST(COALESCE(list_sum(list_transform(toks, w -> CAST(ceil(length(w) / 4.0) AS BIGINT))), 0) AS BIGINT) AS bpe
  FROM tok
),
agg AS (
  SELECT source, CAST(SUM(ws) AS BIGINT) AS n_words, CAST(SUM(bpe) AS BIGINT) AS n_subwords, COUNT(*) AS n_docs
  FROM per GROUP BY source
)
SELECT source, n_docs, n_words, n_subwords,
  {ratio6_sql('n_subwords', 'n_words')} AS fertility
FROM agg WHERE n_words > 0
"""

register(QuerySpec(
    "doc_tokenizer_fertility", _fertility, _FERTILITY_SQL,
    "tokenizer fertility (subwords per word) per source — token-budget "
    "planning metric, exact-integer ratio",
    ("text", "agg", "mixing"),
))


# --- doc_sentence_spans: sentence segmentation via Python UDTF ------------
# The table-function surface (§2.8 UDTF): an imperative
# abbreviation/decimal-aware sentence scanner fanning each document
# into exact covering spans through a correlated LATERAL call.
# Rows-only by nature (the state machine is the point — no SQL twin);
# its correctness contract is the invariant suite in
# tests/test_segment.py (lossless abutting coverage, determinism,
# abbreviation/decimal/mid-token-dot behavior).

def _sentence_spans(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.segment import register_sentence_udtf

    register_sentence_udtf(spark)
    load_table(spark, sf, "documents").createOrReplaceTempView("seg_docs")
    return spark.sql("""
      SELECT doc_id, sent_idx, start, end, length(sentence) AS n_chars
      FROM seg_docs, LATERAL split_sentences(text)
    """)


register(QuerySpec(
    "doc_sentence_spans", _sentence_spans, None,
    "abbreviation/decimal-aware sentence spans per document via a "
    "Python UDTF in a correlated LATERAL join (imperative scanner; "
    "rows-only + invariant suite; value-oracled by "
    "sentence_span_stats)",
    ("text", "imperative", "udtf"),
))


# --- sentence_span_stats: the UDTF scanner, externally value-oracled ------
# The corpus text carries no terminators, so a direct oracle over
# documents.text would prove nothing about boundary semantics.
# Instead each doc's text is extended with a DETERMINISTIC sentence
# construction (fragment by doc_id % 8 exercising plain boundary /
# abbreviation / decimal / mid-token dot / multi-terminator run /
# single-letter initial / dotted abbreviation / ellipsis; tail by
# doc_id % 3 exercising trailing residual / boundary-at-EOT /
# boundary+residual) built with identical string expressions on both
# engines. Because the base text is terminator-free, the expected
# sentence count is a pure function of the variant indices — the
# DuckDB oracle states it as a CASE, and the gate hash-checks the
# imperative Python scanner against that ground truth per document,
# plus the lossless-coverage invariants (covered == len, spans abut
# 0..len). tests/test_round6_queries.py pins the same case analysis
# directly against split_sentences.

_SENT_FRAGS = (
    " end. Next words follow",    # plain boundary        -> +1
    " see Dr. Smith here",        # abbreviation          -> +0
    " pi is 3.14 exactly",        # decimal dot           -> +0
    " open file.txt now",         # mid-token dot         -> +0
    " really?! Yes indeed",       # multi-terminator run  -> +1
    " by J. Doe today",           # single-letter initial -> +0
    " e.g. some example",         # dotted abbreviation   -> +0
    " stop here... Then more",    # ellipsis run          -> +1
)
_SENT_FRAG_B = (1, 0, 0, 0, 1, 0, 0, 1)
_SENT_TAILS = (" final words", " the end.", " over? done")
_SENT_TAIL_N = (1, 1, 2)  # boundaries in tail + trailing residual


def _sentence_synth(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    frag = F.element_at(
        F.array(*[F.lit(x) for x in _SENT_FRAGS]),
        (F.col("doc_id") % 8 + 1).cast("int"),
    )
    tail = F.element_at(
        F.array(*[F.lit(x) for x in _SENT_TAILS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40), frag,
            F.lit(" "), F.substring("text", 50, 30), tail,
        ).alias("text"),
    )


def _sentence_span_stats(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions.segment import register_sentence_udtf

    register_sentence_udtf(spark)
    _sentence_synth(spark, sf).createOrReplaceTempView("seg_synth_docs")
    return spark.sql("""
      SELECT doc_id,
        CAST(count(*) AS BIGINT)          AS n_sentences,
        CAST(sum(end - start) AS BIGINT)  AS covered_chars,
        CAST(length(any_value(text)) AS BIGINT) AS doc_len,
        CAST(min(start) AS BIGINT)        AS first_start,
        CAST(max(end) AS BIGINT)          AS last_end
      FROM seg_synth_docs, LATERAL split_sentences(text)
      GROUP BY doc_id
    """)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_SENT_STATS_SQL = f"""
WITH synth AS (
  SELECT doc_id,
    substring(text, 1, 40)
      || CASE doc_id % 8 {' '.join(f'WHEN {i} THEN {_sql_quote(x)}' for i, x in enumerate(_SENT_FRAGS))} END
      || ' ' || substring(text, 50, 30)
      || CASE doc_id % 3 {' '.join(f'WHEN {i} THEN {_sql_quote(x)}' for i, x in enumerate(_SENT_TAILS))} END
      AS text,
    CASE doc_id % 8 {' '.join(f'WHEN {i} THEN {b}' for i, b in enumerate(_SENT_FRAG_B))} END
      + CASE doc_id % 3 {' '.join(f'WHEN {i} THEN {n}' for i, n in enumerate(_SENT_TAIL_N))} END
      AS expected_sentences
  FROM documents
)
SELECT doc_id,
  CAST(expected_sentences AS BIGINT) AS n_sentences,
  CAST(length(text) AS BIGINT)       AS covered_chars,
  CAST(length(text) AS BIGINT)       AS doc_len,
  CAST(0 AS BIGINT)                  AS first_start,
  CAST(length(text) AS BIGINT)       AS last_end
FROM synth
"""

register(QuerySpec(
    "sentence_span_stats", _sentence_span_stats, _SENT_STATS_SQL,
    "per-document sentence-count + lossless-coverage profile of the "
    "Python UDTF scanner over deterministic sentence constructions — "
    "the external value oracle for doc_sentence_spans' imperative "
    "boundary semantics (abbreviations, decimals, mid-token dots, "
    "terminator runs, initials, EOT handling)",
    ("text", "imperative", "udtf", "agg"),
))


# --- doc_charclass_audit: encoding / character-class sanity profile -------
# The corpus-ingest gate before any text op: per source, exact counts
# of character classes (letters / digits / spaces / other) plus how
# many documents contain anything outside the expected classes —
# mojibake, control bytes and non-ASCII junk all land in ``other``.
# Counting is length-difference arithmetic (len(text) minus len with
# the class stripped) — pure integers, identical on both engines; a
# narrow projection + one tiny groupBy at any scale.

def _charclass(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    t = F.col("text")

    def n_of(pattern: str) -> F.Column:
        return F.length(t) - F.length(F.regexp_replace(t, pattern, ""))

    per_doc = d.select(
        "source",
        F.length(t).alias("n_chars"),
        n_of("[a-z]").alias("n_lower"),
        n_of("[A-Z]").alias("n_upper"),
        n_of("[0-9]").alias("n_digit"),
        n_of(" ").alias("n_space"),
    ).withColumn(
        "n_other",
        F.col("n_chars") - F.col("n_lower") - F.col("n_upper")
        - F.col("n_digit") - F.col("n_space"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_lower").alias("lower_chars"),
        F.sum("n_upper").alias("upper_chars"),
        F.sum("n_digit").alias("digit_chars"),
        F.sum("n_space").alias("space_chars"),
        F.sum("n_other").alias("other_chars"),
        F.sum(F.when(F.col("n_other") > 0, 1).otherwise(0)).alias("n_suspect_docs"),
    )


_CHARCLASS_SQL = """
WITH per_doc AS (
  SELECT source,
    length(text) AS n_chars,
    length(text) - length(regexp_replace(text, '[a-z]', '', 'g')) AS n_lower,
    length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
    length(text) - length(regexp_replace(text, ' ', '', 'g')) AS n_space
  FROM documents
),
aug AS (
  SELECT *, n_chars - n_lower - n_upper - n_digit - n_space AS n_other
  FROM per_doc
)
SELECT source,
  COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(n_lower) AS BIGINT) AS lower_chars,
  CAST(SUM(n_upper) AS BIGINT) AS upper_chars,
  CAST(SUM(n_digit) AS BIGINT) AS digit_chars,
  CAST(SUM(n_space) AS BIGINT) AS space_chars,
  CAST(SUM(n_other) AS BIGINT) AS other_chars,
  CAST(SUM(CASE WHEN n_other > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_suspect_docs
FROM aug GROUP BY source
"""

register(QuerySpec(
    "doc_charclass_audit", _charclass, _CHARCLASS_SQL,
    "per-source character-class profile (encoding sanity gate: "
    "letters/digits/spaces/other + suspect-doc counts, exact "
    "length-difference counting)",
    ("text", "quality", "audit"),
))


# --- doc_bigram_commonness: phrase-level stereotypy vs the corpus LM ------
# A count-based stand-in for LM scoring: how common are a document's
# bigrams in the whole corpus? Global bigram frequencies are built
# once (one groupBy) and joined back to each document's bigram
# stream; the per-doc mean corpus-frequency is exact-integer ratio6.
# High = boilerplate phrasing, low = unusual text — the cheap
# distributed proxy for perplexity filtering. The frequency table is
# vocabulary-bounded (tiny vs the corpus), so Spark broadcasts it; at
# 100 TB you'd cap it to the top-K bigrams and route the tail to a
# default count.

def _bigram_commonness(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    bg = d.select("doc_id", F.explode(X.bigram_zip(F.col("text"))).alias("p")).select(
        "doc_id", F.concat_ws(" ", F.col("p.0"), F.col("p.1")).alias("bg")
    )
    global_counts = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("gc"))
    joined = bg.join(F.broadcast(global_counts), "bg")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("gc").alias("sum_gc"),
        )
        .select(
            "doc_id", "n_bigrams",
            ratio6("sum_gc", "n_bigrams").alias("mean_bigram_freq"),
        )
    )


_BG_COMMON_SQL = f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id, p[1] || ' ' || p[2] AS bg
  FROM (SELECT doc_id, unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p
        FROM tok WHERE len(toks) >= 2)
),
gc AS (SELECT bg, COUNT(*) AS gc FROM bg GROUP BY bg)
SELECT b.doc_id, COUNT(*) AS n_bigrams,
  {ratio6_sql('SUM(g.gc)', 'COUNT(*)')} AS mean_bigram_freq
FROM bg b JOIN gc g ON b.bg = g.bg
GROUP BY b.doc_id
"""

register(QuerySpec(
    "doc_bigram_commonness", _bigram_commonness, _BG_COMMON_SQL,
    "per-document mean corpus-frequency of its bigrams (count-based "
    "perplexity proxy; broadcast frequency table, exact ratio6)",
    ("text", "lm", "join", "bench"),
))


# --- doc_keyword_contexts: keyword-in-context (KWIC) extraction -----------
# The concordance view annotation pipelines use for spot-checking a
# filter: for each (doc, catalog keyword) hit, the FIRST occurrence
# position (1-based locate/instr — identical in both engines) and a
# +-16-char context window (substr clamps at string edges
# identically). Narrow broadcast-join projection: the catalog rides
# as a literal dim, text is scanned once, nothing shuffles except the
# tiny result.

_KWIC_PAD = 16


def _kwic(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    catalog = spark.createDataFrame(
        _KEYWORD_CATALOG, "keyword string, category string")
    hit = d.crossJoin(F.broadcast(catalog)).withColumn(
        "pos", F.expr("instr(text, keyword)")
    ).filter(F.col("pos") > 0)
    ctx = F.expr(
        f"substr(text, greatest(1, pos - {_KWIC_PAD}), "
        f"pos - greatest(1, pos - {_KWIC_PAD}) + length(keyword) + {_KWIC_PAD})"
    )
    return hit.select(
        "doc_id", "keyword", "category", "pos", ctx.alias("context")
    )


_KWIC_SQL = f"""
SELECT doc_id, keyword, category, pos,
  substr(text, greatest(1, pos - {_KWIC_PAD}),
         pos - greatest(1, pos - {_KWIC_PAD}) + length(keyword) + {_KWIC_PAD}) AS context
FROM (
  SELECT d.doc_id, d.text, k.keyword, k.category,
         instr(d.text, k.keyword) AS pos
  FROM documents d, (VALUES {{catalog}}) AS k(keyword, category)
)
WHERE pos > 0
""".replace("{catalog}", _CATALOG_VALUES)

register(QuerySpec(
    "doc_keyword_contexts", _kwic, _KWIC_SQL,
    "keyword-in-context concordance: first-hit position + clamped "
    "context window per (doc, catalog keyword) — broadcast catalog, "
    "single text scan",
    ("text", "projection"),
))


# --- bpe_merge_candidates: vocab-induction pair counts (round-5) ----------
# The first iteration of BPE training: corpus-weighted counts of
# adjacent character pairs inside words. Shaped for scale the way a
# real tokenizer-training pipeline is: the corpus collapses to the
# DISTINCT-WORD grain first (groupBy word -> freq), so the pair
# explosion runs over the vocabulary (|V| rows), not the corpus —
# at 100 TB the vocabulary is millions while the corpus is trillions
# of tokens, making this the only workable shape. Exact integers
# end-to-end; top-50 under a total order (count desc, pair asc).

def _bpe_merges(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    tok = d.select(F.explode(X.tokens(F.col("text"))).alias("w"))
    words = (
        tok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        "freq",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(
        F.sum("freq").cast("long").alias("total_count"),
        F.count(F.lit(1)).alias("n_word_positions"),
    )
    return agg.orderBy(F.desc("total_count"), F.asc("pair")).limit(50)


_BPE_SQL = f"""
WITH tok AS (SELECT {_SQL_TOKS} AS toks FROM documents),
words AS (
  SELECT w, COUNT(*) AS freq
  FROM (SELECT unnest(toks) AS w FROM tok) GROUP BY w
),
pairs AS (
  SELECT freq,
    unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
  FROM words WHERE length(w) >= 2
),
agg AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS total_count,
    COUNT(*) AS n_word_positions
  FROM pairs GROUP BY pair
)
SELECT * FROM agg ORDER BY total_count DESC, pair ASC LIMIT 50
"""

register(QuerySpec(
    "bpe_merge_candidates", _bpe_merges, _BPE_SQL,
    "BPE vocab induction, iteration 1: corpus-weighted adjacent "
    "char-pair counts at distinct-word grain (|V| rows, not corpus "
    "rows), exact-integer top-50",
    ("text", "agg", "tokenizer"),
))


# --- doc_substring_dup_spans: windowed exact-substring duplication --------
# The exact-substring dedup signal (Lee et al., "Deduplicating
# Training Data Makes Language Models Better"): k-token windows are
# rolling-hashed and a window is a duplicate span iff it occurs in
# >= 2 DISTINCT documents. Per doc: distinct windows, duplicated
# windows, duplicated fraction. Engine-exact 60-bit md5 window ints
# (the minhash_md5 family) keep the shuffle narrow; the whole thing
# is explode -> distinct -> count -> semi-ish join back — linear in
# corpus tokens, the same shape the 100 TB version needs.

_DUP_K = 8


def _dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.dedup import substring_dup_stats

    d = fan_out(load_table(spark, sf, "documents"))
    return substring_dup_stats(d, k=_DUP_K).select(
        "doc_id", "n_windows", "n_dup_windows",
        ratio6("n_dup_windows", "n_windows").alias("dup_frac"),
    )


_DUP_SPANS_SQL = f"""
WITH tok AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
wins AS (
  SELECT DISTINCT doc_id,
    CAST('0x' || substr(md5(array_to_string(toks[i:i+{_DUP_K - 1}], ' ')), 1, 15) AS BIGINT) AS h
  FROM (
    SELECT doc_id, toks, unnest(range(1, len(toks) - {_DUP_K} + 2)) AS i
    FROM tok WHERE len(toks) >= {_DUP_K}
  )
),
counts AS (SELECT h, COUNT(*) AS nd FROM wins GROUP BY h)
SELECT w.doc_id,
  COUNT(*) AS n_windows,
  CAST(SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
  {ratio6_sql("SUM(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END)", "COUNT(*)")} AS dup_frac
FROM wins w JOIN counts c ON w.h = c.h
GROUP BY w.doc_id
"""

register(QuerySpec(
    "doc_substring_dup_spans", _dup_spans, _DUP_SPANS_SQL,
    f"exact-substring duplicate spans: {_DUP_K}-token rolling md5 "
    "windows occurring in >=2 distinct docs, per-doc duplicated "
    "fraction (Lee et al. substring-dedup signal)",
    ("text", "dedup", "agg"),
))


# --- vocab_oov_rate: tokenizer vocabulary coverage (round-5) --------------
# Given a frequency-built top-V vocabulary, what fraction of each
# source's token OCCURRENCES falls outside it — the
# coverage/out-of-vocabulary audit run before committing to a
# tokenizer. Two aggregations plus one broadcast join: the vocab is
# top-V (deterministic total order: freq desc, word asc), tiny by
# construction, so membership is a broadcast hash join against the
# token stream — no shuffle of the corpus beyond the per-source agg.

_VOCAB_V = 1000


def _oov_rate(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    tok = d.select("source", F.explode(X.tokens(F.col("text"))).alias("w"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    vocab = (
        freq.orderBy(F.desc("freq"), F.asc("w")).limit(_VOCAB_V)
        .select("w", F.lit(1).alias("in_v"))
    )
    j = tok.join(F.broadcast(vocab), "w", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_v").isNull(), 1).otherwise(0)).cast("long").alias("n_oov"),
    ).select(
        "source", "n_tokens", "n_oov",
        ratio6("n_oov", "n_tokens").alias("oov_rate"),
    )


_OOV_SQL = f"""
WITH tok AS (
  SELECT source, unnest(toks) AS w
  FROM (SELECT source, {_SQL_TOKS} AS toks FROM documents)
),
freq AS (SELECT w, COUNT(*) AS freq FROM tok GROUP BY w),
vocab AS (
  SELECT w FROM (
    SELECT w, ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) AS r FROM freq
  ) WHERE r <= {_VOCAB_V}
),
j AS (
  SELECT t.source, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
  FROM tok t LEFT JOIN vocab v ON t.w = v.w
)
SELECT source, COUNT(*) AS n_tokens,
  CAST(SUM(oov) AS BIGINT) AS n_oov,
  {ratio6_sql("SUM(oov)", "COUNT(*)")} AS oov_rate
FROM j GROUP BY source
"""

register(QuerySpec(
    "vocab_oov_rate", _oov_rate, _OOV_SQL,
    f"out-of-vocabulary rate per source against a top-{_VOCAB_V} "
    "frequency vocabulary (tokenizer coverage audit; broadcast "
    "membership join)",
    ("text", "tokenizer", "agg"),
))


# --- bpe_apply_fertility: iterative BPE merge APPLICATION (round-7) -------
# bpe_merge_candidates counts iteration-1 merge pairs; this query
# closes the loop (round-6 verdict task #5): learn an ordered top-K
# merge table from that same distinct-word grain, then ENCODE the
# corpus with it — K sequential rank-priority merge passes over each
# word's character sequence (a left-to-right fold per pass, the way
# real BPE applies its learned merges one rank at a time), and measure
# the resulting fertility/compression per source with the MERGED token
# counts rather than the heuristic length/4 estimate of
# doc_tokenizer_fertility.
#
# Scale shape: learning and application both run at the DISTINCT-WORD
# grain (|V| rows, not corpus rows); the merge table is a broadcast
# 1-row array; per-source totals come from joining per-source word
# frequencies against the encoded vocabulary — corpus text is never
# re-scanned per merge rank. Exact integers end-to-end; ratios via
# ratio6. The fold is engine-exact: Spark F.aggregate and DuckDB
# list_reduce run the same merge-or-append recurrence (verified
# element-by-element in tests).

_BPE_APPLY_K = 10


def _bpe_merge_pass(tokens_col: Column, pair: Column) -> Column:
    """One rank-priority merge pass: left-to-right fold that joins two
    adjacent 1-char tokens equal to ``pair`` (a merged 2-char token
    can never re-merge — its concat with a neighbor is 3 chars)."""
    return F.aggregate(
        tokens_col,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, x: F.when(
            F.concat(F.try_element_at(acc, F.lit(-1)), x) == pair,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(pair)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_apply(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    tok = d.select("source", F.explode(X.tokens(F.col("text"))).alias("w"))
    src_words = tok.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("long").alias("freq_s")
    )
    vocab = src_words.groupBy("w").agg(
        F.sum("freq_s").cast("long").alias("freq")
    )
    pairs = vocab.filter(F.length("w") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"
            )
        ).alias("pair"),
    )
    agg = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("cnt"))
    merge_tbl = (
        agg.orderBy(F.desc("cnt"), F.asc("pair"))
        .limit(_BPE_APPLY_K)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("cnt")).alias("nc"),
                            F.col("pair").alias("p"),
                        )
                    )
                ),
                lambda s: s.getField("p"),
            ).alias("merges")
        )
    )
    enc = vocab.crossJoin(F.broadcast(merge_tbl))
    toks = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
    for r in range(1, _BPE_APPLY_K + 1):
        toks = _bpe_merge_pass(toks, F.element_at(F.col("merges"), r))
    vt = enc.select("w", F.size(toks).cast("long").alias("n_tok"))
    joined = src_words.join(vt, "w")
    return (
        joined.groupBy("source")
        .agg(
            F.sum("freq_s").cast("long").alias("n_words"),
            F.sum(F.col("freq_s") * F.length("w")).cast("long").alias("n_chars"),
            F.sum(F.col("freq_s") * F.col("n_tok")).cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "source", "n_words", "n_chars", "n_bpe_tokens",
            ratio6("n_bpe_tokens", "n_words").alias("fertility"),
            ratio6("n_chars", "n_bpe_tokens").alias("chars_per_token"),
        )
    )


def _bpe_apply_iteration_sql(r: int) -> str:
    # DuckDB lambdas cannot contain subqueries but DO capture columns
    # of the enclosing row, so the rank-r pair rides in via a 1-row
    # cross join (max() over the empty set keeps it 1 row / NULL if
    # fewer than r merges exist, matching Spark's try_element_at).
    return f"""it{r} AS (
  SELECT w, list_reduce(list_transform(toks, t -> [t]), (acc, x) ->
    CASE WHEN acc[-1] || x[1] = p{r}
         THEN list_append(acc[1:(len(acc)-1)], acc[-1] || x[1])
         ELSE list_append(acc, x[1]) END) AS toks
  FROM it{r - 1} CROSS JOIN
    (SELECT max(pair) AS p{r} FROM bpe_merges WHERE rnk = {r})
)"""


_BPE_ITERS = ",\n".join(
    _bpe_apply_iteration_sql(r) for r in range(1, _BPE_APPLY_K + 1)
)

_BPE_APPLY_SQL = f"""
WITH tok AS (
  SELECT source, unnest(toks) AS w
  FROM (SELECT source, {_SQL_TOKS} AS toks FROM documents)
),
src_words AS (
  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS freq_s FROM tok GROUP BY 1, 2
),
vocab AS (
  SELECT w, CAST(SUM(freq_s) AS BIGINT) AS freq FROM src_words GROUP BY w
),
bpe_pairs AS (
  SELECT freq,
    unnest(list_transform(range(1, length(w)), i -> substr(w, i, 2))) AS pair
  FROM vocab WHERE length(w) >= 2
),
bpe_agg AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM bpe_pairs GROUP BY pair
),
bpe_merges AS (
  SELECT pair, rnk FROM (
    SELECT pair, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair ASC) AS rnk
    FROM bpe_agg
  ) WHERE rnk <= {_BPE_APPLY_K}
),
it0 AS (
  SELECT w, list_transform(range(1, length(w) + 1), i -> substr(w, i, 1)) AS toks
  FROM vocab
),
{_BPE_ITERS},
vt AS (SELECT w, CAST(len(toks) AS BIGINT) AS n_tok FROM it{_BPE_APPLY_K}),
j AS (SELECT s.source, s.freq_s, length(s.w) AS wlen, v.n_tok
      FROM src_words s JOIN vt v ON s.w = v.w),
g AS (
  SELECT source,
    CAST(SUM(freq_s) AS BIGINT) AS n_words,
    CAST(SUM(freq_s * wlen) AS BIGINT) AS n_chars,
    CAST(SUM(freq_s * n_tok) AS BIGINT) AS n_bpe_tokens
  FROM j GROUP BY source
)
SELECT source, n_words, n_chars, n_bpe_tokens,
  {ratio6_sql("n_bpe_tokens", "n_words")} AS fertility,
  {ratio6_sql("n_chars", "n_bpe_tokens")} AS chars_per_token
FROM g
"""

register(QuerySpec(
    "bpe_apply_fertility", _bpe_apply, _BPE_APPLY_SQL,
    f"apply the top-{_BPE_APPLY_K} learned BPE merges to the corpus "
    "(rank-priority fold passes at distinct-word grain) and measure "
    "per-source fertility/compression with MERGED token counts",
    ("text", "tokenizer", "agg", "mixing"),
))


# --- vocab_coverage_curve: tokenizer vocabulary sizing (round-7) ----------
# The vocabulary-size decision every tokenizer build makes: what
# fraction of corpus TOKENS does a top-k vocabulary cover? Words
# ranked by (freq DESC, word ASC — the tie-break makes the curve
# deterministic), cumulative token coverage read off at standard
# vocab-size checkpoints. The ranking window runs over the DISTINCT-
# WORD grain: vocabulary grows ~sublinearly in corpus size (Heaps'
# law, measured on this corpus in SCALING.md), so the global sort is
# over thousands of rows when the corpus is billions — the same
# deliberate design as the BPE family; corpus-sized rows never enter
# a global order.

# the synthetic corpus draws from a ~31-word list, so checkpoints
# span that range; on a natural corpus these would be 1k..128k
_COVERAGE_RANKS = (1, 2, 4, 8, 16, 24, 30)


def _vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf, "documents"))
    vocab = (
        d.select(F.explode(X.tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), F.asc("w"))
    # Two windows instead of one (r12 verdict task #3): the rank-only
    # window plus a `rank <= max` filter lets Spark's
    # InferWindowGroupLimit rule insert a WindowGroupLimit that bounds
    # the single-partition sort's input to the top rows per input
    # partition (a sum in the SAME window node blocks the rule, and
    # `isin` alone is a predicate it doesn't recognise). The prefix
    # cum_tokens sum then runs over the <=max(ranks)-row survivor
    # frame — it only ever reads rows ranked above a survivor, all
    # inside the kept prefix, so the values are unchanged.
    ranked = (
        vocab.select(
            "w", "freq", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= max(_COVERAGE_RANKS))
    )
    ranked = ranked.select(
        "w", "freq", "rank",
        F.sum("freq").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum_tokens"),
    ).filter(F.col("rank").isin(*_COVERAGE_RANKS))
    total = vocab.agg(F.sum("freq").cast("long").alias("total_tokens"))
    return (
        ranked.join(F.broadcast(total))
        .select(
            F.col("rank").cast("int").alias("vocab_size"),
            F.col("w").alias("boundary_word"),
            F.col("freq").cast("long").alias("boundary_freq"),
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
            ratio6("cum_tokens", "total_tokens").alias("coverage"),
        )
    )


_COVERAGE_SQL = f"""
WITH vocab AS (
  SELECT w, COUNT(*) AS freq
  FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents)
  GROUP BY w
),
ranked AS (
  SELECT w, freq,
    ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) AS rank,
    SUM(freq) OVER (ORDER BY freq DESC, w ASC
                    ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM vocab
),
total AS (SELECT SUM(freq) AS total_tokens FROM vocab)
SELECT CAST(rank AS INT) AS vocab_size,
  w AS boundary_word,
  CAST(freq AS BIGINT) AS boundary_freq,
  CAST(cum_tokens AS BIGINT) AS cum_tokens,
  {ratio6_sql('cum_tokens', '(SELECT total_tokens FROM total)')} AS coverage
FROM ranked
WHERE rank IN {_COVERAGE_RANKS}
"""

register(QuerySpec(
    "vocab_coverage_curve", _vocab_coverage, _COVERAGE_SQL,
    "cumulative token coverage of a top-k vocabulary at standard "
    "size checkpoints (distinct-word grain ranking, deterministic "
    "freq-then-word order)",
    ("text", "tokenizer", "window"),
))


# --- bm25_topk: sparse lexical retrieval (round-7) ------------------------
# BM25 ranking with every factor kept RATIONAL so two engines agree
# bit-for-bit (the log-free discipline bigram_pmi_topk established:
# monotone rational surrogates instead of ln). With k1 = 6/5 and
# b = 3/4, and idf = (N+1)/(df+1) (the log's argument, monotone in
# it), the per-(doc, term) score cross-multiplies to
#   num = (N+1) * 22 * tf * T
#   den = (df+1) * (10*tf*T + 3*T + 9*dl*N)
# where T = total corpus tokens, N = docs, dl = doc length. The
# rounding step (num*2e6 + den) div (2*den) runs in DECIMAL(38)/
# HUGEINT (verified to agree exactly between engines), so there is
# no int64 ceiling to outgrow — num*2e6 crosses 2^63 around sf1.
# Each term contributes its exact half-up micro-unit rounding; the
# doc score is the BIGINT sum of those micro-units. Query terms are
# data-derived (vocab freq ranks 3/7/11 — deterministic tie-broken
# ranking over the distinct-word grain), so the query composes with
# any corpus. Plan: tf/dl/df are the inverted-index aggregations a
# search engine precomputes; the query-term probe is a broadcast
# join against tf — corpus-sized rows shuffle exactly once (tf
# grain), the probe itself touches only matching postings.

_BM25_QRANKS = (3, 7, 11)
_BM25_TOPK = 20


def _bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf, "documents"))
    toks = d.select("doc_id", F.explode(X.tokens(F.col("text"))).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    ).localCheckpoint(eager=False)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    vocab = tf.groupBy("w").agg(
        F.sum("tf").cast("long").alias("freq"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    qterms = (
        vocab.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("w"))),
        )
        # `rank <= max` before the isin so the window-group-limit rule
        # bounds the global ranking window's input per partition
        # (same fix as vocab_coverage_curve, r12 verdict task #3).
        .filter(
            (F.col("rank") <= max(_BM25_QRANKS))
            & F.col("rank").isin(*_BM25_QRANKS)
        )
        .select("w", "df")
    )
    scalars = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("t_tokens"),
    )
    big = "CAST({} AS DECIMAL(38,0))"
    num = (
        F.expr(big.format("n_docs + 1")) * 22 * F.col("tf")
        * F.col("t_tokens")
    )
    den = F.expr(big.format("df + 1")) * (
        F.expr(big.format("10 * tf")) * F.col("t_tokens")
        + 3 * F.col("t_tokens")
        + F.expr(big.format("9 * dl")) * F.col("n_docs")
    )
    scored = (
        tf.join(F.broadcast(qterms), "w")
        .join(dl, "doc_id")
        .join(F.broadcast(scalars))
        .select(
            "doc_id",
            # integer div, never `/`: a double quotient loses ulps
            # past 2^53 and num*2e6 crosses that by sf0.1
            (num * 2_000_000 + den).alias("__n"),
            (2 * den).alias("__d"),
        )
        .select(
            "doc_id",
            F.expr("__n div __d").cast("long").alias("term_micro"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("term_micro").cast("long").alias("score_micro"))
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(_BM25_TOPK)
    )


_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
),
tf AS MATERIALIZED (
  SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
vocab AS (
  SELECT w, SUM(tf) AS freq, COUNT(*) AS df FROM tf GROUP BY 1
),
qterms AS (
  SELECT w, df FROM (
    SELECT w, df,
      ROW_NUMBER() OVER (ORDER BY freq DESC, w ASC) AS rank
    FROM vocab
  ) WHERE rank IN {_BM25_QRANKS}
),
scalars AS (
  SELECT COUNT(*) AS n_docs, SUM(dl) AS t_tokens FROM dl
),
scored AS (
  SELECT t.doc_id,
    (CAST(s.n_docs + 1 AS HUGEINT) * 22 * t.tf * s.t_tokens * 2000000
     + CAST(q.df + 1 AS HUGEINT)
       * (CAST(10 * t.tf AS HUGEINT) * s.t_tokens + 3 * s.t_tokens
          + CAST(9 * d.dl AS HUGEINT) * s.n_docs))
    // (2 * CAST(q.df + 1 AS HUGEINT)
          * (CAST(10 * t.tf AS HUGEINT) * s.t_tokens + 3 * s.t_tokens
             + CAST(9 * d.dl AS HUGEINT) * s.n_docs)) AS term_micro
  FROM tf t
  JOIN qterms q ON t.w = q.w
  JOIN dl d ON t.doc_id = d.doc_id
  CROSS JOIN scalars s
)
SELECT doc_id, CAST(SUM(term_micro) AS BIGINT) AS score_micro
FROM scored GROUP BY doc_id
ORDER BY score_micro DESC, doc_id ASC LIMIT {_BM25_TOPK}
"""

register(QuerySpec(
    "bm25_topk", _bm25_topk, _BM25_SQL,
    "BM25 top-k lexical retrieval with fully rational scoring "
    "(k1=6/5, b=3/4, ratio idf) — exact micro-unit term scores, "
    "data-derived query terms, inverted-index plan shape",
    ("text", "retrieval", "join", "bench"),
))


# --- doc_unigram_surprisal: CCNet-style LM quality scoring (round-9) -------
# The perplexity-filter step of CCNet/RefinedWeb-style pipelines,
# made engine-exact: a unigram LM is fit on the corpus itself
# (token -> count, N = total tokens) and each document is scored by
# its mean token surprisal. Logarithms are the engine-fragile part —
# so surprisal is computed in FLOORED BITS with pure integers:
# floor(log2(N / count)) == length(bin(N div count)) - 1, because an
# integer quotient and its rational value always share a power-of-2
# bucket. bin() exists on both engines (Spark F.bin, DuckDB bin) and
# is exact at any int64 — no float log ever runs. High mean
# surprisal = rare-token gibberish, low = boilerplate; both tails are
# what the filter drops.
#
# Scale shape: token explode -> one count aggregation (map-side
# combinable) -> broadcast-sized LM joined back to the token stream
# -> per-doc aggregation. The LM table is vocabulary-sized; at 100 TB
# the join stays broadcast while the token stream only shuffles at
# doc grain.

def _doc_unigram_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    # r14 examined, left as-is: a (doc_id, tok, c) pre-aggregation
    # that tokenizes once was measured 1.56 -> 1.63 s at sf0.1 — the
    # extra full-width (doc, tok) exchange it needs costs exactly what
    # the saved second tokenize buys. This shape's shuffles are
    # already minimal: the LM aggregate and the per-doc aggregate are
    # both map-side combinable, so only vocabulary-sized and
    # doc-count-sized rows ever cross the wire.
    d = fan_out(load_table(spark, sf, "documents"))
    toks = d.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("tok"))
    lm = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = lm.agg(F.sum("cnt").cast("long").alias("n_total"))
    scored = (
        toks.join(F.broadcast(lm), "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.length(F.bin(F.expr("n_total div cnt"))) - 1)
            .cast("long").alias("sbits"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum("sbits").cast("long").alias("surprisal_bits"),
        ratio6("sum(sbits)", "count(1)").alias("mean_surprisal_bits"),
    )


_SURPRISAL_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest({_SQL_TOKS}) AS tok FROM documents
),
lm AS MATERIALIZED (
  SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
),
total AS (SELECT SUM(cnt) AS n_total FROM lm),
scored AS (
  SELECT t.doc_id,
    CAST(length(bin((SELECT n_total FROM total) // l.cnt)) - 1 AS BIGINT)
      AS sbits
  FROM toks t JOIN lm l USING (tok)
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
  CAST(SUM(sbits) AS BIGINT) AS surprisal_bits,
  {ratio6_sql("SUM(sbits)", "COUNT(*)")} AS mean_surprisal_bits
FROM scored GROUP BY doc_id
"""

register(QuerySpec(
    "doc_unigram_surprisal", _doc_unigram_surprisal, _SURPRISAL_SQL,
    "CCNet-style unigram-LM quality score: per-doc mean token "
    "surprisal in floored bits — floor(log2(N/count)) computed as "
    "length(bin(N div count))-1, pure integers, no float log on "
    "either engine",
    ("text", "quality", "agg", "join", "bench"),
))
