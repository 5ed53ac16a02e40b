"""Training-mix construction over the document lake: deterministic
split, token-budget selection, and source mixing weights.

These are the operations that turn a filtered corpus into a training
dataset: reproducible train/val carve-out, "take the best documents
until the token budget is spent", and per-source sampling weights.
All are exact arithmetic (LCG hash, banded cumulative sums), so every
query is DuckDB-oracled.

Scale notes are inline — the budget selection deliberately avoids a
global per-document cumulative window (a single-partition sort at
100 TB) in favor of quality BANDS: a ~100-row banded cumsum picks the
cutoff, and the per-document work stays embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources.io import fan_out, load_table
from .catalog import QuerySpec, ratio6, ratio6_sql, register
from .text_queries import _EN, _SQL_TOKS

# LCG constants (Numerical Recipes, public) — a hash both engines can
# compute exactly in BIGINT arithmetic, unlike murmur/xxhash.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2_147_483_648
_VAL_PCT = 10  # lowest 10% of hash space -> validation

TOKEN_BUDGET = 20_000


# --- doc_train_val_split: reproducible hash carve-out ---------------------

def _split(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    h = (F.col("doc_id") * _LCG_A + _LCG_C) % _LCG_M
    return d.select(
        "doc_id",
        h.alias("hash_bucket"),
        F.when(h < _LCG_M * _VAL_PCT // 100, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


_SPLIT_SQL = f"""
SELECT doc_id,
  (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} AS hash_bucket,
  CASE WHEN (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} < {_LCG_M * _VAL_PCT // 100}
       THEN 'val' ELSE 'train' END AS split
FROM documents
"""

register(QuerySpec(
    "doc_train_val_split", _split, _SPLIT_SQL,
    "deterministic LCG-hash train/val split — reproducible across runs "
    "and engines, no sampling state",
    ("mixing", "bench"),
))


# --- token_budget_selection: banded greedy fill ---------------------------
# Docs are banded by rounded quality score; whole bands are taken from
# the best down while the cumulative token count stays inside the
# budget. The cumsum window runs over ~100 band rows, never over
# documents — the per-doc side is a band equi-join against a broadcast
# cutoff, so the plan scales.

def _budget(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    # quality_score + token_count share ONE tokenize via the fused
    # struct (functions/text.quality_token_struct), consumed through
    # an exploded one-element struct so the regex chain runs once.
    per_doc = (
        d.select(
            "doc_id",
            F.explode(F.array(X.quality_token_struct(F.col("text")))).alias("qt"),
        )
        .select(
            "doc_id",
            F.round(F.col("qt.score"), 2).alias("band"),
            F.col("qt.n_tokens").cast("long").alias("n_tokens"),
        )
    )
    bands = per_doc.groupBy("band").agg(F.sum("n_tokens").alias("band_tokens"))
    # cumsum-from-the-top as a broadcast triangle self-join: for ~100
    # band rows this is trivial and, unlike a global ordered window,
    # never funnels data through one partition.
    better = bands.select(
        F.col("band").alias("b_band"), F.col("band_tokens").alias("b_tokens")
    )
    selected_bands = (
        bands.join(F.broadcast(better), F.col("b_band") >= F.col("band"))
        .groupBy("band")
        .agg(F.sum("b_tokens").alias("cum_tokens"))
        .filter(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("band", "cum_tokens")
    )
    return (
        per_doc.join(F.broadcast(selected_bands), "band")
        .select("doc_id", "band", "n_tokens")
    )


# tok/sig/per_doc CTE chain shared by every band-based oracle
# (token_budget_selection, curriculum_schedule): per-doc quality band
# + exact token count, the DuckDB twin of X.quality_score banding.
_BAND_CTES = """tok AS (SELECT doc_id, text, {toks} AS toks FROM documents),
sig AS (
  SELECT doc_id, len(toks) AS n_tok,
    CASE WHEN len(toks) > 0
         THEN CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS mwl,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(toks, t -> t IN ({en}))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS swr,
    CASE WHEN length(text) > 0
         THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
         ELSE 0.0 END AS pr
  FROM tok
),
per_doc AS (
  SELECT doc_id,
    round(((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN swr >= 0.05 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 4.0, 2) AS band,
    CAST(n_tok AS BIGINT) AS n_tokens
  FROM sig
)"""

_BUDGET_SQL = f"""
WITH {{band_ctes}},
bands AS (
  SELECT band, sum(n_tokens) AS band_tokens FROM per_doc GROUP BY band
),
cum AS (
  SELECT band, sum(band_tokens) OVER (ORDER BY band DESC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM bands
)
SELECT p.doc_id, p.band, p.n_tokens
FROM per_doc p JOIN cum c ON p.band = c.band
WHERE c.cum_tokens <= {TOKEN_BUDGET}
"""


register(QuerySpec(
    "token_budget_selection", _budget,
    _BUDGET_SQL.format(band_ctes=_BAND_CTES.format(toks=_SQL_TOKS, en=_EN)),
    "greedy quality-band fill to a token budget — banded cumsum "
    "(~100 rows) + broadcast cutoff join, never a global per-doc window",
    ("mixing", "bench"),
))


# --- source_mixing_weights: per-source sampling weights -------------------
# Uniform and sqrt-smoothed (the standard down-weighting of huge
# sources in pretraining mixes) — one tiny groupBy + broadcast scalar.

def _weights(spark: SparkSession, sf: str) -> DataFrame:
    # sqrt weights are quantized to integer micro-units BEFORE the sum:
    # summing raw doubles is partition-merge-order dependent (the round-3
    # driver-gate failure), while an int64 sum is exact and order-free.
    # floor(sqrt(x)*1e6) is deterministic cross-engine: sqrt and * are
    # single correctly-rounded IEEE ops, floor takes the double as-is.
    d = fan_out(load_table(spark, sf, "documents"))
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(X.token_count(F.col("text")).cast("long")).alias("tokens"),
    ).withColumn(
        "sq6",
        F.expr("CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT)"),
    )
    tot = src.agg(
        F.sum(F.col("sq6")).alias("sum_sq6"),
        F.count(F.lit(1)).alias("k"),
    )
    return (
        src.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "tokens",
            ratio6("CAST(1 AS BIGINT)", "k").alias("weight_uniform"),
            ratio6("sq6", "sum_sq6").alias("weight_sqrt"),
        )
    )


_WEIGHTS_SQL = f"""
WITH tok AS (SELECT source, {{toks}} AS toks FROM documents),
src AS (
  SELECT source, count(*) AS n_docs,
    CAST(sum(CAST(len(toks) AS BIGINT)) AS BIGINT) AS tokens
  FROM tok GROUP BY source
),
sq AS (
  SELECT *, CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * 1000000) AS BIGINT) AS sq6
  FROM src
),
tot AS (SELECT sum(sq6) AS sum_sq6, count(*) AS k FROM sq)
SELECT source, n_docs, tokens,
  {ratio6_sql('CAST(1 AS BIGINT)', 'k')} AS weight_uniform,
  {ratio6_sql('sq6', 'sum_sq6')} AS weight_sqrt
FROM sq, tot
"""


register(QuerySpec(
    "source_mixing_weights", _weights,
    _WEIGHTS_SQL.format(toks=_SQL_TOKS),
    "per-source mixing weights (uniform + sqrt-smoothed) for a "
    "pretraining data mix",
    ("mixing",),
))


# --- stratified_sample_lcg: per-source deterministic sampling -------------
# The "apply the mixing weights" step: each source keeps a different
# fraction of documents, decided by exact LCG-hash arithmetic on the
# doc id (no RNG state, no sampleBy seed drift across engines or
# retries). Embarrassingly parallel — a filter over the scan.

_SAMPLE_PER_10K = {"src0": 5000, "src1": 2500}  # others: 10%
_SAMPLE_DEFAULT = 1000


def _stratified(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    slot = (F.col("doc_id") * _LCG_A + _LCG_C) % _LCG_M % 10000
    rate = F.lit(_SAMPLE_DEFAULT)
    for src, r in _SAMPLE_PER_10K.items():
        rate = F.when(F.col("source") == src, r).otherwise(rate)
    return d.filter(slot < rate).select(
        "doc_id", "source", slot.alias("sample_slot")
    )


_STRAT_SQL = f"""
SELECT doc_id, source,
  (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} % 10000 AS sample_slot
FROM documents
WHERE (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} % 10000 <
  CASE source WHEN 'src0' THEN 5000 WHEN 'src1' THEN 2500 ELSE {_SAMPLE_DEFAULT} END
"""

register(QuerySpec(
    "stratified_sample_lcg", _stratified, _STRAT_SQL,
    "deterministic per-source stratified sampling via exact LCG slots "
    "(applies mixing weights without sampler state)",
    ("mixing", "sampling"),
))


# --- doc_pii_scrub: deterministic redaction with audit counts -------------
# The pre-training privacy pass: regex redaction of emails/phones with
# per-document counts. The synthetic corpus has no PII, so it is
# PLANTED deterministically (same arithmetic on both engines) —
# redaction then has known ground truth. ASCII-only patterns chosen to
# mean the same thing in Java regex and RE2. The scrubbed text is
# md5-fingerprinted so the gate verifies the full output without
# hauling documents through the compare.

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "\\+225 [0-9]{2} [0-9]{2} [0-9]{2} [0-9]{2}"


def _pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    planted = d.withColumn(
        "ptext",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.lit(" tel +225 01 02 03 "), F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0")),
            ).otherwise(F.lit("")),
        ),
    )
    scrubbed = planted.select(
        "doc_id",
        F.regexp_count(F.col("ptext"), F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count(F.col("ptext"), F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.md5(
            F.regexp_replace(
                F.regexp_replace("ptext", _EMAIL_RE, "[EMAIL]"),
                _PHONE_RE, "[PHONE]",
            )
        ).alias("scrubbed_md5"),
    )
    return scrubbed


_PII_SQL = f"""
WITH planted AS (
  SELECT doc_id,
    text
      || CASE WHEN doc_id % 7 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE '' END
      || CASE WHEN doc_id % 11 = 0
              THEN ' tel +225 01 02 03 ' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
              ELSE '' END AS ptext
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(ptext, '{_EMAIL_RE}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(ptext, '{_PHONE_RE}')) AS INT) AS n_phones,
  md5(regexp_replace(regexp_replace(ptext, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                     '{_PHONE_RE}', '[PHONE]', 'g')) AS scrubbed_md5
FROM planted
"""

register(QuerySpec(
    "doc_pii_scrub", _pii_scrub, _PII_SQL,
    "regex PII redaction (emails/phones) with audit counts and an md5 "
    "fingerprint of the scrubbed text — planted ground truth",
    ("mixing", "privacy", "regex", "bench"),
))


# --- doc_sequence_packing: greedy context-window packing ------------------
# Assigns documents to fixed-size training bins per source: a window
# cumsum of token counts (partitioned by source, ordered by doc id —
# never global) and bin = floor(start_offset / bin_size). This is the
# deterministic first-come packing used to build fixed-length
# pretraining sequences; at 100 TB each source packs independently.

_BIN_TOKENS = 2048


def _packing(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    per_doc = d.select(
        "doc_id", "source",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return per_doc.select(
        "doc_id", "source", "n_tokens",
        F.floor(start / _BIN_TOKENS).cast("long").alias("bin_idx"),
    )


_PACKING_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, CAST(len({{toks}}) AS BIGINT) AS n_tokens FROM documents
)
SELECT doc_id, source, n_tokens,
  CAST(floor(CAST(SUM(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS DOUBLE)
    / {_BIN_TOKENS}) AS BIGINT) AS bin_idx
FROM tok
"""

register(QuerySpec(
    "doc_sequence_packing", _packing,
    _PACKING_SQL.format(toks=_SQL_TOKS),
    "per-source greedy packing of documents into fixed token bins "
    "(pretraining sequence construction; windows never global)",
    ("mixing", "window", "bench"),
))


# --- benchmark_decontamination: n-gram overlap vs a held-out set ----------
# The eval-set decontamination pass every training pipeline needs:
# any document sharing a 3-token shingle with a benchmark document is
# flagged (with the shared-shingle count as evidence). The benchmark
# shingle set is small and broadcasts; the corpus side is one explode
# + one shuffle on the flagged ids — never a doc x doc join.

_DECON_N = 3


def _decontam(spark: SparkSession, sf: str) -> DataFrame:
    from ..functions import similarity as S

    d = fan_out(load_table(spark, sf, "documents"))
    is_bench = F.col("doc_id") % 97 == 0
    sh = S.word_ngrams(F.col("text"), _DECON_N)
    bench_sh = d.filter(is_bench).select(F.explode(sh).alias("sh")).distinct()
    doc_sh = d.filter(~is_bench).select("doc_id", F.explode(sh).alias("sh"))
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated_shingles"))
    )


_DECON_SQL = """
WITH tok AS (SELECT doc_id, {toks} AS toks FROM documents),
sh AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
  FROM tok
),
bench AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0),
doc_sh AS (SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id % 97 != 0)
SELECT doc_id, COUNT(*) AS n_contaminated_shingles
FROM doc_sh JOIN bench USING (s)
GROUP BY doc_id
"""

register(QuerySpec(
    "benchmark_decontamination", _decontam,
    _DECON_SQL.format(toks=_SQL_TOKS),
    "flag training documents sharing 3-token shingles with a held-out "
    "benchmark set (broadcast shingle join — eval decontamination)",
    ("mixing", "decontamination", "bench"),
))


# --- corpus_stage_counts: the pipeline arithmetic, value-verified ---------
# One row of per-stage corpus counts: raw -> quality-filtered ->
# exact-deduped (keep-best survivor per fingerprint) -> train/val.
# This gate-verifies the COMPOSITION the corpus pipeline driver runs
# (orchestrate_corpus.py), not just each kernel: the oracle recomputes
# filter score, md5 fingerprint grouping, the keep-best survivor
# choice and the LCG split from scratch in SQL.

def _stage_counts(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators import dedup as D

    d = fan_out(load_table(spark, sf, "documents"))
    filtered = d.filter(X.quality_score(F.col("text")) >= 0.5)
    exact = D.exact_dedup(
        filtered,
        key=X.fingerprint(F.col("text")),
        order_cols=[F.length("text").desc(), F.col("doc_id")],
        id_col="doc_id",
    )
    h = (F.col("doc_id") * _LCG_A + _LCG_C) % _LCG_M
    split = exact.withColumn(
        "split",
        F.when(h < _LCG_M * _VAL_PCT // 100, F.lit("val")).otherwise(F.lit("train")),
    )
    n_raw = d.agg(F.count(F.lit(1)).alias("n_raw"))
    n_filtered = filtered.agg(F.count(F.lit(1)).alias("n_filtered"))
    n_split = split.agg(
        F.count(F.lit(1)).alias("n_exact_deduped"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("n_val"),
    )
    return (
        n_raw.crossJoin(F.broadcast(n_filtered)).crossJoin(F.broadcast(n_split))
        .select("n_raw", "n_filtered", "n_exact_deduped", "n_train", "n_val")
    )


_STAGE_COUNTS_SQL = f"""
WITH tok AS (SELECT doc_id, text, {{toks}} AS toks FROM documents),
sig AS (
  SELECT doc_id, text, toks, len(toks) AS n_tok,
    CASE WHEN len(toks) > 0
         THEN CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS mwl,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_filter(toks, t -> t IN ({{en}}))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS swr,
    CASE WHEN length(text) > 0
         THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) / length(text)
         ELSE 0.0 END AS pr
  FROM tok
),
filtered AS (
  SELECT doc_id, text, toks FROM sig
  WHERE ((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
       + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
       + (CASE WHEN swr >= 0.05 THEN 1.0 ELSE 0.0 END)
       + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 4.0 >= 0.5
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (
    PARTITION BY md5(array_to_string(list_sort(list_distinct(toks)), ' '))
    ORDER BY length(text) DESC, doc_id) AS rn
  FROM filtered
),
survivors AS (
  SELECT doc_id,
    CASE WHEN (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} < {_LCG_M * _VAL_PCT // 100}
         THEN 'val' ELSE 'train' END AS split
  FROM ranked WHERE rn = 1
)
SELECT (SELECT COUNT(*) FROM tok) AS n_raw,
       (SELECT COUNT(*) FROM filtered) AS n_filtered,
       (SELECT COUNT(*) FROM survivors) AS n_exact_deduped,
       (SELECT COUNT(*) FROM survivors WHERE split = 'train') AS n_train,
       (SELECT COUNT(*) FROM survivors WHERE split = 'val') AS n_val
"""

register(QuerySpec(
    "corpus_stage_counts", _stage_counts,
    _STAGE_COUNTS_SQL.format(toks=_SQL_TOKS, en=_EN),
    "per-stage corpus counts (raw -> filter -> exact dedup keep-best -> "
    "train/val) — the pipeline composition itself value-verified",
    ("mixing", "pipeline"),
))


# --- doc_chunk_spans: fixed-size training windows with overlap ------------
# The chunking step before sequence packing: each document yields
# windows of CHUNK tokens with STRIDE overlap (start positions
# 1, 1+STRIDE, ... while start <= n_tokens). Pure per-row arithmetic
# from the token count — embarrassingly parallel, no shuffle at all.

_CHUNK = 128
_STRIDE = 96


def _chunk_spans(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    n = X.token_count(F.col("text"))
    doc = d.select("doc_id", n.alias("n_tokens")).filter(F.col("n_tokens") > 0)
    starts = F.sequence(
        F.lit(1),
        (F.floor((F.col("n_tokens") - 1) / _STRIDE) * _STRIDE + 1).cast("bigint"),
        F.lit(_STRIDE),
    )
    return doc.select(
        "doc_id", "n_tokens", F.explode(starts).alias("start_tok")
    ).select(
        "doc_id",
        F.expr(f"(start_tok - 1) div {_STRIDE}").alias("chunk_id"),
        "start_tok",
        F.least(
            F.col("start_tok") + _CHUNK - 1, F.col("n_tokens")
        ).alias("end_tok"),
    )


_CHUNK_SQL = f"""
WITH tok AS (
  SELECT doc_id, CAST(len({{toks}}) AS BIGINT) AS n_tokens FROM documents
),
doc AS (SELECT * FROM tok WHERE n_tokens > 0)
SELECT doc_id,
  (start_tok - 1) // {_STRIDE} AS chunk_id,
  start_tok,
  least(start_tok + {_CHUNK} - 1, n_tokens) AS end_tok
FROM (
  SELECT doc_id, n_tokens,
    unnest(range(1, ((n_tokens - 1) // {_STRIDE}) * {_STRIDE} + 2, {_STRIDE})) AS start_tok
  FROM doc
)
"""

register(QuerySpec(
    "doc_chunk_spans", _chunk_spans,
    _CHUNK_SQL.format(toks=_SQL_TOKS),
    "fixed-size training windows (128 tokens, stride 96) per document "
    "— pure per-row arithmetic, zero shuffle",
    ("mixing", "projection", "bench"),
))


# --- label_class_weights: inverse-frequency training weights --------------
# Class balancing over the embeddings labels: per-class counts and
# inverse-frequency weights (total/(k*count)), the standard loss
# reweighting. Exact integers + one ratio6-scaled weight.

def _class_weights(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    per = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    tot = per.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("k")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "label", "n", "total",
            ratio6("total", "k * n").alias("weight"),
        )
    )


_CLASS_WEIGHTS_SQL = f"""
WITH per AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS k FROM per)
SELECT label, n, total, {ratio6_sql('total', 'k * n')} AS weight
FROM per, tot
"""

register(QuerySpec(
    "label_class_weights", _class_weights, _CLASS_WEIGHTS_SQL,
    "inverse-frequency class weights over embedding labels "
    "(loss-reweighting prep)",
    ("mixing", "vector", "agg"),
))


# --- doc_ffd_packing: first-fit-decreasing pack assignment ----------------
# The tighter (imperative) counterpart of doc_sequence_packing: FFD
# bin packing per source via the grouped-map applyInPandas operator
# (operators/packing.py). Mutable per-pack state is not
# SQL-expressible, so this is a rows-only registry entry; its
# correctness contract lives in the invariant suite
# (tests/test_packing.py: budget bound, coverage, determinism under
# repartitioning, pack-count lower bound).

def _ffd(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import ffd_pack

    d = fan_out(load_table(spark, sf, "documents")).select(
        "source", "doc_id",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return ffd_pack(d, ["source"], "doc_id", "n_tokens", budget=512)


register(QuerySpec(
    "doc_ffd_packing", _ffd, None,
    "first-fit-decreasing training-batch packing per source "
    "(grouped-map applyInPandas; imperative per-pack state, so "
    "rows-only + invariant tests)",
    ("mixing", "imperative", "bench"),
))


# --- curriculum_schedule: phase table for curriculum training -------------
# Orders quality bands best-first into training phases and assigns
# each phase its cumulative token offsets [start_token, end_token) —
# the schedule a curriculum loader consumes. Same banded-cumsum
# discipline as token_budget_selection: the window-ish cumulative sum
# is a broadcast triangle join over the ~5 band rows, never a global
# per-document window; all offsets are exact int64.

def _curriculum(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    # quality_score + token_count share ONE tokenize via the fused
    # struct (functions/text.quality_token_struct), consumed through
    # an exploded one-element struct so the regex chain runs once.
    per_doc = (
        d.select(
            "doc_id",
            F.explode(F.array(X.quality_token_struct(F.col("text")))).alias("qt"),
        )
        .select(
            "doc_id",
            F.round(F.col("qt.score"), 2).alias("band"),
            F.col("qt.n_tokens").cast("long").alias("n_tokens"),
        )
    )
    bands = per_doc.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("phase_tokens"),
    )
    better = bands.select(
        F.col("band").alias("b_band"), F.col("phase_tokens").alias("b_tokens")
    )
    cum = (
        bands.join(F.broadcast(better), F.col("b_band") >= F.col("band"))
        .groupBy("band", "n_docs", "phase_tokens")
        .agg(
            F.sum("b_tokens").alias("end_token"),
            F.count(F.lit(1)).alias("phase"),
        )
    )
    return cum.select(
        F.col("phase").cast("int").alias("phase"),
        "band", "n_docs", "phase_tokens",
        (F.col("end_token") - F.col("phase_tokens")).alias("start_token"),
        "end_token",
    )


_CURRICULUM_SQL = """
WITH {band_ctes},
bands AS (
  SELECT band, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS phase_tokens
  FROM per_doc GROUP BY band
),
cum AS (
  SELECT b.band, b.n_docs, b.phase_tokens,
    CAST(SUM(o.phase_tokens) AS BIGINT) AS end_token,
    COUNT(*) AS phase
  FROM bands b JOIN bands o ON o.band >= b.band
  GROUP BY b.band, b.n_docs, b.phase_tokens
)
SELECT CAST(phase AS INT) AS phase, band, n_docs, phase_tokens,
  end_token - phase_tokens AS start_token, end_token
FROM cum
"""

register(QuerySpec(
    "curriculum_schedule", _curriculum,
    _CURRICULUM_SQL.format(band_ctes=_BAND_CTES.format(toks=_SQL_TOKS, en=_EN)),
    "curriculum phase table: quality bands best-first with exact "
    "cumulative token offsets (triangle cumsum over band rows)",
    ("mixing", "curriculum"),
))


# --- epoch_mixture_plan: per-source epoch counts to hit a budget ----------
# Given a per-source uniform token target, how many epochs (full
# passes) of each source are needed, and how much over-sampling does
# the last partial epoch imply? Pure integer ceil-division on exact
# token counts — the planning arithmetic behind "repeat small
# high-quality sources, subsample big ones".

_EPOCH_BUDGET = 1_000_000


def _epoch_plan(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(X.token_count(F.col("text")).cast("long")).alias("tokens"),
    )
    k = src.agg(F.count(F.lit(1)).alias("k"))
    return (
        src.crossJoin(F.broadcast(k))
        .select(
            "source", "n_docs", "tokens",
            F.expr(f"{_EPOCH_BUDGET} div k").alias("target_tokens"),
            F.expr(
                f"CASE WHEN tokens > 0 THEN (({_EPOCH_BUDGET} div k) + tokens - 1) div tokens "
                "ELSE 0 END"
            ).alias("n_epochs"),
        )
        .withColumn("planned_tokens", F.expr("n_epochs * tokens"))
        .withColumn(
            "oversample",
            ratio6("planned_tokens", "NULLIF(target_tokens, 0)"),
        )
    )


_EPOCH_SQL = f"""
WITH tok AS (SELECT source, {_SQL_TOKS} AS toks FROM documents),
src AS (
  SELECT source, COUNT(*) AS n_docs,
    CAST(SUM(CAST(len(toks) AS BIGINT)) AS BIGINT) AS tokens
  FROM tok GROUP BY source
),
k AS (SELECT COUNT(*) AS k FROM src)
SELECT source, n_docs, tokens,
  {_EPOCH_BUDGET} // k AS target_tokens,
  CASE WHEN tokens > 0 THEN (({_EPOCH_BUDGET} // k) + tokens - 1) // tokens
       ELSE 0 END AS n_epochs,
  (CASE WHEN tokens > 0 THEN (({_EPOCH_BUDGET} // k) + tokens - 1) // tokens
        ELSE 0 END) * tokens AS planned_tokens,
  {ratio6_sql("(CASE WHEN tokens > 0 THEN (({b} // k) + tokens - 1) // tokens ELSE 0 END) * tokens".format(b=_EPOCH_BUDGET), "NULLIF({b} // k, 0)".format(b=_EPOCH_BUDGET))} AS oversample
FROM src, k
"""

register(QuerySpec(
    "epoch_mixture_plan", _epoch_plan, _EPOCH_SQL,
    "per-source epoch counts + oversampling factors to hit a uniform "
    "token target (exact integer ceil-division planning)",
    ("mixing", "planning"),
))


# --- corpus_shuffle_plan: deterministic distributed global shuffle --------
# Training export needs the corpus in pseudo-random order, but a
# global row_number is a single-partition window — the anti-pattern.
# The scalable shuffle: LCG-hash each doc, route it to one of
# _SHUF_BUCKETS writer buckets (hash mod), and rank only WITHIN the
# bucket (bounded windows). Readers stream buckets in index order and
# rows within a bucket in rank order: the concatenation is a fixed
# pseudo-random permutation, reproducible on any cluster size, with
# per-bucket parallel writes. The query emits the plan (bucket,
# bucket_rank) per doc — all exact-integer arithmetic.

_SHUF_BUCKETS = 16


def _shuffle_plan(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf, "documents").select("doc_id")
    key = (F.col("doc_id") * _LCG_A + _LCG_C) % _LCG_M
    w = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    return (
        d.withColumn("shuffle_key", key)
        .withColumn("bucket", (F.col("shuffle_key") % _SHUF_BUCKETS).cast("int"))
        .withColumn("bucket_rank", F.row_number().over(w).cast("long"))
        .select("doc_id", "shuffle_key", "bucket", "bucket_rank")
    )


_SHUFFLE_SQL = f"""
SELECT doc_id, shuffle_key, bucket,
  CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY shuffle_key, doc_id) AS BIGINT) AS bucket_rank
FROM (
  SELECT doc_id,
    (doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M} AS shuffle_key,
    CAST(((doc_id * {_LCG_A} + {_LCG_C}) % {_LCG_M}) % {_SHUF_BUCKETS} AS INT) AS bucket
  FROM documents
)
"""

register(QuerySpec(
    "corpus_shuffle_plan", _shuffle_plan, _SHUFFLE_SQL,
    "deterministic distributed global shuffle for training export: LCG "
    "key -> bucket routing + bounded within-bucket ranks (no "
    "single-partition window)",
    ("mixing", "window", "bench"),
))


# --- ffd_packing_invariants: external gate over the FFD packer ------------
# VERDICT r5 #2b: FFD's mutable per-pack state keeps doc_ffd_packing
# rows-only, but the packing's CORRECTNESS CONTRACT is SQL-statable:
# token conservation and doc conservation (n_docs/total_tokens must
# equal the base corpus — checked by VALUE against the oracle's
# independent recount), per-pack fill bookkeeping, the capacity bound
# (fill <= budget except single-item oversized packs), the bin-count
# bounds ceil(T/B) <= n_packs <= n_docs, and the first-fit classic
# "at most one pack at most half full". The booleans are computed
# over the real FFD output and must all hash as TRUE — any packer
# regression (lost doc, fill drift, capacity overflow, degenerate
# one-doc-per-pack packing) flips one and fails the external gate.

_FFD_BUDGET = 512


def _ffd_invariants(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.packing import ffd_pack

    d = fan_out(load_table(spark, sf, "documents")).select(
        "source", "doc_id",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    packed = ffd_pack(d, ["source"], "doc_id", "n_tokens", budget=_FFD_BUDGET)
    packs = packed.groupBy("source", "pack_id").agg(
        F.max("pack_fill").alias("fill"),
        F.min("pack_fill").alias("fill_min"),
        F.count(F.lit(1)).alias("n_items"),
        F.max("n_tokens").alias("max_tok"),
        F.sum("n_tokens").alias("sum_tok"),
    )
    b = F.lit(_FFD_BUDGET)
    oversized_pack = (F.col("n_items") == 1) & (F.col("max_tok") > b)
    return packs.groupBy("source").agg(
        F.sum("n_items").cast("long").alias("n_docs"),
        F.sum("sum_tok").cast("long").alias("total_tokens"),
        # every row of a pack carries the same final fill, equal to
        # the sum of its items' tokens
        F.min((F.col("fill") == F.col("fill_min"))
              & (F.col("fill") == F.col("sum_tok"))).alias("fills_consistent"),
        F.min((F.col("fill") <= b) | oversized_pack).alias("fill_ok"),
        ((F.count(F.lit(1)) * b >= F.sum("sum_tok"))
         | (F.max(F.col("max_tok") > b))).alias("pack_lb_ok"),
        (F.count(F.lit(1)) <= F.sum("n_items")).alias("pack_ub_ok"),
        (F.sum((F.col("fill") * 2 <= b).cast("long")) <= 1).alias("one_light_ok"),
    )


_FFD_INV_SQL = f"""
WITH tok AS (
  SELECT source, CAST(len({{toks}}) AS BIGINT) AS n_tokens FROM documents
)
SELECT source,
  CAST(count(*) AS BIGINT)      AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  TRUE AS fills_consistent,
  TRUE AS fill_ok,
  TRUE AS pack_lb_ok,
  TRUE AS pack_ub_ok,
  TRUE AS one_light_ok
FROM tok GROUP BY source
"""

register(QuerySpec(
    "ffd_packing_invariants", _ffd_invariants,
    _FFD_INV_SQL.format(toks=_SQL_TOKS),
    "conservation + capacity + bin-count-bound + one-light-pack "
    "invariants over the real FFD packer output, hash-checked against "
    "an independent corpus recount — the external value gate for "
    "doc_ffd_packing",
    ("mixing", "imperative", "agg"),
))


# --- padding_waste_audit: batching-strategy cost model --------------------
# The batch-construction decision metric: how many pad tokens does
# each batching strategy burn per source? Padding to the source max
# (naive dynamic batching over an unsorted stream) is compared with
# padding to 64-token length buckets (length-grouped batching, the
# standard efficient-padding trick) — the measured savings is the
# argument for sorting-by-length before batch assembly. Pure integer
# arithmetic per doc, one groupBy; the window-free shape scales as a
# single shuffle at any corpus size.

_PAD_BUCKET = 64


def _padding_waste(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents")).select(
        "source",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    ).withColumn(
        "band_ceil",
        F.expr(f"((n_tokens + {_PAD_BUCKET} - 1) div {_PAD_BUCKET}) * {_PAD_BUCKET}"),
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.sum(F.col("band_ceil") - F.col("n_tokens")).cast("long")
        .alias("waste_bucketed"),
    )
    return g.select(
        "source", "n_docs", "total_tokens", "max_tokens",
        (F.col("n_docs") * F.col("max_tokens") - F.col("total_tokens"))
        .cast("long").alias("waste_to_max"),
        "waste_bucketed",
        ratio6("waste_bucketed",
               "n_docs * max_tokens - total_tokens + 1").alias("waste_ratio"),
    )


_PAD_WASTE_SQL = f"""
WITH tok AS (
  SELECT source, CAST(len({{toks}}) AS BIGINT) AS n_tokens,
    ((CAST(len({{toks}}) AS BIGINT) + {_PAD_BUCKET} - 1) // {_PAD_BUCKET})
      * {_PAD_BUCKET} AS band_ceil
  FROM documents
),
g AS (
  SELECT source,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
    CAST(max(n_tokens) AS BIGINT) AS max_tokens,
    CAST(sum(band_ceil - n_tokens) AS BIGINT) AS waste_bucketed
  FROM tok GROUP BY source
)
SELECT source, n_docs, total_tokens, max_tokens,
  CAST(n_docs * max_tokens - total_tokens AS BIGINT) AS waste_to_max,
  waste_bucketed,
  {ratio6_sql("waste_bucketed", "n_docs * max_tokens - total_tokens + 1")}
    AS waste_ratio
FROM g
"""

register(QuerySpec(
    "padding_waste_audit", _padding_waste,
    _PAD_WASTE_SQL.format(toks=_SQL_TOKS),
    "pad-token waste of naive pad-to-max vs 64-token length-bucketed "
    "batching per source — the length-grouped-batching savings "
    "measurement (exact integers, +1-damped ratio)",
    ("mixing", "agg"),
))


# --- token_systematic_sample: weight-proportional corpus sampling ---------
# Weighted sampling without floats: a systematic (fixed-stride) pass
# over the per-source cumulative token axis selects every document
# whose token interval [cum - n, cum) covers a multiple of the
# stride — inclusion count = cum div S - (cum - n) div S, so a doc's
# selection probability is exactly proportional to its token weight
# and a doc longer than the stride is picked multiple times
# (classic PPS systematic sampling). Pure integer arithmetic ->
# bit-identical on both engines, unlike u^(1/w) exponential-key
# (A-ES) sampling whose pow/ln differ across engines. The cumsum
# window is per-source, same scale shape as doc_sequence_packing.

_SAMPLE_STRIDE = 256


def _systematic_sample(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents")).select(
        "source", "doc_id",
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = _SAMPLE_STRIDE
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "n_picks",
            F.expr(f"cum_tokens div {s} - (cum_tokens - n_tokens) div {s}"),
        )
        .filter(F.col("n_picks") > 0)
        .select("source", "doc_id", "n_tokens",
                F.col("cum_tokens").cast("long").alias("cum_tokens"),
                F.col("n_picks").cast("long").alias("n_picks"))
    )


_SYS_SAMPLE_SQL = f"""
WITH tok AS (
  SELECT source, doc_id, CAST(len({{toks}}) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT source, doc_id, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM tok
)
SELECT source, doc_id, n_tokens,
  CAST(cum_tokens AS BIGINT) AS cum_tokens,
  CAST(cum_tokens // {_SAMPLE_STRIDE}
       - (cum_tokens - n_tokens) // {_SAMPLE_STRIDE} AS BIGINT) AS n_picks
FROM cum
WHERE cum_tokens // {_SAMPLE_STRIDE}
      - (cum_tokens - n_tokens) // {_SAMPLE_STRIDE} > 0
"""

register(QuerySpec(
    "token_systematic_sample", _systematic_sample,
    _SYS_SAMPLE_SQL.format(toks=_SQL_TOKS),
    "token-weight-proportional systematic sampling per source "
    "(fixed-stride pass over the cumulative token axis; exact "
    "integers, no cross-engine pow/ln)",
    ("mixing", "sampling", "window"),
))


# --- grouped_kfold_assignment: leakage-free cross-validation folds ---------
# GroupKFold for event data: every event of a user lands in the fold
# of its USER (fold = affine-hash(user_id) mod 5), so no user's
# behavior leaks across the train/validation boundary — the split a
# sequence-model evaluation needs (splitting raw events leaks). The
# fold function is the pure-int64 affine family (engine-identical),
# and the audit reports per-fold user/event counts and shares — the
# balance check before trusting the fold variance. One aggregation
# at (fold, user) grain, one at fold grain.

_KF_A, _KF_B, _KF_P, _KF_K = 2_654_435_761, 40_503, 2_147_483_647, 5
_KF_EXPR = f"((({_KF_A} * CAST(user_id AS BIGINT) + {_KF_B}) % {_KF_P}) % {_KF_K})"


def _kfold(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_user = (
        ev.select(F.expr(_KF_EXPR).alias("fold"), "user_id")
        .groupBy("fold", "user_id")
        .agg(F.count(F.lit(1)).alias("n_ev"))
    )
    per_fold = per_user.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_ev").cast("long").alias("n_events"),
    )
    tot = per_fold.agg(
        F.sum("n_users").cast("long").alias("tu"),
        F.sum("n_events").cast("long").alias("te"),
    )
    return (
        per_fold.crossJoin(F.broadcast(tot))
        .select(
            "fold", "n_users", "n_events",
            ratio6("n_users", "tu").alias("user_share"),
            ratio6("n_events", "te").alias("event_share"),
        )
        .orderBy("fold")
    )


_KFOLD_SQL = f"""
WITH per_user AS (
  SELECT {_KF_EXPR} AS fold, user_id, COUNT(*) AS n_ev
  FROM events GROUP BY 1, 2
),
per_fold AS (
  SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_users,
    CAST(SUM(n_ev) AS BIGINT) AS n_events
  FROM per_user GROUP BY fold
),
tot AS (
  SELECT CAST(SUM(n_users) AS BIGINT) AS tu,
    CAST(SUM(n_events) AS BIGINT) AS te
  FROM per_fold
)
SELECT fold, n_users, n_events,
  {ratio6_sql("n_users", "tu")} AS user_share,
  {ratio6_sql("n_events", "te")} AS event_share
FROM per_fold CROSS JOIN tot
ORDER BY fold
"""

register(QuerySpec(
    "grouped_kfold_assignment", _kfold, _KFOLD_SQL,
    "GroupKFold split audit: every user's events land in one fold "
    "(affine int64 hash mod 5, zero leakage by construction), "
    "per-fold user/event counts and balance shares",
    ("mixing", "ml", "agg"),
))


# --- dsir_importance_proxy: domain importance weighting (round-9) ----------
# The DSIR recipe (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling") made engine-exact: fit a target
# unigram LM on a domain slice (lang='fr') and a raw LM on the whole
# corpus, score each document by the summed log importance ratio
# log(p_target(f)/p_raw(f)) over its features, and select the raw
# documents that look most like the target. Per the paper the
# features are N-GRAMS (bigrams here — unigram ratios on this
# shared-vocabulary corpus are fractions of a bit and the floored
# proxy collapses to zero; measured before shipping). Logs are the
# engine-fragile part, so the per-feature weight is the FLOORED-BIT
# proxy length(bin(ct'*Nr')) - length(bin(cr'*Nt')) — an integer
# within 1 bit of log2 of the Laplace-smoothed ratio (ct'=ct+1,
# cr'=cr+1, N'=N+V), monotone enough for selection and EXACT on both
# engines (the doc_unigram_surprisal bin() trick applied to a ratio
# of two distributions; bounds: ct'*Nr' <= ~2.5e15 at sf10, int64).
# Output is the per-language selection census: the fr slice must
# dominate (at sf0.01: 55/64 fr docs selected vs <= 8 per other
# language — the separation the hash pins), and n_docs_selected is
# the importance-resampling acceptance count at threshold 0.
#
# Scale shape: two vocabulary-grain count aggregations (map-side
# combinable), one broadcast-sized LM table joined back to the token
# stream, one doc-grain and one lang-grain aggregation — the exact
# shape of doc_unigram_surprisal, linear in the corpus.

_DSIR_TARGET_LANG = "fr"


def _dsir_importance(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    toks = d.select(
        "doc_id", "lang",
        F.explode(X.bigram_zip(F.col("text"))).alias("p"),
    ).select(
        "doc_id", "lang",
        F.concat_ws(" ", F.col("p.0"), F.col("p.1")).alias("tok"),
    )
    lm = (
        toks.groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum((F.col("lang") == _DSIR_TARGET_LANG).cast("long"))
            .alias("ct"),
        )
    )
    totals = lm.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cr").cast("long").alias("nr"),
        F.sum("ct").cast("long").alias("nt"),
    )
    scored_tok = (
        lm.crossJoin(F.broadcast(totals))
        .select(
            "tok",
            (
                F.length(F.bin((F.col("ct") + 1) * (F.col("nr") + F.col("v"))))
                - F.length(F.bin((F.col("cr") + 1) * (F.col("nt") + F.col("v"))))
            ).cast("long").alias("sbits"),
        )
    )
    per_doc = (
        toks.join(F.broadcast(scored_tok), "tok")
        .groupBy("doc_id", "lang")
        .agg(F.sum("sbits").cast("long").alias("score_bits"))
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("score_bits").cast("long").alias("sum_score_bits"),
        F.sum((F.col("score_bits") > 0).cast("long")).cast("long")
        .alias("n_docs_selected"),
        F.max("score_bits").cast("long").alias("max_score_bits"),
    )


_DSIR_SQL = f"""
WITH tok0 AS (SELECT doc_id, lang, {{toks}} AS toks FROM documents),
toks AS MATERIALIZED (
  SELECT doc_id, lang, p[1] || ' ' || p[2] AS tok
  FROM (
    SELECT doc_id, lang,
      unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS p
    FROM tok0 WHERE len(toks) >= 2
  )
),
lm AS MATERIALIZED (
  SELECT tok, COUNT(*) AS cr,
    SUM(CASE WHEN lang = '{_DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS ct
  FROM toks GROUP BY 1
),
totals AS (
  SELECT COUNT(*) AS v, SUM(cr) AS nr, SUM(ct) AS nt FROM lm
),
scored_tok AS (
  SELECT tok,
    CAST(length(bin((ct + 1) * (SELECT nr + v FROM totals)))
       - length(bin((cr + 1) * (SELECT nt + v FROM totals))) AS BIGINT)
      AS sbits
  FROM lm
),
per_doc AS (
  SELECT t.doc_id, t.lang, CAST(SUM(s.sbits) AS BIGINT) AS score_bits
  FROM toks t JOIN scored_tok s USING (tok)
  GROUP BY 1, 2
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(score_bits) AS BIGINT) AS sum_score_bits,
  CAST(SUM(CASE WHEN score_bits > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_docs_selected,
  CAST(MAX(score_bits) AS BIGINT) AS max_score_bits
FROM per_doc GROUP BY 1
"""

register(QuerySpec(
    "dsir_importance_proxy", _dsir_importance,
    _DSIR_SQL.format(toks=_SQL_TOKS),
    "DSIR-style domain importance weighting: Laplace-smoothed "
    "target-vs-raw BIGRAM ratio per feature in floored bits (exact "
    "integer bin() arithmetic, no float log), per-doc importance "
    "sums, per-language selection census at threshold 0",
    ("mixing", "quality", "agg", "join"),
))
