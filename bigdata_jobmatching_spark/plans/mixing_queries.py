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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources.io import fan_out, load_table
from .catalog import QuerySpec, register
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
    per_doc = d.select(
        "doc_id",
        F.round(X.quality_score(F.col("text")), 2).alias("band"),
        X.token_count(F.col("text")).cast("long").alias("n_tokens"),
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


_BUDGET_SQL = f"""
WITH tok AS (SELECT doc_id, text, {{toks}} AS toks FROM documents),
sig AS (
  SELECT doc_id, len(toks) AS n_tok,
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
per_doc AS (
  SELECT doc_id,
    round(((CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN swr >= 0.05 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.0 END)) / 4.0, 2) AS band,
    CAST(n_tok AS BIGINT) AS n_tokens
  FROM sig
),
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
    _BUDGET_SQL.format(toks=_SQL_TOKS, en=_EN),
    "greedy quality-band fill to a token budget — banded cumsum "
    "(~100 rows) + broadcast cutoff join, never a global per-doc window",
    ("mixing", "bench"),
))


# --- source_mixing_weights: per-source sampling weights -------------------
# Uniform and sqrt-smoothed (the standard down-weighting of huge
# sources in pretraining mixes) — one tiny groupBy + broadcast scalar.

def _weights(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    src = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(X.token_count(F.col("text")).cast("long")).alias("tokens"),
    )
    tot = src.agg(
        F.sum(F.sqrt(F.col("tokens"))).alias("sum_sqrt"),
        F.count(F.lit(1)).alias("k"),
    )
    return (
        src.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "tokens",
            F.round(F.lit(1.0) / F.col("k"), 6).alias("weight_uniform"),
            F.round(F.sqrt(F.col("tokens")) / F.col("sum_sqrt"), 6).alias("weight_sqrt"),
        )
    )


_WEIGHTS_SQL = """
WITH tok AS (SELECT source, {toks} AS toks FROM documents),
src AS (
  SELECT source, count(*) AS n_docs,
    sum(CAST(len(toks) AS BIGINT)) AS tokens
  FROM tok GROUP BY source
),
tot AS (SELECT sum(sqrt(CAST(tokens AS DOUBLE))) AS sum_sqrt, count(*) AS k FROM src)
SELECT source, n_docs, tokens,
  round(CAST(1.0 AS DOUBLE) / k, 6) AS weight_uniform,
  round(sqrt(CAST(tokens AS DOUBLE)) / sum_sqrt, 6) AS weight_sqrt
FROM src, tot
"""


register(QuerySpec(
    "source_mixing_weights", _weights,
    _WEIGHTS_SQL.format(toks=_SQL_TOKS),
    "per-source mixing weights (uniform + sqrt-smoothed) for a "
    "pretraining data mix",
    ("mixing",),
))
