"""Data-profiling workload: per-column statistics in ONE pass.

The lake-management capability every 100 TB pipeline needs before it
trusts a table: null counts, exact distinct cardinalities and
min/max per column. The idiomatic distributed shape is explode-to-
(column, value) + one groupBy — a single scan whatever the column
count, instead of N per-column passes. Values are canonicalized to
engine-identical strings first (integers verbatim, doubles as
half-up cents, timestamps via CAST — second-grain ISO on both
engines), so min/max/distinct compare in binary collation
identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table
from .catalog import QuerySpec, register

# (column, engine-identical string canonicalization) — doubles go to
# half-up integer cents (double->decimal casts round differently per
# engine; double->string shortest-repr notations differ too).
_ORDERS_COLS: list[tuple[str, str, str]] = [
    ("o_orderkey", "CAST(o_orderkey AS STRING)", "CAST(o_orderkey AS VARCHAR)"),
    ("o_custkey", "CAST(o_custkey AS STRING)", "CAST(o_custkey AS VARCHAR)"),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
    (
        "o_totalprice",
        "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS STRING)",
        "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)",
    ),
    ("o_orderdate", "CAST(o_orderdate AS STRING)", "CAST(o_orderdate AS VARCHAR)"),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
]


def _orders_profile(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    pairs = F.array(*[
        F.struct(F.lit(name).alias("col_name"), F.expr(spark_expr).alias("v"))
        for name, spark_expr, _ in _ORDERS_COLS
    ])
    return (
        o.select(F.explode(pairs).alias("cv"))
        .select("cv.col_name", "cv.v")
        .groupBy("col_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("n_null"),
            F.countDistinct("v").alias("n_distinct"),
            F.min("v").alias("min_str"),
            F.max("v").alias("max_str"),
        )
    )


_PROFILE_SQL = (
    "WITH cv AS (SELECT unnest(["
    + ", ".join(
        f"{{'col_name': '{name}', 'v': {duck_expr}}}"
        for name, _, duck_expr in _ORDERS_COLS
    )
    + """]) AS u FROM orders)
SELECT u.col_name AS col_name,
  COUNT(*) AS n_rows,
  SUM(CASE WHEN u.v IS NULL THEN 1 ELSE 0 END) AS n_null,
  COUNT(DISTINCT u.v) AS n_distinct,
  MIN(u.v) AS min_str,
  MAX(u.v) AS max_str
FROM cv GROUP BY 1
"""
)

register(QuerySpec(
    "orders_column_profile", _orders_profile, _PROFILE_SQL,
    "single-pass per-column profile of orders (null counts, exact "
    "distincts, canonical-string min/max via explode + one groupBy)",
    ("profiling", "agg", "bench"),
))
