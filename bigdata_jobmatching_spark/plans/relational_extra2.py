"""Third relational batch: join-back-to-aggregate (argmax over groups),
scalar-threshold HAVING, and explicit window frames — the remaining
distinct optimizer shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table
from .catalog import QuerySpec, register

MONEY = "decimal(18,6)"


# --- top_supplier_revenue: aggregate + join back on max (Q15 shape) -------

def _q15(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = load_table(spark, sf, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY))
        .cast("double").alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(max_rev), rev.total_revenue == max_rev.mx)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""

register(QuerySpec(
    "top_supplier_revenue", _q15, _Q15_SQL,
    "aggregate + join back on the max (TPC-H Q15 shape)",
    ("relational", "join", "subquery"),
))


# --- important_stock_shares: HAVING vs global scalar fraction (Q11) -------

def _q11(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    value = (F.col("l_extendedprice") * F.col("l_quantity")).cast(MONEY)
    per_part = li.groupBy("l_partkey").agg(
        F.sum(value).cast("double").alias("part_value")
    )
    total = per_part.agg(F.sum(F.col("part_value").cast(MONEY)).cast("double").alias("tv"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.0005 * F.col("tv"))
        .select("l_partkey", "part_value")
    )


_Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice * l_quantity AS {MONEY})) AS DOUBLE) AS part_value
  FROM lineitem GROUP BY l_partkey
),
total AS (
  SELECT CAST(SUM(CAST(part_value AS {MONEY})) AS DOUBLE) AS tv FROM per_part
)
SELECT l_partkey, part_value FROM per_part, total
WHERE part_value > 0.0005 * tv
"""

register(QuerySpec(
    "important_stock_shares", _q11, _Q11_SQL,
    "group aggregate filtered by a global scalar fraction (TPC-H Q11 shape)",
    ("relational", "agg", "subquery", "bench"),
))


# --- events_running_value: explicit window frames --------------------------

def _running(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w3 = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"), "event_id")
        .rowsBetween(-2, 0)
    )
    return ev.select(
        "user_id", "event_id",
        F.sum(F.col("value").cast(MONEY)).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w3).alias("events_in_last3"),
    )


_RUNNING_SQL = f"""
SELECT user_id, event_id,
  CAST(SUM(CAST(value AS {MONEY})) OVER (
    PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
  COUNT(*) OVER (
    PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS events_in_last3
FROM events WHERE user_id < 20
"""

register(QuerySpec(
    "events_running_value", _running, _RUNNING_SQL,
    "explicit window frames: running decimal sum + sliding 3-row count",
    ("relational", "window", "frame", "bench"),
))
