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


# --- nation_pair_trade_volumes: the TPC-H Q7 shape -------------------------
# Five-way join (lineitem-orders-customer-supplier-nation x2) with a
# DISJUNCTIVE nation-pair filter and year extraction; volume uses the
# exact-decimal discipline. Scale shape: both nation dims broadcast,
# the order/customer joins shuffle on their keys, AQE sizes the rest.

def _q7(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    pair = (
        ((F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2"))
        | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .filter(pair)
        .filter(F.year("l_shipdate").between(1996, 1998))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol).cast("double").alias("volume"))
    )


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS volume
FROM (
  SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
    EXTRACT(year FROM l_shipdate) AS l_year,
    l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND EXTRACT(year FROM l_shipdate) BETWEEN 1996 AND 1998
)
GROUP BY 1, 2, 3
"""

register(QuerySpec(
    "nation_pair_trade_volumes", _q7, _Q7_SQL,
    "disjunctive nation-pair five-way join with yearly exact-decimal "
    "volumes (TPC-H Q7 shape)",
    ("relational", "join", "agg"),
))
