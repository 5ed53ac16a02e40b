"""Relational operator coverage (SURVEY §2.2-2.6) on the test lake.

TPC-H-shaped queries exercising: pushdown filters, multi-way joins
(broadcast dims), group-agg, window top-k, anti-join, union-distinct,
rollup, conditional counts. Each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.topk import topk_per_group
from ..sources.io import load_table
from .catalog import QuerySpec, register

# 6 decimal places: products of 2-dp money columns are EXACT at <=6 dp,
# so the per-row cast hits a grid point (never a rounding midpoint where
# Spark's HALF_UP and DuckDB's half-even would diverge).
MONEY = "decimal(18,6)"


def _m(c):
    """Per-row decimal cast => order-independent exact aggregation."""
    return c.cast(MONEY)


# --- q1_pricing_summary: scan + filter + 8-agg groupBy (TPC-H Q1 shape;
# the reference's global-aggregate reporting pattern, SURVEY A3). ----------

def _q1(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    disc_price = _m(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = _m(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_m(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_m(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_m(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_m(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_m(F.col("l_discount"))).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS {MONEY})) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS {MONEY})) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS {MONEY})) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS {MONEY})) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

register(QuerySpec(
    "q1_pricing_summary", _q1, _Q1_SQL,
    "TPC-H Q1 shape: pushdown filter + grouped multi-aggregate",
    ("relational", "agg", "bench"),
))


# --- q3_top_unshipped: 3-way join + group + global top-k ------------------

def _q3(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    revenue = _m(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .withColumn("o_orderdate", F.to_date("o_orderdate"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

register(QuerySpec(
    "q3_top_unshipped", _q3, _Q3_SQL,
    "TPC-H Q3 shape: selective joins + broadcast dim + global top-k",
    ("relational", "join", "topk", "bench"),
))


# --- q5_region_revenue: 6-way star join, broadcast small dims -------------

def _q5(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    region = load_table(spark, sf, "region").filter(F.col("r_name") == "AFRICA")
    revenue = _m(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(cust, (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


_Q5_SQL = f"""
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

register(QuerySpec(
    "q5_region_revenue", _q5, _Q5_SQL,
    "TPC-H Q5 shape: multi-way star join with broadcast dims",
    ("relational", "join", "bench"),
))


# --- q6_revenue_delta: pure pushdown filter + scalar aggregate ------------

def _q6(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_m(F.col("l_extendedprice") * F.col("l_discount"))).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q6_SQL = f"""
SELECT
  CAST(SUM(CAST(l_extendedprice * l_discount AS {MONEY})) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""

register(QuerySpec(
    "q6_revenue_delta", _q6, _Q6_SQL,
    "TPC-H Q6 shape: fully-pushed filters + scalar agg (scan-bound)",
    ("relational", "filter", "bench"),
))


# --- customers_without_orders: anti-join (SURVEY J1) ----------------------
# Round-10 de-vacuation (round-9 verdict wrong #2): the synthetic
# generator gives EVERY sf0.01 customer at least one order, so the
# bare "no orders at all" anti-join matched on 0 rows = 0 rows — a
# green that proves nothing about the join logic. The anti-join now
# runs against the URGENT-order subset (customers who never placed a
# 1-URGENT order: 18/203/1986 rows at sf0.001/0.01/0.1), keeping the
# reference's drop-path idiom (deduplicate.py:304-306) while making
# the gate hash carry real values. The filter pushes below the
# anti-join's shuffle on both engines.

def _anti(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    urgent = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    nation = load_table(spark, sf, "nation")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


_ANTI_SQL = """
SELECT n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY n_name
"""

register(QuerySpec(
    "customers_without_orders", _anti, _ANTI_SQL,
    "left_anti join against a filtered order subset (dedup drop-path "
    "idiom, deduplicate.py:304-306) + dim join — customers with no "
    "URGENT order; non-vacuous at every SF",
    ("relational", "join", "anti"),
))


# --- active_nations_union: union + distinct (SURVEY U1) -------------------

def _union(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    supp = load_table(spark, sf, "supplier")
    nation = load_table(spark, sf, "nation")
    keys = (
        cust.select(F.col("c_nationkey").alias("nationkey"))
        .union(supp.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )
    return (
        keys.join(F.broadcast(nation), keys.nationkey == nation.n_nationkey)
        .select("nationkey", "n_name")
    )


_UNION_SQL = """
SELECT nationkey, n_name
FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey AS nationkey FROM supplier
) k JOIN nation ON nationkey = n_nationkey
"""

register(QuerySpec(
    "active_nations_union", _union, _UNION_SQL,
    "union+distinct symmetrization idiom (deduplicate.py:287-300)",
    ("relational", "setop"),
))


# --- top_parts_per_brand: window rank top-k per group (SURVEY W1/W4) ------

def _top_parts(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    rev = (
        li.groupBy("l_partkey")
        .agg(F.sum(_m(F.col("l_extendedprice") * (1 - F.col("l_discount")))).cast("double").alias("revenue"))
    )
    joined = rev.join(part, rev.l_partkey == part.p_partkey)
    return topk_per_group(
        joined, ["p_brand"], [F.desc("revenue"), F.asc("p_partkey")], 3
    ).select("p_brand", "p_partkey", "p_name", "revenue", F.col("rnk").cast("int").alias("rnk"))


_TOP_PARTS_SQL = f"""
WITH rev AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_partkey
)
SELECT p_brand, p_partkey, p_name, revenue, CAST(rnk AS INT) AS rnk FROM (
  SELECT p.p_brand, p.p_partkey, p.p_name, rev.revenue,
    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS rnk
  FROM rev JOIN part p ON rev.l_partkey = p.p_partkey
) WHERE rnk <= 3
"""

register(QuerySpec(
    "top_parts_per_brand", _top_parts, _TOP_PARTS_SQL,
    "window row_number top-k per group (keep-best rule W1 / top-10 dashboards W4)",
    ("relational", "window", "topk", "bench"),
))


# --- order_priority_mix: conditional counts (SURVEY A5) -------------------

def _priority_mix(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.when(F.col("o_totalprice") > 100000, 1)).alias("n_large"),
            F.sum(_m(F.col("o_totalprice"))).cast("double").alias("total_value"),
        )
    )


_PRIORITY_SQL = f"""
SELECT o_orderpriority,
  COUNT(*) AS n_orders,
  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
  COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_large,
  CAST(SUM(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS total_value
FROM orders GROUP BY o_orderpriority
"""

register(QuerySpec(
    "order_priority_mix", _priority_mix, _PRIORITY_SQL,
    "conditional counts count(when(...)) (extract_salary.py:407 idiom)",
    ("relational", "agg"),
))


# --- part_size_rollup: hierarchical rollup (dashboard-style subtotal) -----

def _rollup(spark: SparkSession, sf: str) -> DataFrame:
    part = load_table(spark, sf, "part")
    return (
        part.rollup("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(_m(F.col("p_retailprice"))).cast("double").alias("total_price"),
        )
        .select(
            F.coalesce(F.col("p_brand"), F.lit("ALL")).alias("brand"),
            F.coalesce(F.col("p_type"), F.lit("ALL")).alias("ptype"),
            "n_parts", "total_price",
        )
    )


_ROLLUP_SQL = f"""
SELECT COALESCE(p_brand, 'ALL') AS brand, COALESCE(p_type, 'ALL') AS ptype,
  COUNT(*) AS n_parts,
  CAST(SUM(CAST(p_retailprice AS {MONEY})) AS DOUBLE) AS total_price
FROM part GROUP BY ROLLUP (p_brand, p_type)
"""

register(QuerySpec(
    "part_size_rollup", _rollup, _ROLLUP_SQL,
    "ROLLUP grouping-sets aggregate (dashboard subtotals)",
    ("relational", "agg", "rollup"),
))
