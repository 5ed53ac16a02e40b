"""Extended relational coverage: the canonical plan shapes not yet in
relational.py — semi-join EXISTS, outer-join count distributions,
conditional-sum ratios, distinct-count + NOT-IN, scalar subqueries,
pivot/unpivot. Each exercises a distinct Catalyst pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table
from .catalog import QuerySpec, register

MONEY = "decimal(18,6)"


# --- order_priority_check: semi-join EXISTS (TPC-H Q4 shape) --------------

def _q4(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    late = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1996-07-01")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1996-07-01')
GROUP BY o_orderpriority
"""

register(QuerySpec(
    "order_priority_check", _q4, _Q4_SQL,
    "left_semi EXISTS join + grouped count (TPC-H Q4 shape)",
    ("relational", "join", "semi"),
))


# --- customer_order_distribution: outer join + two-level agg (Q13) --------

def _q13(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


_Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority != '5-LOW'
  GROUP BY c_custkey
) GROUP BY c_count
"""

register(QuerySpec(
    "customer_order_distribution", _q13, _Q13_SQL,
    "left outer join + count + distribution-of-counts (TPC-H Q13 shape)",
    ("relational", "join", "agg"),
))


# --- promo_revenue_share: conditional-sum ratio (Q14) ---------------------

def _q14(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    part = load_table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(F.lit(0.0)).cast(MONEY)).cast("double")
            / F.sum(rev.cast(MONEY)).cast("double") * 100.0
        ).alias("promo_share_pct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_Q14_SQL = f"""
SELECT
  CAST(SUM(CAST(CASE WHEN p_type LIKE 'STANDARD%' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS {MONEY})) AS DOUBLE)
    / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE) * 100.0 AS promo_share_pct,
  COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-02-01'
"""

register(QuerySpec(
    "promo_revenue_share", _q14, _Q14_SQL,
    "conditional-sum ratio over a join (TPC-H Q14 shape)",
    ("relational", "agg", "join"),
))


# --- parts_supplier_diversity: distinct-count + NOT IN anti (Q16) ---------

def _q16(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    bad_supp = load_table(spark, sf, "supplier").filter(
        F.col("s_name").contains("3")
    ).select("s_suppkey")
    ps = li.select("l_partkey", "l_suppkey").dropDuplicates()
    ps = ps.join(bad_supp, ps.l_suppkey == bad_supp.s_suppkey, "left_anti")
    joined = ps.join(part, ps.l_partkey == part.p_partkey).filter(
        F.col("p_size").isin(1, 4, 7)
    )
    return (
        joined.groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_SQL = """
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 4, 7)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%3%')
GROUP BY p_brand, p_size
"""

register(QuerySpec(
    "parts_supplier_diversity", _q16, _Q16_SQL,
    "distinct pairs + NOT-IN anti-join + countDistinct (TPC-H Q16 shape)",
    ("relational", "join", "anti", "agg"),
))


# --- big_spenders: scalar-subquery threshold + semi join (Q22-lite) -------

def _q22(spark: SparkSession, sf: str) -> DataFrame:
    # The threshold stays a broadcast 1-row DataFrame (crossJoin +
    # broadcast) instead of a driver-side collect(): one job, no
    # synchronous barrier, and the whole query remains a single plan.
    cust = load_table(spark, sf, "customer")
    threshold = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(MONEY)).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = load_table(spark, sf, "orders").filter(F.col("o_orderdate") >= "2000-01-01")
    rich = cust.crossJoin(F.broadcast(threshold)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return no_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(MONEY)).cast("double").alias("total_bal"),
    )


_Q22_SQL = f"""
WITH threshold AS (
  SELECT CAST(SUM(CAST(c_acctbal AS {MONEY})) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS {MONEY})) AS DOUBLE) AS total_bal
FROM customer, threshold
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""

register(QuerySpec(
    "big_spenders_no_orders", _q22, _Q22_SQL,
    "scalar-subquery threshold + anti join (TPC-H Q22 shape)",
    ("relational", "join", "anti", "subquery"),
))


# --- small_quantity_revenue: correlated-avg subquery (Q17 shape) ----------

def _q17(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_quantity").cast(MONEY)).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(MONEY)).cast("double") / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q17_SQL = f"""
WITH avg_qty AS (
  SELECT l_partkey, CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS {MONEY})) AS DOUBLE) / 7.0 AS avg_yearly,
  COUNT(*) AS n_rows
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN avg_qty USING (l_partkey)
WHERE p_brand = 'Brand#1' AND l_quantity < 0.5 * avg_qty
"""

register(QuerySpec(
    "small_quantity_revenue", _q17, _Q17_SQL,
    "correlated per-group average threshold (TPC-H Q17 shape)",
    ("relational", "join", "subquery"),
))


# --- disjunctive_revenue: complex OR predicate pushdown (Q19 shape) -------

def _q19(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 10)) & (F.col("l_quantity").between(1, 20)))
        | ((F.col("p_brand") == "Brand#11") & (F.col("p_size").between(5, 20)) & (F.col("l_quantity").between(10, 30)))
        | ((F.col("p_brand") == "Brand#21") & (F.col("p_size").between(10, 40)) & (F.col("l_quantity").between(20, 40)))
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY)
    return joined.filter(cond).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_Q19_SQL = f"""
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE) AS revenue,
  COUNT(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#11' AND p_size BETWEEN 5 AND 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#21' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 40)
"""

register(QuerySpec(
    "disjunctive_revenue", _q19, _Q19_SQL,
    "disjunctive multi-attribute predicate over a join (TPC-H Q19 shape)",
    ("relational", "filter", "join"),
))


# --- events_status_pivot: pivot + unpivot roundtrip -----------------------

def _pivot(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    wide = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )
    # unpivot back to long via stack — covers both directions
    stack_expr = ", ".join(f"'{t}', `{t}`" for t in types)
    return wide.selectExpr(
        "day", f"stack({len(types)}, {stack_expr}) AS (event_type, n_events)"
    ).filter(F.col("n_events") > 0)


_PIVOT_SQL = """
SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""

register(QuerySpec(
    "events_status_pivot", _pivot, _PIVOT_SQL,
    "pivot to wide + stack() unpivot back to long (roundtrip equals plain groupBy)",
    ("relational", "pivot"),
))
