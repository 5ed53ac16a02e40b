"""Fourth relational batch: the remaining classic TPC-H optimizer
shapes expressible over the available columns — Q8 (ratio of sums by
group through a 6-way star join), Q9 (multi-fact profit rollup), Q10
(group-aggregate + dim join + deterministic top-k), and Q21 (double
correlated existence, rewritten as a scalable two-level aggregate and
value-proven against a literal EXISTS/NOT-EXISTS oracle).

Q12 and the verbatim Q9/Q21 need l_commitdate / l_receiptdate /
l_shipmode, which the test tables do not carry; those variants keep
the same plan shapes on the columns that exist. Q2/Q20 get the full
shape via a deterministically SYNTHESIZED partsupp (closed-form key
arithmetic mirrored in the oracle, so values are still hash-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table
from .catalog import QuerySpec, register

MONEY = "decimal(18,6)"


# --- nation_market_share: TPC-H Q8 shape ----------------------------------
# Ratio-of-conditional-sum per year: among PROMO parts bought by ASIA
# customers, the share supplied by NATION_7. Scale shape: part is the
# selective filter and joins first (row reduction before the wide
# joins); nation/region dims broadcast; the share is a single IEEE
# division of two exact decimal sums (cast to double), so it is
# order-independent and engine-identical.

def _q8(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    asia = r.filter(F.col("r_name") == "ASIA").select(F.col("r_regionkey").alias("rk"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY)
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(asia), F.col("c_rk") == F.col("rk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", vol).otherwise(
                F.lit(0).cast(MONEY))).alias("_num"),
            F.sum(vol).alias("_den"),
        )
        .select(
            "o_year",
            (F.col("_num").cast("double") / F.col("_den").cast("double"))
            .alias("mkt_share"),
        )
    )


_Q8_SQL = f"""
SELECT o_year,
  CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol ELSE CAST(0 AS {MONEY}) END) AS DOUBLE)
    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year, n2.n_name AS supp_nation,
    CAST(l_extendedprice * (1 - l_discount) AS {MONEY}) AS vol
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
)
GROUP BY o_year
"""

register(QuerySpec(
    "nation_market_share", _q8, _Q8_SQL,
    "yearly supplier-nation market share among a part type in a "
    "customer region (TPC-H Q8 shape: ratio of conditional decimal sums)",
    ("relational", "join", "agg", "bench"),
))


# --- product_profit_by_nation: TPC-H Q9 shape -----------------------------
# Profit rollup by supplier nation x order year over widget parts;
# cost proxied by p_retailprice * l_quantity (no partsupp table).
# Each term is cast to exact DECIMAL per row before the subtraction
# and sum, so the grouped total is order-free. Scale shape: the part
# filter prunes the fact rows first; supplier/nation broadcast; one
# shuffle for the final two-key agg.

def _q9(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    p = load_table(spark, sf, "part").filter(F.col("p_name").contains("widget"))
    amount = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY)
        - (F.col("p_retailprice") * F.col("l_quantity")).cast(MONEY)
    )
    j = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"),
                  F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


_Q9_SQL = f"""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})
         - CAST(p_retailprice * l_quantity AS {MONEY})) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""

register(QuerySpec(
    "product_profit_by_nation", _q9, _Q9_SQL,
    "profit rollup by supplier nation and year over name-matched parts "
    "(TPC-H Q9 shape; retailprice-based cost, no partsupp table)",
    ("relational", "join", "agg"),
))


# --- returned_revenue_topk: TPC-H Q10 shape -------------------------------
# Customers ranked by revenue on returned items in one quarter.
# Deterministic top-k: ties broken by the unique c_custkey. Scale
# shape: the fact agg happens at custkey grain BEFORE the customer dim
# join, so the dim join input is already small; nation broadcasts.

def _q10(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    rev = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast(MONEY)).cast("double").alias("revenue"))
    )
    return (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q10_SQL = f"""
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE) AS revenue,
  c_acctbal
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

register(QuerySpec(
    "returned_revenue_topk", _q10, _Q10_SQL,
    "top-20 customers by returned-item revenue in a quarter (TPC-H Q10 "
    "shape; unique-key tie-break)",
    ("relational", "join", "topk", "bench"),
))


# --- last_shippers_by_supplier: TPC-H Q21 shape ---------------------------
# "Suppliers who kept multi-supplier orders waiting": supplier S
# qualifies for order O iff another supplier participated in O (EXISTS)
# and no other supplier shipped a line of O later than S's latest line
# (NOT EXISTS). The Spark side uses the scalable rewrite — a
# map-side-combinable aggregate at (order, supplier) grain, then an
# order-partitioned window for the order max / supplier count —
# instead of two correlated self-joins over the fact table; the oracle
# keeps the literal EXISTS / NOT EXISTS form, so the gate proves the
# rewrite's equivalence. At 100 TB the rewrite scans lineitem ONCE
# (verified: a join formulation planned two scans), and the window
# runs over the already-reduced per-(order, supplier) rows.

def _q21(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    s = load_table(spark, sf, "supplier")
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("s_max"))
    w = Window.partitionBy("l_orderkey")
    waiting = (
        per_os
        .withColumn("o_max", F.max("s_max").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .filter((F.col("n_supp") > 1) & (F.col("s_max") == F.col("o_max")))
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  WHERE EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > l1.l_shipdate)
) w
JOIN supplier ON w.l_suppkey = s_suppkey
GROUP BY s_name
"""

register(QuerySpec(
    "last_shippers_by_supplier", _q21, _Q21_SQL,
    "suppliers whose latest line closed multi-supplier orders (TPC-H "
    "Q21 shape: double correlated existence, aggregate rewrite proven "
    "against a literal EXISTS/NOT-EXISTS oracle)",
    ("relational", "join", "subquery", "bench"),
))


# --- synthesized partsupp: the missing TPC-H table ------------------------
# The test lake carries no partsupp, so Q2/Q20 were inexpressible.
# Their distinctive optimizer shapes (correlated MIN subquery;
# semi-join on a computed threshold) matter more than the literal
# rows, so partsupp is SYNTHESIZED deterministically from part x
# supplier key arithmetic — identical closed-form on the Spark side
# and in the oracle SQL, so every value is still hash-verified.
# ~4 suppliers per part: s = (p*7 + i*13 + 1) mod NS, i in 0..3
# (deduped); cost/avail are planted integer formulas.

_PS_FANOUT = 4


def _synth_partsupp(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").select("p_partkey")
    ns = load_table(spark, sf, "supplier").agg(
        F.count(F.lit(1)).alias("ns"))
    return (
        p.crossJoin(F.broadcast(ns))
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(_PS_FANOUT)])).alias("i"),
            "ns",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 7 + F.col("i") * 13 + 1) % F.col("ns"))
            .alias("ps_suppkey"),
        )
        .distinct()
        .select(
            "ps_partkey", "ps_suppkey",
            ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 1000000 + 1)
            .alias("ps_supplycost_cents"),
            ((F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 5) % 10000 + 1)
            .alias("ps_availqty"),
        )
    )


_PS_SQL = f"""
ps AS (
  SELECT ps_partkey, ps_suppkey,
    (ps_partkey * 31 + ps_suppkey * 17) % 1000000 + 1 AS ps_supplycost_cents,
    (ps_partkey * 13 + ps_suppkey * 5) % 10000 + 1 AS ps_availqty
  FROM (
    SELECT DISTINCT p_partkey AS ps_partkey,
      (p_partkey * 7 + i * 13 + 1) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey
    FROM part, UNNEST([{", ".join(str(i) for i in range(_PS_FANOUT))}]) AS t(i)
  )
)"""


# --- min_cost_suppliers: TPC-H Q2 shape -----------------------------------
# Min-cost supplier per EUROPE part of one size: the correlated MIN
# subquery. Spark side: the per-part minimum is a window over the
# region-filtered partsupp (one shuffle on partkey), then an equality
# filter — the decorrelated form every planner rewrites Q2 into; the
# oracle keeps the literal correlated subquery.

def _q2(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ps = _synth_partsupp(spark, sf)
    p = load_table(spark, sf, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    j = (
        ps.join(p, ps.ps_partkey == p.p_partkey)
        .join(eu_supp, ps.ps_suppkey == F.col("s_suppkey"))
    )
    w = Window.partitionBy("ps_partkey")
    return (
        j.withColumn("min_cost", F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_supplycost_cents").alias("supplycost_cents"),
        )
    )


_Q2_SQL = (
    "WITH " + _PS_SQL + """
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
  ps_supplycost_cents AS supplycost_cents
FROM ps
JOIN part ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 15 AND r_name = 'EUROPE'
  AND ps_supplycost_cents = (
    SELECT MIN(ps2.ps_supplycost_cents)
    FROM ps ps2
    JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.ps_partkey = ps.ps_partkey AND r2.r_name = 'EUROPE'
  )
"""
)

register(QuerySpec(
    "min_cost_suppliers", _q2, _Q2_SQL,
    "min-cost supplier per part in a region (TPC-H Q2 shape: window "
    "decorrelation vs the oracle's literal correlated MIN subquery; "
    "partsupp synthesized deterministically)",
    ("relational", "join", "subquery", "window"),
))


# --- excess_stock_suppliers: TPC-H Q20 shape ------------------------------
# Suppliers in one nation holding excess stock of widget parts:
# ps_availqty > 0.5 * the 1997 shipped quantity of that (part,
# supplier). Integer cross-multiplication (2*avail > shipped) keeps it
# exact; the threshold aggregate joins at (part, supplier) grain and
# the supplier projection is a final left-semi join — Q20's
# nested-EXISTS chain in its scalable decorrelated form (oracle keeps
# the nested IN/correlated form).

def _q20(spark: SparkSession, sf: str) -> DataFrame:
    ps = _synth_partsupp(spark, sf)
    p = load_table(spark, sf, "part").filter(F.col("p_name").contains("widget"))
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    s = load_table(spark, sf, "supplier")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    n = load_table(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    excess = (
        ps.join(p, ps.ps_partkey == p.p_partkey)
        .join(
            shipped,
            (ps.ps_partkey == shipped.l_partkey)
            & (ps.ps_suppkey == shipped.l_suppkey),
            "left",
        )
        # never-shipped pairs count as zero shipped and always qualify
        .filter(2 * F.col("ps_availqty") > F.coalesce(F.col("qty"), F.lit(0)))
        .select("ps_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


_Q20_SQL = (
    "WITH " + _PS_SQL + """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT ps_suppkey FROM ps
    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      AND 2 * ps_availqty > (
        SELECT COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0) FROM lineitem
        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
      )
  )
"""
)

register(QuerySpec(
    "excess_stock_suppliers", _q20, _Q20_SQL,
    "region suppliers with excess stock vs a year's shipments (TPC-H Q20 "
    "shape: nested IN + correlated threshold, decorrelated to "
    "aggregate + semi-join; integer cross-multiplied threshold)",
    ("relational", "join", "subquery"),
))
