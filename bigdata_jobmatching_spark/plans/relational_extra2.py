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


# --- large_volume_customers: semi-join on an aggregate (Q18 shape) --------
# The candidate order set comes from a HAVING over the lineitem agg;
# joining it back through orders/customer is a semi-join on an
# aggregate — at scale the agg output (rare hot orders) is tiny, so it
# broadcasts and the fact table is touched exactly twice, never
# shuffled on a composite key.

_Q18_MIN_QTY = 250


def _q18(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    big = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_quantity").cast(MONEY)).cast("double").alias("sum_qty")
    ).filter(F.col("sum_qty") > _Q18_MIN_QTY)
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.col("o_totalprice"), "sum_qty",
        )
    )


_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey,
    CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS {MONEY})) AS DOUBLE) > {_Q18_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_totalprice, sum_qty
FROM big
JOIN orders ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""

register(QuerySpec(
    "large_volume_customers", _q18, _Q18_SQL,
    "semi-join on a HAVING aggregate: customers behind outsized orders "
    "(TPC-H Q18 shape)",
    ("relational", "join", "agg"),
))


# --- customer_spend_percentiles: distribution ranks within segments --------
# percent_rank + cume_dist partitioned by market segment — never a
# global single-partition sort; the (spend, custkey) order key makes
# every rank deterministic.

def _spend_pct(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    spend = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(MONEY)).cast("double").alias("spend")
    )
    j = spend.join(c, spend.o_custkey == c.c_custkey).select(
        "c_custkey", "c_mktsegment", "spend"
    )
    w = Window.partitionBy("c_mktsegment").orderBy("spend", "c_custkey")
    return j.select(
        "c_custkey", "c_mktsegment", "spend",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_SPEND_PCT_SQL = f"""
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_mktsegment, spend,
  round(PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY spend, c_custkey), 6) AS pct_rank,
  round(CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY spend, c_custkey), 6) AS cume
FROM spend JOIN customer ON o_custkey = c_custkey
"""

register(QuerySpec(
    "customer_spend_percentiles", _spend_pct, _SPEND_PCT_SQL,
    "percent_rank/cume_dist of customer spend within market segments "
    "(partitioned distribution ranks, no global sort)",
    ("relational", "window"),
))


# --- parts_never_bulk_ordered: EXCEPT set difference -----------------------
# The remaining set operator after union+distinct (U1): EXCEPT
# DISTINCT of two key sets, then a join back for the payload. Both
# sides prune to one column before the distinct, so the exchanges
# carry keys only.

def _never_bulk_ordered(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    all_parts = li.select("l_partkey")
    bulk = li.filter(F.col("l_quantity") > 45).select("l_partkey")
    keys = all_parts.subtract(bulk)
    return keys.join(p, keys.l_partkey == p.p_partkey).select(
        "p_partkey", "p_name", "p_brand"
    )


_NEVER_DISC_SQL = """
WITH keys AS (
  SELECT l_partkey FROM lineitem
  EXCEPT
  SELECT l_partkey FROM lineitem WHERE l_quantity > 45
)
SELECT p_partkey, p_name, p_brand
FROM keys JOIN part ON l_partkey = p_partkey
"""

register(QuerySpec(
    "parts_never_bulk_ordered", _never_bulk_ordered, _NEVER_DISC_SQL,
    "EXCEPT DISTINCT of key sets (parts never ordered in bulk) joined back for payload",
    ("relational", "setop", "join"),
))


# --- suppliers_with_bulk_shipments: explicit left-semi join ---------------
# The semi-join counterpart of the anti-join (customers_without_orders):
# existence check without payload duplication. The probe side prunes
# to the join key before the exchange; no row from the fact table
# survives past the join.

def _bulk_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier")
    bulk = li.filter(F.col("l_quantity") > 49).select("l_suppkey")
    return s.join(
        bulk, s.s_suppkey == bulk.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


_BULK_SUPP_SQL = """
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 49)
"""

register(QuerySpec(
    "suppliers_with_bulk_shipments", _bulk_suppliers, _BULK_SUPP_SQL,
    "left-semi existence join (suppliers with at least one max-quantity shipment)",
    ("relational", "join", "semi"),
))


# --- nation_revenue_share: share-of-total over an aggregate ---------------
# Ratio-to-report: each nation's revenue share of the global total via
# an unpartitioned window over the 25-row AGGREGATE (windowing the
# tiny post-agg result, never the fact table — the global window is
# safe exactly because it runs after the reduction).

def _nation_share(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    n = load_table(spark, sf, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(MONEY)
    per_nation = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("rev_dec"))
    )
    w = Window.partitionBy()
    return per_nation.select(
        "n_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.round(
            (F.col("rev_dec") / F.sum("rev_dec").over(w)).cast("double"), 6
        ).alias("revenue_share"),
    )


_NATION_SHARE_SQL = f"""
WITH per_nation AS (
  SELECT n_name, SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS rev_dec
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name
)
SELECT n_name, CAST(rev_dec AS DOUBLE) AS revenue,
  round(CAST(rev_dec / SUM(rev_dec) OVER () AS DOUBLE), 6) AS revenue_share
FROM per_nation
"""

register(QuerySpec(
    "nation_revenue_share", _nation_share, _NATION_SHARE_SQL,
    "ratio-to-report: per-nation revenue share via a window over the "
    "post-aggregation rows (exact decimal division)",
    ("relational", "window", "agg"),
))


# --- customers_inactive_1998: anti join with a correlated predicate -------
# NOT EXISTS with a condition beyond the key (no orders IN 1998) — the
# anti join carries the year predicate into the join itself, which
# Catalyst pushes to the orders scan.

def _inactive_98(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter(F.year("o_orderdate") == 1998)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


_INACTIVE_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND EXTRACT(year FROM o.o_orderdate) = 1998
)
"""

register(QuerySpec(
    "customers_inactive_1998", _inactive_98, _INACTIVE_SQL,
    "NOT EXISTS anti join with a correlated year predicate pushed into "
    "the scan",
    ("relational", "join", "anti"),
))


# --- user_top_event: native argmax aggregation ----------------------------
# max_by / arg_max with a composite (value, event_id) order key: the
# single-pass argmax — no self-join, no window — and the unique id in
# the key makes the winner deterministic on both engines.

def _user_top_event(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", F.struct(F.col("value"), F.col("event_id"))).alias("top_event_type"),
        F.max(F.struct(F.col("value"), F.col("event_id"))).getField("value").alias("top_value"),
    )


_TOP_EVENT_SQL = """
SELECT user_id, event_type AS top_event_type, value AS top_value FROM (
  SELECT user_id, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY value DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

register(QuerySpec(
    "user_top_event", _user_top_event, _TOP_EVENT_SQL,
    "single-pass argmax (max_by/arg_max) with a composite order key — "
    "deterministic winner, no window or self-join",
    ("relational", "agg", "argmax"),
))


# --- copurchase_triangles: graph analytics over a derived edge set --------
# Parts co-occurring in the same (sampled) order form an undirected
# co-purchase graph; the query reports edge count, triangle count and
# max degree in one result row. Triangle enumeration is the classic
# two-equi-join formulation over canonicalized a<b edges (see
# operators/graph.py); the joins shuffle on wedge endpoints, never
# materializing anything wider than the wedge set.

def copurchase_pairs(spark: SparkSession, sf: str, modulo: int = 20) -> DataFrame:
    """Canonical (pa < pb) distinct co-purchase edges over a sampled
    order set — shared by the triangle, recommendation and PageRank
    queries. Materialized once per query (lazy checkpoint): multiple
    consumers would each re-run the self-join+distinct otherwise
    (caught by tools/plan_audit.py)."""
    li = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") % modulo == 0)
    return (
        li.select("l_orderkey", F.col("l_partkey").alias("pa"))
        .join(
            li.select("l_orderkey", F.col("l_partkey").alias("pb")),
            "l_orderkey",
        )
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb")
        .distinct()
        .localCheckpoint(eager=False)
    )


def _copurchase_graph(spark: SparkSession, sf: str):
    from ..operators.graph import degrees, triangle_count

    pairs = copurchase_pairs(spark, sf)
    return pairs, degrees(pairs, "pa", "pb"), triangle_count(pairs, "pa", "pb")


def _copurchase_stats(spark: SparkSession, sf: str) -> DataFrame:
    pairs, deg, tri = _copurchase_graph(spark, sf)
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    max_deg = deg.agg(F.max("degree").alias("max_degree"))
    return (
        n_edges.crossJoin(F.broadcast(tri)).crossJoin(F.broadcast(max_deg))
        .select("n_edges", "n_triangles", "max_degree")
    )


_TRIANGLE_SQL = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 20 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT pa AS node FROM e UNION ALL SELECT pb FROM e
  ) GROUP BY node
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM e e1 JOIN e e2 ON e1.pb = e2.pa JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
)
SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT n_triangles FROM tri) AS n_triangles,
       (SELECT MAX(degree) FROM deg) AS max_degree
"""

register(QuerySpec(
    "copurchase_triangles", _copurchase_stats, _TRIANGLE_SQL,
    "co-purchase graph analytics: edge count, triangle count (two-join "
    "wedge closure) and max degree in one row",
    ("relational", "graph", "join", "bench"),
))


# --- copurchase_jaccard_recs: item-item collaborative filtering -----------
# "Customers who bought X also bought Y": item-item Jaccard over
# co-purchase order sets, top-3 recommendations per part. All
# cardinalities are exact integers (co-count + per-item order counts
# via one pair aggregation), so the Jaccard division and its ordering
# are engine-identical; the ranking window partitions by item.

def _copurchase_recs(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").filter(F.col("l_orderkey") % 4 == 0)
    item_orders = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = item_orders.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_ord")
    )
    pairs = (
        item_orders.select("l_orderkey", F.col("l_partkey").alias("pa"))
        .join(
            item_orders.select("l_orderkey", F.col("l_partkey").alias("pb")),
            "l_orderkey",
        )
        .filter(F.col("pa") != F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("co"))
    )
    j = (
        pairs
        .join(n_orders.select(F.col("l_partkey").alias("pa"), F.col("n_ord").alias("na")), "pa")
        .join(n_orders.select(F.col("l_partkey").alias("pb"), F.col("n_ord").alias("nb")), "pb")
        .withColumn(
            "jaccard",
            F.col("co").cast("double") / (F.col("na") + F.col("nb") - F.col("co")),
        )
    )
    w = Window.partitionBy("pa").orderBy(F.desc("jaccard"), F.asc("pb"))
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("pa").alias("part"), F.col("pb").alias("rec"),
            "jaccard", F.col("rnk").cast("int").alias("rnk"),
        )
    )


_RECS_SQL = """
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0
),
n_ord AS (SELECT l_partkey, COUNT(*) AS n_ord FROM li GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS co
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
  GROUP BY 1, 2
),
j AS (
  SELECT p.pa, p.pb,
    CAST(p.co AS DOUBLE) / (na.n_ord + nb.n_ord - p.co) AS jaccard
  FROM pairs p
  JOIN n_ord na ON na.l_partkey = p.pa
  JOIN n_ord nb ON nb.l_partkey = p.pb
)
SELECT pa AS part, pb AS rec, jaccard, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY pa ORDER BY jaccard DESC, pb ASC) AS rnk
  FROM j
) WHERE rnk <= 3
"""

register(QuerySpec(
    "copurchase_jaccard_recs", _copurchase_recs, _RECS_SQL,
    "item-item Jaccard top-3 recommendations over co-purchase sets "
    "(exact-integer similarity, per-item ranking window)",
    ("relational", "graph", "topk"),
))


# --- customer_spend_cumedist: cume_dist within market segment -------------
# The remaining classic window shape (cume_dist + partition-level
# min/max frames) not yet in the registry: each customer's spend
# percentile position within their market segment. Exact-decimal
# spend; cume_dist ties share a value by definition, so the output is
# order-free. Window partitions by segment — never global.

def _spend_cumedist(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    spend = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(MONEY)).alias("spend_d"))
        .join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("spend_d")
    wall = Window.partitionBy("c_mktsegment")
    return spend.select(
        "c_mktsegment",
        F.col("o_custkey").alias("custkey"),
        F.col("spend_d").cast("double").alias("spend"),
        F.cume_dist().over(w).alias("spend_cume"),
        F.min(F.col("spend_d")).over(wall).cast("double").alias("seg_min"),
        F.max(F.col("spend_d")).over(wall).cast("double").alias("seg_max"),
    )


_SPEND_CUMEDIST_SQL = f"""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS {MONEY})) AS spend_d
  FROM orders GROUP BY 1
),
j AS (
  SELECT c.c_mktsegment, s.o_custkey AS custkey, s.spend_d
  FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey
)
SELECT c_mktsegment, custkey,
  CAST(spend_d AS DOUBLE) AS spend,
  cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY spend_d) AS spend_cume,
  CAST(MIN(spend_d) OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS seg_min,
  CAST(MAX(spend_d) OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS seg_max
FROM j
"""

register(QuerySpec(
    "customer_spend_cumedist", _spend_cumedist, _SPEND_CUMEDIST_SQL,
    "cume_dist spend percentile within market segment + segment "
    "min/max window frames (exact-decimal ordering)",
    ("relational", "window"),
))


# --- orders_fulfillment_lag: ship-lag day histogram -----------------------
# Operational latency distribution: days between order date and each
# line's ship date, bucketed weekly. Date arithmetic is exact integer
# day counts on both engines; one fact-fact equi-join + a tiny-key
# aggregation.

def _fulfillment_lag(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    lag = li.join(
        o, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("lag_days")
    )
    # floor(x/7.0) rather than integer div: Spark's div truncates
    # toward zero while DuckDB's // floors, which diverges on negative
    # lags — floor of an identical double division is engine-identical
    # for any sign.
    return (
        lag.groupBy(
            F.expr("CAST(floor(lag_days / 7.0) AS BIGINT)").alias("lag_week")
        )
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


_FULFILLMENT_SQL = """
SELECT CAST(floor(date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) / 7.0) AS BIGINT) AS lag_week,
  COUNT(*) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""

register(QuerySpec(
    "orders_fulfillment_lag", _fulfillment_lag, _FULFILLMENT_SQL,
    "order-to-ship lag histogram in weeks (exact day arithmetic, "
    "fact-fact join + tiny-key aggregation)",
    ("relational", "agg", "join"),
))


# --- supplier_market_concentration: Herfindahl index per part type --------
# Market-concentration audit: per part type, the Herfindahl-Hirschman
# index of supplier shares of available quantity. Shares and the HHI
# sum run in exact integer arithmetic (micro-share per supplier, then
# sum of squared micro-shares as DECIMAL) — no double sums anywhere.

def _concentration(spark: SparkSession, sf: str) -> DataFrame:
    # partsupp is not in the test lake; supplier shares come from
    # lineitem volume joined to part type (same grain, same math).
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("q")
    )
    p = load_table(spark, sf, "part").select("p_partkey", "p_type")
    j = li.join(p, F.col("l_partkey") == F.col("p_partkey"))
    per_supp = j.groupBy("p_type", "l_suppkey").agg(F.sum("q").alias("sq"))
    per_type = per_supp.groupBy("p_type").agg(F.sum("sq").alias("tq"))
    shares = per_supp.join(per_type, "p_type").withColumn(
        "share6", F.expr("(sq * 1000000) div tq")
    )
    return (
        shares.groupBy("p_type", "tq")
        .agg(
            F.sum(
                F.expr("CAST(share6 AS DECIMAL(18,0)) * CAST(share6 AS DECIMAL(18,0))")
            ).alias("hhi_sq"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .select(
            "p_type", "n_suppliers",
            F.col("tq").alias("total_qty"),
            (F.col("hhi_sq").cast("double") / F.lit(1e12)).alias("hhi"),
        )
    )


_CONCENTRATION_SQL = """
WITH j AS (
  SELECT p.p_type, l.l_suppkey, CAST(l.l_quantity AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
per_supp AS (
  SELECT p_type, l_suppkey, SUM(q) AS sq FROM j GROUP BY 1, 2
),
per_type AS (SELECT p_type, SUM(sq) AS tq FROM per_supp GROUP BY 1),
shares AS (
  SELECT s.p_type, t.tq, (s.sq * 1000000) // t.tq AS share6
  FROM per_supp s JOIN per_type t ON s.p_type = t.p_type
)
SELECT p_type, COUNT(*) AS n_suppliers, CAST(tq AS BIGINT) AS total_qty,
  CAST(SUM(CAST(share6 AS DECIMAL(18,0)) * CAST(share6 AS DECIMAL(18,0))) AS DOUBLE) / 1e12 AS hhi
FROM shares GROUP BY p_type, tq
"""

register(QuerySpec(
    "supplier_market_concentration", _concentration, _CONCENTRATION_SQL,
    "Herfindahl supplier-concentration index per part type — exact "
    "integer micro-shares, decimal square sum",
    ("relational", "agg", "analytics"),
))


# --- skew_split_brand_volumes: differentiated skew join, oracled ----------
# Same pattern as salted_event_type_stats (r03): the skew-mitigation
# operator must produce BIT-IDENTICAL results to the plain formulation
# — the oracle is the ordinary join+agg SQL, so the driver hash
# proves the hot/cold split loses and duplicates nothing.

def _skew_split_volumes(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.skew import skew_split_join

    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", F.col("l_quantity").cast("long").alias("q")
    )
    p = load_table(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    j = skew_split_join(li, p, "l_partkey", hot_key_threshold=20)
    return j.groupBy("p_brand").agg(
        F.sum("q").alias("total_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_SKEW_SPLIT_SQL = """
SELECT p.p_brand, CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
  COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY 1
"""

register(QuerySpec(
    "skew_split_brand_volumes", _skew_split_volumes, _SKEW_SPLIT_SQL,
    "brand volumes through the differentiated skew join (hot keys "
    "broadcast, cold shuffled) — oracle is the plain join, proving "
    "exact equivalence",
    ("relational", "skew", "join"),
))


# --- nation_top2_acctbal_lateral: correlated LATERAL subquery -------------
# The lateral-join operator shape (SQL `, LATERAL (...)`) — per outer
# row, an ordered+limited correlated subquery. Semantically a top-k
# per group, but planned through Spark's DecorrelateInnerQuery path
# rather than a window, exercising the correlated-subquery operator
# surface the window queries never touch. At scale Spark rewrites the
# decorrelated limit into a partitioned window — same shuffle shape
# as the window form, no per-row re-execution.

def _lateral_top2(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "customer").createOrReplaceTempView("lat_customer")
    load_table(spark, sf, "nation").createOrReplaceTempView("lat_nation")
    return spark.sql("""
      SELECT n.n_name, x.c_custkey, x.c_acctbal
      FROM lat_nation n, LATERAL (
        SELECT c_custkey, c_acctbal FROM lat_customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) x
    """)


_LATERAL_SQL = """
SELECT n.n_name, x.c_custkey, x.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) x
"""

register(QuerySpec(
    "nation_top2_acctbal_lateral", _lateral_top2, _LATERAL_SQL,
    "top-2 customers per nation through a correlated LATERAL subquery "
    "with ORDER BY + LIMIT (decorrelated join plan, not a window)",
    ("relational", "lateral", "join"),
))


# --- parts_pareto_frontier: 2-D skyline via cumulative minimum ------------
# The skyline operator (non-dominated points): a part is on the
# (price, size) frontier iff no other part is <= on both axes and <
# on one. The naive formulation is an O(n^2) dominance anti-join; the
# 2-D case collapses to ONE ordered cumulative minimum: reduce to
# per-price minimal size (bounded groupBy), then a point survives iff
# its size is strictly below the min size of every strictly-cheaper
# price. The global window runs over DISTINCT PRICE grain — already
# reduced by the groupBy shuffle, orders of magnitude below row
# grain; for >2 dims or unbounded key grain the divide-and-conquer
# local-frontier-then-merge shape applies, but 2-D needs none of it.
# Equal (price, size) twins don't dominate each other (no strict
# axis), so all minimal twins survive — count carried per point.

def _pareto(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part")
    pts = p.select(
        F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
        F.col("p_size").cast("long").alias("size"),
    )
    per_price = pts.groupBy("price_cents").agg(
        F.min("size").alias("min_size"),
    )
    w = (
        Window.orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_price.withColumn("cheaper_min", F.min("min_size").over(w))
        .filter(
            F.col("cheaper_min").isNull()
            | (F.col("min_size") < F.col("cheaper_min"))
        )
        .select("price_cents", F.col("min_size").alias("size"))
    )
    return (
        pts.join(F.broadcast(frontier), ["price_cents", "size"])
        .groupBy("price_cents", "size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )


_PARETO_SQL = """
WITH pts AS (
  SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS size
  FROM part
),
per_price AS (
  SELECT price_cents, min(size) AS min_size FROM pts GROUP BY price_cents
),
frontier AS (
  SELECT price_cents, min_size AS size
  FROM (
    SELECT *, min(min_size) OVER (ORDER BY price_cents
      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cheaper_min
    FROM per_price
  ) WHERE cheaper_min IS NULL OR min_size < cheaper_min
)
SELECT p.price_cents, p.size, CAST(count(*) AS BIGINT) AS n_parts
FROM pts p JOIN frontier f
  ON p.price_cents = f.price_cents AND p.size = f.size
GROUP BY 1, 2
"""

register(QuerySpec(
    "parts_pareto_frontier", _pareto, _PARETO_SQL,
    "2-D skyline (price x size Pareto frontier) via per-price "
    "reduction + cumulative-min window over distinct-price grain — "
    "the O(n log n) formulation of the dominance anti-join",
    ("relational", "window", "skyline"),
))


# --- customers_all_priorities: relational division ------------------------
# The classic "for all" operator (relational division): customers
# whose order history covers EVERY order priority present in the
# data. Expressed as count-distinct-equals-universe — two bounded
# aggregations and a broadcast scalar, never a nested NOT EXISTS
# double anti-join (which planners turn into one more shuffle at
# best). The universe count rides along in the output so the hash
# pins it too.

def _division(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    universe = o.agg(
        F.countDistinct("o_orderpriority").alias("n_universe"))
    per_cust = o.groupBy("o_custkey").agg(
        F.countDistinct("o_orderpriority").alias("n_prio"))
    full = (
        per_cust.crossJoin(F.broadcast(universe))
        .filter(F.col("n_prio") == F.col("n_universe"))
    )
    return (
        full.join(c, full.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name",
            F.col("n_prio").cast("long").alias("n_priorities"),
        )
    )


_DIVISION_SQL = """
WITH universe AS (
  SELECT COUNT(DISTINCT o_orderpriority) AS n_universe FROM orders
),
per_cust AS (
  SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_prio
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, CAST(p.n_prio AS BIGINT) AS n_priorities
FROM per_cust p CROSS JOIN universe u
JOIN customer c ON p.o_custkey = c.c_custkey
WHERE p.n_prio = u.n_universe
"""

register(QuerySpec(
    "customers_all_priorities", _division, _DIVISION_SQL,
    "relational division (for-all): customers whose orders cover "
    "every order priority — count-distinct-equals-universe with a "
    "broadcast scalar, no nested double anti-join",
    ("relational", "agg", "division"),
))
