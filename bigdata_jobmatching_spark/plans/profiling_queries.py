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
from .catalog import QuerySpec, ratio6, ratio6_sql, register

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
    # Two-level aggregation (r14, guide §2.5): a direct
    # groupBy(col_name) + countDistinct shuffles every (column, value)
    # pair into |columns| = 6 reduce groups — parallelism 6 whatever
    # the cluster. Aggregating at (col_name, v) grain first spreads
    # the big shuffle over the full value space (and partial
    # aggregation dedups map-side); the fold to col_name grain then
    # moves one row per distinct value. Identical results: n_rows is
    # the sum of value counts, n_null the null group's count,
    # n_distinct the number of non-null value groups, min/max ignore
    # nulls in both shapes.
    return (
        o.select(F.explode(pairs).alias("cv"))
        .select("cv.col_name", "cv.v")
        .groupBy("col_name", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("col_name")
        .agg(
            F.sum("c").alias("n_rows"),
            F.sum(F.when(F.col("v").isNull(), F.col("c")).otherwise(0))
            .alias("n_null"),
            F.count("v").alias("n_distinct"),
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
  CAST(SUM(CASE WHEN u.v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
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


# --- join_key_skew_audit: is this key safe to shuffle on? -----------------
# The pre-flight every 100 TB join needs: per candidate join key, the
# cardinality, the heaviest key's row count, the hot-key census (keys
# holding > 2x the mean load) and the share of rows they carry — the
# numbers that decide between a plain shuffle join, AQE skew handling,
# or an explicit salted/differentiated join (operators/skew.py). Per
# key: one map-side-combinable aggregate to key grain, a 1-row stats
# aggregate, and a broadcast-scalar crossJoin back over the key-grain
# rows for the hot census (no driver collect). The hot-key rule is
# integer cross-multiplication (cnt * n_keys > 2 * n_rows) — no float
# averages anywhere; shares are exact-integer ratio6.

_SKEW_KEYS: tuple[tuple[str, str], ...] = (
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_suppkey"),
    ("events", "user_id"),
)


def _skew_audit(spark: SparkSession, sf: str) -> DataFrame:
    # one unioned key-grain aggregate for ALL audited keys (keys are
    # uniformly cast to long), then 3-row stats and the hot census as
    # broadcast joins: 3 bounded shuffles total for any number of keys.
    per_key = None
    for table, key in _SKEW_KEYS:
        part = load_table(spark, sf, table).select(
            F.lit(f"{table}.{key}").alias("join_key"),
            F.col(key).cast("long").alias("k"),
        )
        per_key = part if per_key is None else per_key.unionByName(part)
    per_key = per_key.groupBy("join_key", "k").agg(F.count(F.lit(1)).alias("cnt"))
    stats = per_key.groupBy("join_key").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_key_rows"),
    )
    hot = (
        per_key.join(F.broadcast(stats), "join_key")
        .filter(F.col("cnt") * F.col("n_keys") > 2 * F.col("n_rows"))
        .groupBy("join_key")
        .agg(
            F.count(F.lit(1)).alias("hot_keys"),
            F.sum("cnt").alias("hot_rows"),
        )
    )
    return (
        stats.join(F.broadcast(hot), "join_key", "left")
        .select(
            "join_key", "n_keys", "n_rows", "max_key_rows",
            F.coalesce("hot_keys", F.lit(0)).alias("hot_keys"),
            F.coalesce("hot_rows", F.lit(0)).alias("hot_rows"),
            ratio6("max_key_rows", "n_rows").alias("max_key_share"),
            ratio6("coalesce(hot_rows, 0)", "n_rows").alias("hot_row_share"),
        )
    )


def _one_key_sql(table: str, key: str) -> str:
    return f"""
SELECT '{table}.{key}' AS join_key, n_keys, n_rows, max_key_rows,
  hot_keys, hot_rows,
  {ratio6_sql('max_key_rows', 'n_rows')} AS max_key_share,
  {ratio6_sql('hot_rows', 'n_rows')} AS hot_row_share
FROM (
  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows, MAX(cnt) AS max_key_rows,
    CAST(SUM(CASE WHEN cnt * n_keys_w > 2 * n_rows_w THEN 1 ELSE 0 END) AS BIGINT) AS hot_keys,
    CAST(COALESCE(SUM(CASE WHEN cnt * n_keys_w > 2 * n_rows_w THEN cnt END), 0) AS BIGINT) AS hot_rows
  FROM (
    SELECT cnt, COUNT(*) OVER () AS n_keys_w, SUM(cnt) OVER () AS n_rows_w
    FROM (SELECT {key} AS k, COUNT(*) AS cnt FROM {table} GROUP BY 1)
  )
)"""


_SKEW_SQL = " UNION ALL ".join(_one_key_sql(t, k) for t, k in _SKEW_KEYS)

register(QuerySpec(
    "join_key_skew_audit", _skew_audit, _SKEW_SQL,
    "join-key skew pre-flight: cardinality, heaviest key, hot-key "
    "census (integer 2x-mean rule) and exact load shares per candidate "
    "shuffle key",
    ("profiling", "agg", "skew", "bench"),
))


# --- referential_integrity_audit: FK/PK consistency in one pass -----------
# The lake trust check before any join-based pipeline: orphan facts
# (lineitems whose order is missing), childless orders, and duplicate
# primary keys on both tables — each an anti-join or a grouped
# HAVING count, all exact integers, composed into one audit row.
# Scale shape: two anti-joins on the natural keys (AQE picks
# broadcast vs shuffle), two self-dup checks that are
# map-side-combinable counts; no full-table materialization.

def _ref_integrity(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    orphans = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti").agg(
        F.count(F.lit(1)).alias("orphan_lineitems"))
    childless = o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").agg(
        F.count(F.lit(1)).alias("childless_orders"))
    dup_orders = (
        o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("dup_order_keys"))
    )
    dup_lines = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).alias("dup_line_keys"))
    )
    return (
        orphans.crossJoin(F.broadcast(childless))
        .crossJoin(F.broadcast(dup_orders))
        .crossJoin(F.broadcast(dup_lines))
    )


_REF_SQL = """
SELECT
  (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
     (SELECT o_orderkey FROM orders)) AS orphan_lineitems,
  (SELECT COUNT(*) FROM orders WHERE o_orderkey NOT IN
     (SELECT l_orderkey FROM lineitem)) AS childless_orders,
  (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
     GROUP BY 1 HAVING COUNT(*) > 1)) AS dup_order_keys,
  (SELECT COUNT(*) FROM (SELECT l_orderkey, l_linenumber FROM lineitem
     GROUP BY 1, 2 HAVING COUNT(*) > 1)) AS dup_line_keys
"""

register(QuerySpec(
    "referential_integrity_audit", _ref_integrity, _REF_SQL,
    "FK/PK consistency audit: orphan facts, childless orders, "
    "duplicate keys — anti-joins + HAVING counts in one audit row",
    ("profiling", "join", "quality"),
))


# --- event_heavy_hitters: exact hitters via MG candidate pruning ----------
# Round-5: the candidate-then-verify pattern at gate grain. Phase 1
# prunes with per-batch Misra-Gries summaries (no shuffle of the raw
# stream); phase 2 recounts candidates exactly, so the result is
# EXACT and partitioning-independent even though the candidate set
# isn't — which is precisely what lets a plain GROUP BY ... HAVING
# oracle verify a sketch-assisted plan value-for-value.

_HH_DENOM = 200


def _heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.skew import heavy_hitters_exact

    ev = load_table(spark, sf, "events")
    out = heavy_hitters_exact(ev, "user_id", denom=_HH_DENOM)
    return out.select(
        "user_id", "n_rows", "n_total",
        ratio6("n_rows", "n_total").alias("share"),
    )


_HH_SQL = f"""
WITH tot AS (SELECT COUNT(*) AS n FROM events)
SELECT CAST(user_id AS VARCHAR) AS user_id,
  COUNT(*) AS n_rows,
  CAST(MAX(t.n) AS BIGINT) AS n_total,
  {ratio6_sql("COUNT(*)", "MAX(t.n)")} AS share
FROM events, tot t
GROUP BY user_id
HAVING COUNT(*) * {_HH_DENOM} > MAX(t.n)
"""

register(QuerySpec(
    "event_heavy_hitters", _heavy_hitters, _HH_SQL,
    f"exact heavy hitters (> n/{_HH_DENOM} of all events) via "
    "Misra-Gries candidate pruning + exact recount — sketch-assisted "
    "plan, exact answer",
    ("profiling", "skew", "sketch"),
))


# --- fk_integrity_audit: referential-integrity guardrail (round-7) --------
# The pipeline pre-flight every warehouse load should run: for each
# declared FK edge, one row with child/orphan/parent/coverage
# counts. Each edge is a single full-outer join at KEY grain (the
# child side pre-aggregates to distinct keys with counts first, so
# the join never sees raw child rows) — one shuffle per edge, dims
# broadcast-able, and the whole audit unions six tiny summaries.
# Orphans here are exact row counts, not samples: at 100 TB a
# 0.001 % orphan rate is still millions of rows silently dropped by
# every inner join downstream — this query is how you find out
# BEFORE the joins do. Each edge is ONE shuffle: child and parent
# key streams union into a single key-grain aggregation (tag max +
# count sum), instead of a full-outer join that would exchange both
# sides — 6 edges, 6 parallel shuffles, no chain.

_FK_EDGES = (
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
)


def _fk_edge_summary(
    spark: SparkSession, sf: str,
    rel: str, child: str, fk: str, parent: str, pk: str,
) -> DataFrame:
    ck = load_table(spark, sf, child).select(
        F.col(fk).alias("k"),
        F.lit(1).alias("nc"),
        F.lit(0).alias("is_p"),
    )
    pkd = load_table(spark, sf, parent).select(
        F.col(pk).alias("k"), F.lit(0).alias("nc"), F.lit(1).alias("is_p")
    )
    g = ck.unionByName(pkd).groupBy("k").agg(
        F.sum("nc").alias("n"), F.max("is_p").alias("has_p")
    )
    return g.agg(
        F.lit(rel).alias("relation"),
        F.sum("n").cast("long").alias("n_child_rows"),
        F.sum(F.when(F.col("has_p") == 0, F.col("n")).otherwise(0))
        .cast("long").alias("n_orphan_rows"),
        F.count(F.when((F.col("has_p") == 0) & F.col("k").isNotNull(), 1))
        .cast("long").alias("n_orphan_keys"),
        F.sum("has_p").cast("long").alias("n_parents"),
        F.count(F.when((F.col("has_p") == 1) & (F.col("n") > 0), 1))
        .cast("long").alias("n_parents_referenced"),
    )


def _fk_audit(spark: SparkSession, sf: str) -> DataFrame:
    out = None
    for rel, child, fk, parent, pk in _FK_EDGES:
        s = _fk_edge_summary(spark, sf, rel, child, fk, parent, pk)
        out = s if out is None else out.unionByName(s)
    return out


def _fk_edge_sql(rel: str, child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{rel}' AS relation,
  CAST(SUM(n) AS BIGINT) AS n_child_rows,
  CAST(COALESCE(SUM(CASE WHEN pk IS NULL THEN n END), 0) AS BIGINT)
    AS n_orphan_rows,
  CAST(COUNT(CASE WHEN pk IS NULL AND k IS NOT NULL THEN 1 END) AS BIGINT)
    AS n_orphan_keys,
  CAST(COUNT(pk) AS BIGINT) AS n_parents,
  CAST(COUNT(CASE WHEN pk IS NOT NULL AND k IS NOT NULL THEN 1 END)
       AS BIGINT) AS n_parents_referenced
FROM (
  SELECT ck.k, ck.n, p.{pk} AS pk
  FROM (SELECT {fk} AS k, COUNT(*) AS n FROM {child} GROUP BY 1) ck
  FULL OUTER JOIN {parent} p ON ck.k = p.{pk}
)"""


_FK_SQL = "\nUNION ALL\n".join(
    _fk_edge_sql(*e) for e in _FK_EDGES
)

register(QuerySpec(
    "fk_integrity_audit", _fk_audit, _FK_SQL,
    "referential-integrity pre-flight: exact orphan rows/keys and "
    "parent coverage for all six declared FK edges (key-grain "
    "full-outer joins, one shuffle per edge)",
    ("profiling", "join", "quality"),
))


# --- price_mad_outliers: robust per-brand outlier census --------------------
# Median / median-absolute-deviation outlier detection over part
# prices, the robust alternative to mean/stddev that a data-quality
# gate wants (a single corrupted price moves the mean arbitrarily but
# not the median). All arithmetic is exact BIGINT cents: prices are
# half-up-rounded to cents once (floor(x*100 + 0.5) — one IEEE
# multiply + floor, engine-identical), medians are the LOWER median
# by row_number (no interpolation, no float averaging), deviations
# and the 3*MAD fence are pure integers. Scale shape: two windowed
# passes partitioned by brand; at 100 TB with billion-row groups the
# same census would swap the exact window median for
# percentile_approx — the fence arithmetic is unchanged.

def _mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    p = load_table(spark, sf, "part").select(
        "p_brand",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long").alias("c"),
    )
    w = Window.partitionBy("p_brand").orderBy("c")
    ranked = p.select(
        "p_brand", "c",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("p_brand")).alias("n"),
    )
    med = (
        ranked.filter(F.col("rn") == F.floor((F.col("n") + 1) / 2))
        .select("p_brand", F.col("c").alias("med"))
    )
    dev = ranked.join(med, "p_brand").select(
        "p_brand", "n", "c", F.abs(F.col("c") - F.col("med")).alias("d"),
        "med",
    )
    wd = Window.partitionBy("p_brand").orderBy("d")
    mad = (
        dev.withColumn("rn2", F.row_number().over(wd))
        .filter(F.col("rn2") == F.floor((F.col("n") + 1) / 2))
        .select("p_brand", F.col("d").alias("mad"))
    )
    return (
        dev.join(mad, "p_brand")
        .groupBy("p_brand")
        .agg(
            F.max("n").alias("n_parts"),
            F.max("med").alias("median_cents"),
            F.max("mad").alias("mad_cents"),
            F.sum(F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0))
            .alias("n_outliers"),
        )
        .select(
            "p_brand", "n_parts", "median_cents", "mad_cents", "n_outliers",
            ratio6("n_outliers", "n_parts").alias("outlier_rate"),
        )
        .orderBy("p_brand")
    )


_MAD_SQL = f"""
WITH cents AS (
  SELECT p_brand,
    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS c
  FROM part
),
ranked AS (
  SELECT p_brand, c,
    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY c) AS rn,
    COUNT(*) OVER (PARTITION BY p_brand) AS n
  FROM cents
),
med AS (
  SELECT p_brand, c AS med FROM ranked WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT r.p_brand, r.n, r.c, abs(r.c - m.med) AS d, m.med
  FROM ranked r JOIN med m ON r.p_brand = m.p_brand
),
mad AS (
  SELECT p_brand, d AS mad FROM (
    SELECT p_brand, d, n,
      ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY d) AS rn2
    FROM dev
  ) WHERE rn2 = (n + 1) // 2
)
SELECT d.p_brand,
  CAST(MAX(d.n) AS BIGINT) AS n_parts,
  MAX(d.med) AS median_cents,
  MAX(m.mad) AS mad_cents,
  CAST(SUM(CASE WHEN d.d > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
  {ratio6_sql("SUM(CASE WHEN d.d > 3 * m.mad THEN 1 ELSE 0 END)",
              "MAX(d.n)")} AS outlier_rate
FROM dev d JOIN mad m ON d.p_brand = m.p_brand
GROUP BY d.p_brand
ORDER BY d.p_brand
"""

register(QuerySpec(
    "price_mad_outliers", _mad_outliers, _MAD_SQL,
    "median/MAD robust outlier census per brand in exact BIGINT "
    "cents: lower-median by row_number (no interpolation), 3*MAD "
    "fence, outlier rate via pure-int ratio6",
    ("profiling", "window", "quality"),
))


# --- k_anonymity_census: re-identification risk profile (round-10) ----------
# The privacy audit a dataset needs BEFORE release (the complement
# of doc_pii_scrub's redaction): how many records sit in
# quasi-identifier equivalence classes smaller than k — i.e. are
# re-identifiable by joining public attributes — and how much does
# one generalization step (nation -> region, the classic
# value-generalization-hierarchy move) repair? Two censuses over
# customer: granular QI = (nationkey, mktsegment) vs coarsened QI =
# (regionkey, mktsegment); per level the class count, the smallest
# class, classes below k and records at risk. Exact integer counts
# only; the nation->region hop is a 25-row broadcast join.

_KANON_K = 10


def _k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation").select(
        "n_nationkey", "n_regionkey")
    cr = c.join(F.broadcast(n),
                c.c_nationkey == n.n_nationkey).select(
        "c_custkey", "c_nationkey", "n_regionkey", "c_mktsegment")

    def census(level: str, *qi: str) -> DataFrame:
        classes = cr.groupBy(*qi).agg(
            F.count(F.lit(1)).cast("long").alias("sz"))
        return classes.agg(
            F.lit(level).alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.min("sz").cast("long").alias("min_class_size"),
            F.sum((F.col("sz") < _KANON_K).cast("long"))
            .cast("long").alias("classes_below_k"),
            F.sum(F.when(F.col("sz") < _KANON_K, F.col("sz"))
                  .otherwise(F.lit(0))).cast("long")
            .alias("records_at_risk"),
        )

    return census("nation_segment", "c_nationkey", "c_mktsegment") \
        .unionByName(census("region_segment", "n_regionkey",
                            "c_mktsegment"))


_KANON_SQL = f"""
WITH cr AS (
  SELECT c.c_custkey, c.c_nationkey, n.n_regionkey, c.c_mktsegment
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
),
g1 AS (
  SELECT COUNT(*) AS sz FROM cr GROUP BY c_nationkey, c_mktsegment
),
g2 AS (
  SELECT COUNT(*) AS sz FROM cr GROUP BY n_regionkey, c_mktsegment
)
SELECT 'nation_segment' AS level,
  CAST(COUNT(*) AS BIGINT) AS n_classes,
  CAST(MIN(sz) AS BIGINT) AS min_class_size,
  CAST(SUM(CASE WHEN sz < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
    AS classes_below_k,
  CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) AS BIGINT)
    AS records_at_risk
FROM g1
UNION ALL
SELECT 'region_segment',
  CAST(COUNT(*) AS BIGINT),
  CAST(MIN(sz) AS BIGINT),
  CAST(SUM(CASE WHEN sz < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT),
  CAST(SUM(CASE WHEN sz < {_KANON_K} THEN sz ELSE 0 END) AS BIGINT)
FROM g2
"""

register(QuerySpec(
    "k_anonymity_census", _k_anonymity, _KANON_SQL,
    "k-anonymity re-identification risk profile: quasi-identifier "
    "equivalence-class census at two generalization levels "
    "(nation x segment vs region x segment) — class count, smallest "
    "class, classes below k and records at risk, exact integers",
    ("profiling", "privacy", "agg"),
))
