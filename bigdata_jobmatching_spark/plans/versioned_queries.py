"""Versioned-stage change-data-feed queries.

The diff operator (sources/versioned.diff_frames) is the offline twin
of the streaming SCD1 upsert sink: given two snapshots it recovers
the insert/delete/update/unchanged feed that merge_version applied.
Here two deterministic snapshots are derived from ``customer`` with
every classification branch planted — deletes, value updates,
NULL<->value flips (the null-safe comparison case), both-sides-NULL
(equal), and keyspace inserts — and the diff's per-class profile is
hash-checked against a DuckDB oracle that classifies each key
arithmetically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import fan_out, load_table
from .catalog import QuerySpec, register

# Insert keys are planted at k + _INS_OFFSET. c_custkey reaches
# 150k*sf, so at sf >= ~6.7 planted ids would collide with real keys
# and silently duplicate v2 rows (round-6 ADVICE). _guarded_insert_id
# therefore raises at row level the moment any source key reaches the
# offset — loud failure instead of a corrupt snapshot; the shipped
# tiers (sf <= 1 -> max key 150k) have ~6.7x headroom.
_INS_OFFSET = 1_000_000


def _guarded_insert_id(k: Column) -> Column:
    # assert_true yields NULL when the predicate holds and raises
    # otherwise; coalesce then forwards the shifted key. Pure JVM-side
    # expression — no extra job, stays inside codegen.
    return F.coalesce(
        F.assert_true(
            k < _INS_OFFSET,
            F.lit(f"c_custkey >= {_INS_OFFSET}: insert ids would collide"),
        ).cast("long"),
        k + _INS_OFFSET,
    )


def _snap_v1(spark: SparkSession, sf: str) -> DataFrame:
    c = fan_out(load_table(spark, sf, "customer"))
    k = F.col("c_custkey")
    return c.select(
        k.alias("id"),
        F.when(k % 23 != 0, F.col("c_name")).alias("name"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("cents"),
    )


def _snap_v2(spark: SparkSession, sf: str) -> DataFrame:
    c = fan_out(load_table(spark, sf, "customer"))
    k = F.col("c_custkey")
    base = c.filter(k % 17 != 0).select(
        k.alias("id"),
        F.when(k % 11 != 0, F.col("c_name")).alias("name"),
        (F.round(F.col("c_acctbal") * 100).cast("long")
         + F.when(k % 5 == 0, F.lit(1000)).otherwise(F.lit(0))).alias("cents"),
    )
    inserts = c.filter(k % 13 == 0).select(
        _guarded_insert_id(k).alias("id"),
        F.col("c_name").alias("name"),
        (F.round(F.col("c_acctbal") * 100).cast("long") + 5).alias("cents"),
    )
    return base.unionByName(inserts)


def _version_diff_audit(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.versioned import diff_frames

    diff = diff_frames(_snap_v1(spark, sf), _snap_v2(spark, sf), ("id",))
    return diff.groupBy("change").agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("id").cast("long").alias("sum_ids"),
        F.sum(F.col("__new_val.cents")).cast("long").alias("sum_new_cents"),
        F.sum(F.col("__old_val.cents")).cast("long").alias("sum_old_cents"),
    )


_DIFF_SQL = f"""
WITH base AS (
  SELECT c_custkey AS k,
    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
classified AS (
  SELECT k AS id,
    CASE WHEN k % 17 = 0 THEN 'delete'
         WHEN k % 5 = 0 OR ((k % 23 = 0) != (k % 11 = 0)) THEN 'update'
         ELSE 'unchanged' END AS change,
    cents AS old_cents,
    CASE WHEN k % 17 = 0 THEN NULL
         WHEN k % 5 = 0 THEN cents + 1000 ELSE cents END AS new_cents
  FROM base
  UNION ALL
  SELECT k + {_INS_OFFSET} AS id, 'insert' AS change,
    NULL AS old_cents, cents + 5 AS new_cents
  FROM base WHERE k % 13 = 0
)
SELECT change,
  CAST(count(*) AS BIGINT) AS n_keys,
  CAST(sum(id) AS BIGINT) AS sum_ids,
  CAST(sum(new_cents) AS BIGINT) AS sum_new_cents,
  CAST(sum(old_cents) AS BIGINT) AS sum_old_cents
FROM classified GROUP BY change
"""

register(QuerySpec(
    "version_diff_audit", _version_diff_audit, _DIFF_SQL,
    "change-data-feed between two planted stage snapshots via the "
    "full-outer null-safe diff operator (insert/delete/update/"
    "unchanged incl. NULL<->value flips), profiled per class",
    ("versioned", "join", "agg"),
))


# --- incremental_agg_refresh: IVM over the change feed --------------------
# Round-7: incremental view maintenance — the 100 TB posture for
# materialized aggregates. The Spark side NEVER aggregates v2
# directly: it takes the v1 aggregate (the "materialized view"),
# derives per-group deltas from the diff operator's change feed
# (insert -> +1/+cents, delete -> -1/-cents, update -> cents delta;
# unchanged rows are FILTERED OUT before the shuffle, so the delta
# path scales with |changes|, not |table|), and merges partials via
# union + one re-aggregation (map-side combine, single shuffle on the
# group key). The DuckDB oracle computes the v2 aggregate DIRECTLY
# from the planted arithmetic — a hash match proves refresh(v1, cdf)
# == full recompute(v2) exactly, count-zero groups dropped.

_NGROUP = 97


def _incremental_agg_refresh(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.versioned import diff_frames

    g = (F.col("id") % _NGROUP).alias("g")
    base_agg = _snap_v1(spark, sf).groupBy(g).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("sum_cents"),
    )
    diff = diff_frames(_snap_v1(spark, sf), _snap_v2(spark, sf), ("id",))
    deltas = diff.filter(F.col("change") != "unchanged").select(
        g,
        F.when(F.col("change") == "insert", F.lit(1))
        .when(F.col("change") == "delete", F.lit(-1))
        .otherwise(F.lit(0)).alias("n_rows"),
        (
            F.coalesce(F.col("__new_val.cents"), F.lit(0))
            - F.coalesce(F.col("__old_val.cents"), F.lit(0))
        ).alias("sum_cents"),
    )
    return (
        base_agg.unionByName(deltas)
        .groupBy("g")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
        .filter(F.col("n_rows") > 0)
    )


_IVM_SQL = f"""
WITH v2 AS (
  SELECT c_custkey AS id,
    CAST(round(c_acctbal * 100) AS BIGINT)
      + CASE WHEN c_custkey % 5 = 0 THEN 1000 ELSE 0 END AS cents
  FROM customer WHERE c_custkey % 17 <> 0
  UNION ALL
  SELECT c_custkey + {_INS_OFFSET} AS id,
    CAST(round(c_acctbal * 100) AS BIGINT) + 5 AS cents
  FROM customer WHERE c_custkey % 13 = 0
)
SELECT id % {_NGROUP} AS g,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(cents) AS BIGINT) AS sum_cents
FROM v2 GROUP BY 1
"""

register(QuerySpec(
    "incremental_agg_refresh", _incremental_agg_refresh, _IVM_SQL,
    "incremental view maintenance: refresh a materialized per-group "
    "aggregate from the change-data feed alone (delta path scales "
    "with |changes|) — hash-proven equal to a full v2 recompute",
    ("versioned", "agg", "join", "bench"),
))


# --- schema_evolution_audit: schema-on-read over versions (round-9) --------
# The table-format behavior the versioned store was missing: a column
# ADDED in a later version must not invalidate time travel. Two
# versions are landed physically (v1 without the om column, v2 with
# it) and both are read through read_version_evolved, which
# reconciles any historical version to the CURRENT schema — typed
# NULL backfill for added columns, current column order — so the two
# reads union cleanly. The audit profiles each version's evolved
# read: row count, NULL count of the added column (v1 rows must be
# ALL null there — a default-filled or garbage backfill flips the
# hash), and exact key/om sums the DuckDB oracle recomputes from the
# raw table. Scale: reconciliation is a projection folded into the
# scan; historical versions are never rewritten.

def _schema_evolution_audit(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from ..sources.io import load_table
    from ..sources.versioned import (
        read_version_evolved, write_version,
    )

    o = load_table(spark, sf, "orders")
    k = F.col("o_orderkey")
    v1_df = o.filter(k % 3 == 0).select(
        k.alias("id"), (k * 2).alias("k2"))
    v2_df = o.filter(k % 3 == 1).select(
        k.alias("id"), (k * 2).alias("k2"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long").alias("om"),
    )
    root = tempfile.mkdtemp(prefix="schema_evo_")
    write_version(v1_df, root)
    write_version(v2_df, root)
    evolved = (
        read_version_evolved(spark, root, 1)
        .withColumn("version", F.lit(1))
        .unionByName(
            read_version_evolved(spark, root, 2)
            .withColumn("version", F.lit(2)))
    )
    return evolved.groupBy("version").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("om").isNull().cast("int")).cast("long")
        .alias("n_null_om"),
        F.sum("k2").cast("long").alias("sum_k2"),
        F.sum(F.coalesce("om", F.lit(0))).cast("long").alias("sum_om"),
    )


_SCHEMA_EVO_SQL = """
SELECT 1 AS version,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(*) AS BIGINT) AS n_null_om,
  CAST(SUM(o_orderkey * 2) AS BIGINT) AS sum_k2,
  CAST(0 AS BIGINT) AS sum_om
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 2,
  CAST(COUNT(*) AS BIGINT),
  CAST(0 AS BIGINT),
  CAST(SUM(o_orderkey * 2) AS BIGINT),
  CAST(SUM(year(o_orderdate) * 12 + month(o_orderdate)) AS BIGINT)
FROM orders WHERE o_orderkey % 3 = 1
"""

register(QuerySpec(
    "schema_evolution_audit", _schema_evolution_audit, _SCHEMA_EVO_SQL,
    "schema-on-read time travel: a column added in v2 reconciles to "
    "typed NULLs when v1 is read under the current schema — evolved "
    "reads of both physically-landed versions profiled and "
    "value-oracled against the raw table",
    ("versioned", "storage", "agg"),
))


# --- mor_delete_audit: merge-on-read delete resolution (round-9) -----------
# The GDPR-purge path at 100 TB: deletes publish TOMBSTONES (cost =
# |keys|), reads resolve base-minus-keys, waves stack, and time
# travel sees each wave's view. This query lands orders as a
# materialized version, publishes two stacked MOR delete waves
# (custkey % 7 == 0, then orderkey % 10 == 3), reads the resolved
# CURRENT view through read_version_mor, and profiles it per order
# priority with exact key/cents sums the DuckDB oracle recomputes
# from the raw table by applying the same two predicates. A wrong
# chain walk, a tombstone wave dropped or double-applied, or an
# anti-join on the wrong key grain flips the hash.

def _mor_delete_audit(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from ..sources import mor as M
    from ..sources import versioned as Vv
    from ..sources.io import load_table

    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="mor_audit_")
    Vv.write_version(o, root)
    M.delete_keys_mor(
        spark, root,
        o.filter(F.col("o_custkey") % 7 == 0).select("o_orderkey"),
        ("o_orderkey",),
    )
    M.delete_keys_mor(
        spark, root,
        o.filter(F.col("o_orderkey") % 10 == 3).select("o_orderkey"),
        ("o_orderkey",),
    )
    resolved = M.read_version_mor(spark, root)
    return resolved.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("o_orderkey").cast("long").alias("sum_keys"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


_MOR_SQL = """
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS sum_cents
FROM orders
WHERE o_custkey % 7 <> 0 AND o_orderkey % 10 <> 3
GROUP BY 1
"""

register(QuerySpec(
    "mor_delete_audit", _mor_delete_audit, _MOR_SQL,
    "merge-on-read deletes resolved: two stacked tombstone waves "
    "(publish cost = |keys|) anti-joined off the base scan in one "
    "broadcast, per-priority census value-oracled against the raw "
    "table under the same predicates",
    ("versioned", "storage", "agg"),
))
