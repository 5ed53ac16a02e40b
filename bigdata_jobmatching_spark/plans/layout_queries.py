"""Warehouse-layout queries: zone-map (min/max) pruning audit.

The 100 TB question behind every layout decision — Z-order, sort
keys, partitioning — is "how many row groups does a typical predicate
let the scanner SKIP?". Parquet/ORC readers prune a row group when
its column min/max range misses the predicate range; how well that
works is purely a property of how the sort key correlates with the
filter column. This module measures it directly: value-aligned zones
(the row groups a writer would produce under each layout) get
per-zone min/max over the filter column, and the audit counts zones
and rows a range predicate would actually touch.

Two layouts over ``lineitem`` for a 2-month ``l_shipdate`` window:

- ``ingest``: zones of 512 consecutive order keys (~2k lineitems,
  a parquet-row-group-sized block) — the layout a stream of order
  ingests produces. Order keys are uncorrelated with ship dates
  across the multi-year span, so EVERY zone's min/max straddles the
  2-month window: zone maps prune nothing (measured at sf0.01:
  30/30 zones, all 60k rows scanned for 1.5k matches).
- ``shipdate_week``: weekly shipdate zones — the layout a
  ``sortWithinPartitions(l_shipdate)`` writer produces. The same
  predicate touches only the ~9 overlapping weeks (measured:
  9/358 zones, 1518 rows scanned for the same 1474 matches — a
  40x scan reduction from the sort key alone).

Both sides are pure two-level aggregations (row -> zone -> layout):
no global sort, no window, one shuffle per layout at zone grain —
the audit itself runs at 100 TB. The DuckDB oracle recomputes both
layouts arithmetically; rows_matching must be identical across
layouts (layout changes WHERE data sits, never WHAT matches) — a
self-consistency the hash also pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.io import load_table
from .catalog import QuerySpec, register

_ZONE_ORDERS = 512    # order keys per ingest zone (~2k lineitems)
_ZONE_DAYS = 7        # days per shipdate-clustered zone
_LO = "1997-03-01"    # predicate window [lo, hi)
_HI = "1997-05-01"


def _zone_summary(
    base: DataFrame, zone_col, layout: str, lo_d: int, hi_d: int
) -> DataFrame:
    zones = base.groupBy(zone_col.alias("z")).agg(
        F.min("d").alias("zmin"),
        F.max("d").alias("zmax"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when((F.col("d") >= lo_d) & (F.col("d") < hi_d), 1).otherwise(0)
        ).alias("n_match"),
    )
    scanned = (F.col("zmin") < hi_d) & (F.col("zmax") >= lo_d)
    return zones.agg(
        F.lit(layout).alias("layout"),
        F.count(F.lit(1)).cast("long").alias("n_zones"),
        F.sum(scanned.cast("int")).cast("long").alias("n_zones_scanned"),
        F.sum("n_rows").cast("long").alias("rows_total"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
        .cast("long").alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matching"),
    )


def _zonemap_audit(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    base = li.select(
        "l_orderkey",
        F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")).alias("d"),
    )
    lo_d = __import__("datetime").date.fromisoformat(_LO).toordinal() - 719163
    hi_d = __import__("datetime").date.fromisoformat(_HI).toordinal() - 719163
    ingest = _zone_summary(
        base, F.expr(f"l_orderkey div {_ZONE_ORDERS}"), "ingest", lo_d, hi_d
    )
    clustered = _zone_summary(
        base, F.expr(f"d div {_ZONE_DAYS}"), "shipdate_week", lo_d, hi_d
    )
    return ingest.unionByName(clustered)


_ZONEMAP_SQL = f"""
WITH base AS (
  SELECT l_orderkey,
    datediff('day', DATE '1970-01-01', l_shipdate) AS d
  FROM lineitem
),
bounds AS (
  SELECT datediff('day', DATE '1970-01-01', DATE '{_LO}') AS lo_d,
         datediff('day', DATE '1970-01-01', DATE '{_HI}') AS hi_d
),
za AS (
  SELECT l_orderkey // {_ZONE_ORDERS} AS z, MIN(d) AS zmin, MAX(d) AS zmax,
    COUNT(*) AS n_rows,
    SUM(CASE WHEN d >= (SELECT lo_d FROM bounds)
              AND d < (SELECT hi_d FROM bounds) THEN 1 ELSE 0 END) AS n_match
  FROM base GROUP BY 1
),
zb AS (
  SELECT d // {_ZONE_DAYS} AS z, MIN(d) AS zmin, MAX(d) AS zmax,
    COUNT(*) AS n_rows,
    SUM(CASE WHEN d >= (SELECT lo_d FROM bounds)
              AND d < (SELECT hi_d FROM bounds) THEN 1 ELSE 0 END) AS n_match
  FROM base GROUP BY 1
)
SELECT 'ingest' AS layout,
  CAST(COUNT(*) AS BIGINT) AS n_zones,
  CAST(SUM(CASE WHEN zmin < (SELECT hi_d FROM bounds)
                 AND zmax >= (SELECT lo_d FROM bounds)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_zones_scanned,
  CAST(SUM(n_rows) AS BIGINT) AS rows_total,
  CAST(SUM(CASE WHEN zmin < (SELECT hi_d FROM bounds)
                 AND zmax >= (SELECT lo_d FROM bounds)
            THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
  CAST(SUM(n_match) AS BIGINT) AS rows_matching
FROM za
UNION ALL
SELECT 'shipdate_week',
  CAST(COUNT(*) AS BIGINT),
  CAST(SUM(CASE WHEN zmin < (SELECT hi_d FROM bounds)
                 AND zmax >= (SELECT lo_d FROM bounds)
            THEN 1 ELSE 0 END) AS BIGINT),
  CAST(SUM(n_rows) AS BIGINT),
  CAST(SUM(CASE WHEN zmin < (SELECT hi_d FROM bounds)
                 AND zmax >= (SELECT lo_d FROM bounds)
            THEN n_rows ELSE 0 END) AS BIGINT),
  CAST(SUM(n_match) AS BIGINT)
FROM zb
"""

register(QuerySpec(
    "zonemap_pruning_audit", _zonemap_audit, _ZONEMAP_SQL,
    "zone-map (row-group min/max) pruning audit: rows/zones a 2-month "
    "shipdate predicate touches under ingest-order vs "
    "shipdate-clustered layouts — the measured value of a sort key",
    ("layout", "agg", "warehouse", "bench"),
))


# --- manifest_pruning_audit: file-level skipping, physically -------------
#
# zonemap_pruning_audit SIMULATES row-group pruning arithmetically;
# this query runs the real thing end-to-end through the manifest
# machinery (sources/manifest.py): it lands `orders` as a versioned
# table hive-partitioned by order month (one leaf file per month — the
# hash repartition on the partition column puts each month's rows in
# exactly one task, so each month dir gets exactly one file), collects
# per-file min/max o_orderdate from the parquet FOOTERS into
# _MANIFEST.json, plans a 2-month range scan through read_pruned, and
# emits both the answer (row count + exact cents sum) computed from
# the PRUNED scan and the file economics (files_total, files_read).
#
# The DuckDB oracle recomputes everything from the raw table: the
# answer from a full scan (pruning must never change it — the hash
# pins answer-preservation), and the economics arithmetically (a
# month-file is read iff its min/max o_orderdate span overlaps the
# predicate — with month grain that is exactly the months
# intersecting the window, but the oracle states the footer rule, not
# the shortcut). At 100 TB this is the manifest's whole value: the
# plan touches len(keep) files after ONE small-object read, instead
# of footer-probing every file in the version.

_MAN_LO = "1997-03-01"   # closed BETWEEN window,2 months
_MAN_HI = "1997-04-30"


def _manifest_pruning_audit(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile

    from ..sources.manifest import read_pruned, write_version_with_manifest

    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice",
    ).withColumn(
        "om",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).cast("int"),
    )
    root = tempfile.mkdtemp(prefix="manifest_audit_")
    # repartition ON the partition column -> each month in one task ->
    # exactly one leaf file per month dir (deterministic layout the
    # oracle can reason about)
    write_version_with_manifest(
        orders.repartition("om"), root,
        stats_cols=("o_orderdate",), partition_by=("om",),
    )
    pruned, files_total, files_read = read_pruned(
        spark, root, "o_orderdate", _MAN_LO, _MAN_HI,
    )
    return pruned.filter(
        F.col("o_orderdate").between(_MAN_LO, _MAN_HI)
    ).agg(
        F.lit(files_total).cast("long").alias("files_total"),
        F.lit(files_read).cast("long").alias("files_read"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("sum_price_cents"),
    )


_MANIFEST_SQL = f"""
WITH files AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS om,
         MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mx
  FROM orders GROUP BY 1
),
econ AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS files_total,
         CAST(SUM(CASE WHEN mx < DATE '{_MAN_LO}'
                         OR mn > DATE '{_MAN_HI}'
                  THEN 0 ELSE 1 END) AS BIGINT) AS files_read
  FROM files
),
answer AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_price_cents
  FROM orders
  WHERE o_orderdate BETWEEN DATE '{_MAN_LO}' AND DATE '{_MAN_HI}'
)
SELECT files_total, files_read, n_orders, sum_price_cents
FROM econ, answer
"""

register(QuerySpec(
    "manifest_pruning_audit", _manifest_pruning_audit, _MANIFEST_SQL,
    "manifest file-skipping run physically: orders landed as a "
    "month-partitioned version with footer-stats manifest, a 2-month "
    "range scan planned through read_pruned — answer (vs full-scan "
    "oracle) AND file economics hash-pinned",
    ("layout", "manifest", "warehouse", "storage"),
))


# --- bloom_point_lookup_audit: Bloom file-skipping, physically (r10) --------
# manifest_pruning_audit proves RANGE skipping off footer min/max;
# point lookups on a high-cardinality key need the membership
# summary instead — the Delta/Iceberg bloom-filter-index shape. This
# query runs it physically: customer lands as a versioned table
# hive-partitioned into 16 key-residue files, each carrying a
# per-file Bloom bitset over c_custkey in _MANIFEST.json
# (sources/manifest.py: k=3 integer-arithmetic probes into m=16384
# bits — a hash family an external SQL engine reproduces bit for
# bit); a FIXED 5-key probe panel (present and absent keys) is then
# planned through read_point_pruned, and the result pins per probe
# BOTH the answer (hit count + exact cents, pruning must never
# change them) and the file economics (files_read out of 16 — the
# no-false-negative floor plus measured false positives).
#
# The DuckDB oracle recomputes every Bloom bit from the same
# arithmetic, derives the exact skip decision per (probe, file), and
# the answer from base — a flipped bit anywhere in the writer, the
# reader, or the probe arithmetic flips the gate hash. At 100 TB
# this is the difference between touching k files and touching all
# of them for every "find this key" lookup a pipeline issues.

_BLOOM_PROBES = (3, 14, 159, 2653, 58979)
_BLOOM_NFILES = 16


def _bloom_lookup_audit(spark: SparkSession, sf: str) -> DataFrame:
    import tempfile
    from functools import reduce

    from ..sources.manifest import read_point_pruned, write_version_with_blooms

    cust = load_table(spark, sf, "customer").select(
        "c_custkey", "c_acctbal",
    ).withColumn("cg", (F.col("c_custkey") % _BLOOM_NFILES).cast("int"))
    root = tempfile.mkdtemp(prefix="bloom_audit_")
    write_version_with_blooms(
        cust.repartition("cg"), root,
        stats_cols=("c_custkey",), bloom_cols=("c_custkey",),
        partition_by=("cg",),
    )
    outs = []
    for pk in _BLOOM_PROBES:
        pruned, files_total, files_read = read_point_pruned(
            spark, root, "c_custkey", pk)
        outs.append(
            pruned.filter(F.col("c_custkey") == pk).agg(
                F.lit(pk).cast("long").alias("probe_key"),
                F.lit(files_total).cast("long").alias("files_total"),
                F.lit(files_read).cast("long").alias("files_read"),
                F.count(F.lit(1)).cast("long").alias("n_hits"),
                F.coalesce(
                    F.sum(F.round(F.col("c_acctbal") * 100).cast("long")),
                    F.lit(0)).cast("long").alias("acct_cents"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


_BLOOM_PROBE_VALUES = ", ".join(f"({p})" for p in _BLOOM_PROBES)

_BLOOM_SQL = f"""
WITH probes(pk) AS (VALUES {_BLOOM_PROBE_VALUES}),
salts(a) AS (VALUES (12345), (999331), (7654321)),
fbits AS (
  SELECT DISTINCT c_custkey % {_BLOOM_NFILES} AS cg,
    ((c_custkey * 2654435761 + a) % 2147483648) % 16384 AS b
  FROM customer, salts
),
pbits AS (
  SELECT DISTINCT pk,
    ((pk * 2654435761 + a) % 2147483648) % 16384 AS b
  FROM probes, salts
),
need AS (SELECT pk, COUNT(*) AS nb FROM pbits GROUP BY 1),
have AS (
  SELECT pb.pk, fb.cg, COUNT(DISTINCT pb.b) AS nhit
  FROM pbits pb JOIN fbits fb ON fb.b = pb.b
  GROUP BY 1, 2
),
econ AS (
  SELECT n.pk,
    CAST(COUNT(CASE WHEN h.nhit = n.nb THEN 1 END) AS BIGINT)
      AS files_read
  FROM need n LEFT JOIN have h ON h.pk = n.pk
  GROUP BY 1
),
total AS (
  SELECT CAST(COUNT(DISTINCT c_custkey % {_BLOOM_NFILES}) AS BIGINT)
    AS files_total
  FROM customer
),
answer AS (
  SELECT p.pk,
    CAST(COUNT(c.c_custkey) AS BIGINT) AS n_hits,
    CAST(COALESCE(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)), 0)
         AS BIGINT) AS acct_cents
  FROM probes p LEFT JOIN customer c ON c.c_custkey = p.pk
  GROUP BY 1
)
SELECT CAST(e.pk AS BIGINT) AS probe_key, t.files_total, e.files_read,
  a.n_hits, a.acct_cents
FROM econ e JOIN answer a ON a.pk = e.pk CROSS JOIN total t
"""

register(QuerySpec(
    "bloom_point_lookup_audit", _bloom_lookup_audit, _BLOOM_SQL,
    "per-file Bloom index run physically: customer landed as 16 "
    "key-residue files with integer-arithmetic Bloom bitsets in the "
    "manifest, a fixed probe panel planned through read_point_pruned "
    "— answer preservation AND file-skip economics hash-pinned "
    "against an oracle that recomputes every bit",
    ("layout", "manifest", "warehouse", "storage"),
))
