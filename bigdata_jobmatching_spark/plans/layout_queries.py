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
