"""Temporal join operators Spark lacks natively: as-of join and
bounded range join.

As-of join (for each left row, the latest right row at-or-before its
timestamp, per key) is implemented with the union-tag + running
last_value window pattern: one shuffle on (key), one sort on (ts) —
no per-group Python, no merge_asof UDF. This is the plan that scales:
at 100 TB both inputs shuffle once by key and the window is a single
pass per partition.

Range join (left rows matched to right rows within [ts, ts+horizon])
uses an equi-join on key + range filter; when keys are low-cardinality
the scale path is time-bucketing (join on (key, time_bucket) with the
horizon spanning <=2 buckets) — provided via ``bucket_minutes``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    suffix: str = "_asof",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row: the most recent right row with
    right_ts <= left_ts, per key. Left rows with no prior right row
    keep nulls. Columns from right come back suffixed.

    Union both sides tagged, sort by (ts, is_left) within key — right
    rows sort before left rows at equal ts so an exact-tie matches —
    then last_value(payload, ignorenulls) over the running window
    carries the latest right payload onto each left row.
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__is_left", F.lit(1))
    rt = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__p_{c}") for c in right_payload],
    )
    # align schemas for the union
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    unioned = lt.select(*sorted(lt.columns)).unionByName(rt.select(*sorted(rt.columns)))

    order = [F.col("__ts"), F.col("__is_left")] + [F.col(c) for c in (tiebreak or [])]
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
    )
    out_cols = [c for c in left.columns] + [f"{c}{suffix}" for c in right_payload]
    return carried.filter(F.col("__is_left") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    horizon_seconds: int,
    bucket_minutes: int | None = None,
) -> DataFrame:
    """Pairs (left, right) with same key and
    left_ts <= right_ts <= left_ts + horizon. With ``bucket_minutes``
    the join adds a time-bucket equi-key (right exploded into the <=2
    buckets it can answer) so Catalyst gets a tight hash join even on
    skewed keys."""
    l_ms = F.unix_millis(F.col(left_ts))
    r_ms = F.unix_millis(F.col(right_ts))
    cond_range = (r_ms >= l_ms) & (r_ms <= l_ms + horizon_seconds * 1000)
    if bucket_minutes is None:
        lt, rt = left.alias("l"), right.alias("r")
        return lt.join(
            rt,
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.unix_millis(F.col(f"r.{right_ts}")) >= F.unix_millis(F.col(f"l.{left_ts}")))
            & (
                F.unix_millis(F.col(f"r.{right_ts}"))
                <= F.unix_millis(F.col(f"l.{left_ts}")) + horizon_seconds * 1000
            ),
        )
    bucket_ms = bucket_minutes * 60 * 1000
    lt = left.withColumn("__bk", (F.unix_millis(F.col(left_ts)) / bucket_ms).cast("long")).alias("l")
    n_spill = horizon_seconds * 1000 // bucket_ms + 1
    rt = (
        right.withColumn(
            "__bk",
            F.explode(F.array(*[
                ((F.unix_millis(F.col(right_ts)) / bucket_ms).cast("long") - i)
                for i in range(n_spill + 1)
            ])),
        )
        .alias("r")
    )
    return (
        lt.join(rt, (F.col(f"l.{key}") == F.col(f"r.{key}")) & (F.col("l.__bk") == F.col("r.__bk")))
        .filter(
            (F.unix_millis(F.col(f"r.{right_ts}")) >= F.unix_millis(F.col(f"l.{left_ts}")))
            & (
                F.unix_millis(F.col(f"r.{right_ts}"))
                <= F.unix_millis(F.col(f"l.{left_ts}")) + horizon_seconds * 1000
            )
        )
        .drop("__bk")
    )
