"""Streaming twins of the batch event-hygiene ops (round-6 additions
``events_debounce`` and ``events_sliding_distinct_users``).

The batch twins are the SPEC — each streaming operator here carries an
AvailableNow-drain equivalence test against its batch twin on the same
fixture (tests/test_event_hygiene_stream.py), the discipline
``streaming/dedup_stream.py`` established.

Debounce semantics note (verified against the Spark 4.1 bytecode of
``BaseStreamingDeduplicateExec``/``StreamingDeduplicateWithinWatermarkExec``):
``dropDuplicatesWithinWatermark`` stores ``expiresAt = firstSeen +
delay`` and does NOT extend expiry when a duplicate is dropped — burst
ANCHOR semantics. The batch twin filters on ``lag`` gaps — burst CHAIN
semantics. The two coincide exactly when every burst spans <= delay
and consecutive bursts are separated by > delay (the regime debouncing
is FOR: double-clicks, retries, at-least-once replays are
sub-threshold bursts by definition); the equivalence fixture pins that
regime, and additionally spaces bursts > 2x delay apart so the global
watermark provably evicts the previous anchor before the next burst
arrives (eviction lags by one delay behind max event time).

Sliding distinct users is the chained-stateful-aggregation shape
(multiple stateful operators, Spark 3.4+): a per-(window, user) count
whose APPEND-mode finalization feeds a second aggregation grouped on
the window struct itself — the streaming face of the batch
dedupe-then-count plan, where both aggregations share the window key.

Scale: debounce state is one row per active (user, type) anchor inside
the watermark horizon — bounded by key cardinality, not event volume;
sliding-distinct state is (windows-in-horizon x active users), and the
append barrier between the two aggregations is the same map-side
pre-aggregation the batch plan uses. At 100 TB/day both are
shuffle-once-per-level on the same keys the batch twins shuffle on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEBOUNCE_DELAY = "30 seconds"
_DEBOUNCE_US = 30_000_000


def debounce_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    delay: str = DEBOUNCE_DELAY,
) -> DataFrame:
    """Keep only burst heads of a streaming event frame: the first
    event per key opens an anchor, events within ``delay`` of it are
    dropped, and the anchor retires once the watermark passes
    ``first_ts + delay``."""
    return events.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def debounce_batch(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    tolerance_us: int = _DEBOUNCE_US,
) -> DataFrame:
    """Batch twin (the ``events_debounce`` lag-chain shape,
    plans/events_queries.py): keep rows whose gap to the previous
    same-key event exceeds the tolerance."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, "event_id")
    us = F.unix_micros(F.col(ts_col))
    gap = us - F.lag(us).over(w)
    return events.withColumn("__gap", gap).filter(
        F.col("__gap").isNull() | (F.col("__gap") > tolerance_us)
    ).drop("__gap")


def sliding_distinct_users_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    delay: str = "30 seconds",
) -> DataFrame:
    """Exact distinct users (and event count) per sliding window,
    streaming: watermarked per-(window, user) counts chained into a
    per-window aggregation grouped on the window struct — windows
    finalize in append mode once the watermark passes their end."""
    per_user = (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", window, slide), "user_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        per_user.groupBy("window")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_users"),
            F.sum("__n").cast("long").alias("n_events"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_distinct_users",
            "n_events",
        )
    )


def sliding_distinct_users_batch(
    events: DataFrame,
    slide_us: int = 15 * 60 * 1_000_000,
    win_slices: int = 4,
) -> DataFrame:
    """Batch twin (the ``events_sliding_distinct_users``
    dedupe-then-count shape, plans/events_queries.py)."""
    slice_idx = F.expr(f"unix_micros(ts) div {slide_us}")
    win = events.select(
        "user_id",
        F.explode(
            F.sequence(slice_idx - win_slices + 1, slice_idx)
        ).alias("win_idx"),
    )
    per_user = win.groupBy("win_idx", "user_id").agg(
        F.count(F.lit(1)).alias("__n")
    )
    return (
        per_user.groupBy("win_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_users"),
            F.sum("__n").cast("long").alias("n_events"),
        )
        .select(
            F.timestamp_micros(F.col("win_idx") * slide_us).alias(
                "window_start"
            ),
            "n_distinct_users",
            "n_events",
        )
    )
