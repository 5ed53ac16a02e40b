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


SESSION_GAP_MS = 30 * 60 * 1000


def session_windows_stream(
    events: DataFrame,
    gap_ms: int = SESSION_GAP_MS,
    delay: str = "30 seconds",
) -> DataFrame:
    """Per-session rows (user_id, session_start, n_events) via
    ``F.session_window`` — the streaming face of the batch lag-chain
    sessionization (``events_sessionization`` /
    ``events_session_spans``).

    Boundary calibration: ``session_window`` merges on OVERLAP of
    half-open ``[ts, ts + gap)`` intervals, so a successor exactly
    ``gap`` later starts a NEW session — while the batch chain rule
    splits only on ``diff > gap``. Passing ``gap_ms + 1`` as the
    window gap makes overlap-at-``gap_ms`` merge and
    ``gap_ms + 1`` split: exactly the batch strict-``>`` threshold.
    Sessions finalize in append mode once the watermark passes the
    merged window end (last event + gap); state is one open session
    per active user inside the horizon."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(
            F.session_window("ts", f"{gap_ms + 1} milliseconds"), "user_id"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


def session_windows_batch(
    events: DataFrame, gap_ms: int = SESSION_GAP_MS
) -> DataFrame:
    """Batch twin: lag-flag + running-sum session ids, then one
    aggregation per (user, session) — two window passes and one
    shuffle, all on the same user_id key."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis(F.col("ts"))
    new_s = F.when(
        F.lag(ms).over(w).isNull() | (ms - F.lag(ms).over(w) > gap_ms), 1
    ).otherwise(0)
    sess = events.withColumn(
        "__sid", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "__sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select("user_id", "session_start", "last_ts", "n_events")
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
