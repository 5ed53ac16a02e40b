"""Stream-stream joins: the Structured Streaming feature family the
reference never reached (its consume_jobs.py is a single-stream
pipeline), required for online attribution at 100 TB/day rates.

Spark buffers both sides in watermark-bounded state and emits matches
as they become provable; the interval condition below bounds state to
(rate x horizon) per side — without the time bounds a stream-stream
join would buffer forever (Spark rejects it in append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_click_purchase_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each streaming purchase to the same user's clicks within
    ``horizon`` before it (the streaming twin of the batch range join
    in plans/temporal_queries.py).

    clicks needs (c_user_id, click_id, click_ts); purchases needs
    (user_id, purchase_id, ts). Both get watermarks so the state store
    can expire buffered rows once the other side can no longer match.
    """
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("ts", watermark)
    return p.join(
        c,
        F.expr(
            f"user_id = c_user_id AND "
            f"click_ts >= ts - INTERVAL {horizon} AND click_ts <= ts"
        ),
        "inner",
    ).select("user_id", "purchase_id", "ts", "click_id", "click_ts")


def stream_purchase_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every purchase emits, attributed
    to clicks when one exists in the horizon, with NULL click columns
    otherwise — the "organic vs attributed" split a marketing pipeline
    needs online.

    Outer semantics under watermarks are the subtle part: the
    unmatched (NULL) row for a purchase is NOT emitted when the
    micro-batch sees no match — it can only be emitted once the
    watermark proves no future click can arrive inside the interval,
    i.e. null results trail the event time by the watermark delay.
    State stays bounded exactly as in the inner join.
    """
    c = clicks.withWatermark("click_ts", watermark)
    p = purchases.withWatermark("ts", watermark)
    return p.join(
        c,
        F.expr(
            f"user_id = c_user_id AND "
            f"click_ts >= ts - INTERVAL {horizon} AND click_ts <= ts"
        ),
        "left_outer",
    ).select("user_id", "purchase_id", "ts", "click_id", "click_ts")
