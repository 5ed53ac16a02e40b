"""Custom stateful streaming operators.

Two session-aggregation paths over the offer/event stream:

1. ``native_session_counts`` — Spark's built-in ``session_window``
   (gap-based), the preferred form: state managed by the engine,
   watermark-bounded, no Python.
2. ``stateful_user_stats`` — ``applyInPandasWithState``: the escape
   hatch for semantics the built-ins can't express (here: a running
   per-user profile with custom merge logic — count, value sum, and
   the first/last event times — emitted per batch). Demonstrates the
   GroupState contract: timeout handling, state schema, Arrow batches.

At scale both shuffle once on the grouping key; state size is bounded
by (active keys x state row width), independent of history length.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_events long, total_value double, first_ms long, last_ms long"
OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_value double, first_ms long, last_ms long"
)


def native_session_counts(events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour") -> DataFrame:
    """Gap-based sessionization with engine-managed state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def _update_user_stats(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, first_ms, last_ms = state.get
    else:
        n, total, first_ms, last_ms = 0, 0.0, None, None
    for pdf in pdfs:
        ms = pdf["ms"]
        n += len(pdf)
        total += float(pdf["value"].sum())
        lo, hi = int(ms.min()), int(ms.max())
        first_ms = lo if first_ms is None else min(first_ms, lo)
        last_ms = hi if last_ms is None else max(last_ms, hi)
    state.update((n, total, first_ms, last_ms))
    yield pd.DataFrame([{
        "user_id": user_id, "n_events": n, "total_value": total,
        "first_ms": first_ms, "last_ms": last_ms,
    }])


def stateful_user_stats(events: DataFrame) -> DataFrame:
    """Running per-user profile via applyInPandasWithState. Input needs
    (user_id, ts timestamp, value double); emits the updated profile
    for each user seen in each micro-batch."""
    prepped = events.select(
        "user_id", F.unix_millis("ts").alias("ms"), "value", "ts"
    ).withWatermark("ts", "1 hour")
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESSION_OUT = (
    "user_id bigint, n_events bigint, total_value double, closed boolean"
)
_SESSION_STATE = "n bigint, total double, last_ms bigint"

_SESSION_GAP_MS = 30 * 60 * 1000


def _session_emit(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total, _last = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "n_events": n,
            "total_value": total, "closed": True,
        }])
        return
    n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_ms = max(last_ms, int(pdf["ms"].max()))
    state.update((n, total, last_ms))
    # close the session once the event-time watermark passes
    # last-activity + gap: the state store, not the caller, decides
    # when a session is final.
    state.setTimeoutTimestamp(last_ms + _SESSION_GAP_MS)
    yield pd.DataFrame([{
        "user_id": user_id, "n_events": n,
        "total_value": total, "closed": False,
    }])


def stateful_sessions_with_ttl(events: DataFrame) -> DataFrame:
    """Session aggregation with EVENT-TIME TTL: per-user counters that
    EMIT a final ``closed=true`` row when the watermark passes
    last-activity + 30 min (GroupStateTimeout.EventTimeTimeout). This
    is the custom-operator form of session_window for session logic
    the built-in cannot express (e.g. emit-on-close side effects);
    state size tracks active users, bounded by the watermark."""
    prepped = events.select(
        "user_id", F.unix_millis("ts").alias("ms"), "value", "ts"
    ).withWatermark("ts", "1 hour")
    return prepped.groupBy("user_id").applyInPandasWithState(
        _session_emit,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# --- transformWithStateInPandas: streaming token-budget gate --------------
# The Spark-4 arbitrary-state API (SPARK-49564): typed state handles
# (ValueState here), explicit time modes, RocksDB-backed state. This
# operator is the STREAMING twin of the batch token_budget_selection
# query: docs arrive continuously, each source accumulates a running
# token tally in state, and every doc is emitted with its cumulative
# position and an accepted flag (tally <= budget). At scale: one
# shuffle on source per micro-batch; state is one long per source,
# independent of stream length.

_BUDGET_OUT = (
    "source string, doc_id long, n_tokens long, cum_tokens long, accepted boolean"
)


class _TokenBudgetProcessor:
    """StatefulProcessor emitting per-doc budget decisions.

    Defined lazily (plain class + dynamic base) so importing this
    module never hard-depends on the Spark-4-only API surface."""

    def __init__(self, budget: int):
        self._budget = budget

    def init(self, handle) -> None:
        self._state = handle.getValueState("cum_tokens", "tokens long")

    def handleInputRows(self, key, rows, timerValues):
        cum = self._state.get()[0] if self._state.exists() else 0
        out = []
        # Deterministic intra-batch order: concatenate ALL Arrow chunks
        # first, then one global sort by doc_id — sorting each chunk
        # independently would make the cumulative tally (and the
        # accepted flag near the budget boundary) depend on where the
        # runtime happened to split the micro-batch into chunks.
        chunks = list(rows)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("doc_id")
            for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tokens"]):
                cum += int(n_tok)
                out.append((key[0], int(doc_id), int(n_tok), cum, cum <= self._budget))
        self._state.update((cum,))
        yield pd.DataFrame(
            out, columns=["source", "doc_id", "n_tokens", "cum_tokens", "accepted"]
        )

    def close(self) -> None:
        pass


def streaming_token_budget(docs: DataFrame, budget: int = 100_000) -> DataFrame:
    """Per-source running token budget via transformWithStateInPandas.

    Input needs (doc_id long, source string, n_tokens long). Emits one
    row per doc with the post-doc cumulative tally and whether it fit
    the budget. Requires the RocksDB state store provider (set here;
    harmless for batch).

    ENV-GATED EXECUTION: the transformWithState state protocol speaks
    protobuf between the JVM and the Python worker, and this container
    has no google.protobuf — the e2e test skips when it's absent. The
    processor logic itself is exercised by a fake-state unit test, and
    this wrapper pins the full invocation shape (output schema, time
    mode, provider conf)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    spark = docs.sparkSession
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    proc = type(
        "TokenBudgetProcessor", (_TokenBudgetProcessor, StatefulProcessor), {}
    )(budget)
    return docs.groupBy("source").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_BUDGET_OUT,
        outputMode="append",
        timeMode="none",
    )


# --- streaming LOCF gap fill (round-10) -------------------------------------
# The streaming face of events_gapfill_ffill's densification: a
# sparse per-series observation stream is emitted DENSE — every slot
# between consecutive observations appears exactly once, gaps carry
# the last observation forward — with the carry state persisting
# ACROSS micro-batches in GroupState (last slot + last value per
# series, a 2-int state row whatever the history length). Built-in
# windows cannot express "emit rows for slots that have no input
# row", which is exactly the applyInPandasWithState escape hatch's
# job. Input rows must arrive in slot order per series (the upstream
# hourly aggregation + file-source ordering provides this; stale
# rows at or before the state's slot are DROPPED, counted nowhere —
# document-and-drop beats silently corrupting the carry).

_GF_STATE = "last_h long, last_cents long"
_GF_OUT = "event_type string, h long, is_observed long, cents_ffill long"


def _fill_series(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    rows = rows.sort_values("h")
    last_h, last_c = state.get if state.exists else (None, None)
    out = []
    for h, c in zip(rows["h"], rows["cents"]):
        h, c = int(h), int(c)
        if last_h is not None and h <= last_h:
            continue  # stale / duplicate slot: drop, keep the carry
        if last_h is not None:
            for g in range(last_h + 1, h):
                out.append((key[0], g, 0, last_c))
        out.append((key[0], h, 1, c))
        last_h, last_c = h, c
    state.update((last_h, last_c))
    yield pd.DataFrame(
        out, columns=["event_type", "h", "is_observed", "cents_ffill"])


def stream_gapfill_locf(observations: DataFrame) -> DataFrame:
    """Densify a sparse (event_type, h, cents) observation stream:
    emits one row per slot from each series' first observation
    onward, forward-filling gaps — the stream==batch twin of the
    events_gapfill_ffill query (which fills each series' [min, max]
    spine; a drained stream over the same observations emits the
    identical row set)."""
    return observations.groupBy("event_type").applyInPandasWithState(
        _fill_series,
        outputStructType=_GF_OUT,
        stateStructType=_GF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
