"""Custom stateful streaming: session_window + applyInPandasWithState."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_jobmatching_spark.sources.io import load_table
from bigdata_jobmatching_spark.streaming.stateful import (
    native_session_counts,
    stateful_user_stats,
)


def _event_stream(spark, sf_dir, tmp_path):
    # re-land a slice of events as parquet the stream can read with a
    # clean (non-nanos) schema
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    src = str(tmp_path / "events_src")
    ev.write.mode("overwrite").parquet(src)
    return spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)


def test_native_session_window_stream(spark, sf_dir, tmp_path):
    stream = _event_stream(spark, sf_dir, tmp_path)
    q = (
        native_session_counts(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("sessions_out")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # single drained batch: windows at/behind the watermark have closed
    out = spark.sql("SELECT * FROM sessions_out")
    batch = load_table(spark, sf_dir, "events")
    # sanity: session counts sum to at most total events, sessions are
    # per-user with start <= end
    rows = out.collect()
    assert rows, "no closed sessions emitted"
    assert all(r.session_start <= r.session_end and r.n_events >= 1 for r in rows)


def test_apply_in_pandas_with_state(spark, sf_dir, tmp_path):
    stream = _event_stream(spark, sf_dir, tmp_path)
    q = (
        stateful_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory").queryName("user_stats_out")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = {r.user_id: r for r in spark.sql(
        "SELECT * FROM user_stats_out"
    ).collect()}
    # final state must equal the batch ground truth per user
    truth = {
        r.user_id: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_millis("ts")).alias("first_ms"),
            F.max(F.unix_millis("ts")).alias("last_ms"),
        )
        .collect()
    }
    assert set(out) == set(truth)
    for uid, t in truth.items():
        o = out[uid]
        assert o.n_events == t.n_events
        assert o.first_ms == t.first_ms and o.last_ms == t.last_ms
