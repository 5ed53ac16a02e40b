"""AvailableNow-drain equivalence of the streaming event-hygiene ops
against their batch twins (round-6 verdict task #4).

The fixture is engineered so the streaming anchor semantics of
``dropDuplicatesWithinWatermark`` and the batch lag-chain semantics
coincide (see streaming/event_hygiene.py docstring): bursts span
<= 28 s < the 30 s tolerance, consecutive same-key bursts sit >= 2
slices (600 s) apart, and every 300 s time slice lands in its own
file processed as its own micro-batch.

Eviction timing (measured, Spark 4.1): a micro-batch matches incoming
rows against state BEFORE its end-of-batch eviction, and that
eviction uses the watermark computed through the PREVIOUS batch — so
an anchor at in-slice offset o survives into batch i+2 unless
``o + delay < maxts(slice i) - delay``. With slice maxima at offset
288, regular keys sit at offsets <= 160 (160 + 30 < 288 - 30); the
slice-closing keys at offset 260 violate that bound by construction,
so they recur every FOUR slices, giving eviction one extra batch.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from bigdata_jobmatching_spark.streaming.event_hygiene import (
    debounce_batch,
    debounce_stream,
    sliding_distinct_users_batch,
    sliding_distinct_users_stream,
)

_BASE_S = 1_704_067_200  # 2024-01-01 00:00:00 UTC
_SLICE_S = 300
_N_SLICES = 8
_BURST_OFFSETS = (0, 5, 12, 28)  # burst span 28 s < 30 s tolerance


_REGULAR_OFFSETS = (40, 100, 160)  # all satisfy o + 30 < 288 - 30
_CLOSER_OFFSET = 260


def _fixture_rows():
    """(event_id, ts_seconds, user_id, event_type) rows: regular keys
    0,2,4 burst in even slices and 1,3,5 in odd slices at in-slice
    offsets 40/100/160 (600 s same-key separation); closer keys c0-c3
    burst at offset 260 in slices {i, i+4} (1200 s separation) so each
    slice's max event time sits at offset 288. user u0 also bursts
    under a second event type to pin key granularity."""
    rows = []
    eid = 0
    for sl in range(_N_SLICES):
        keys = (0, 2, 4) if sl % 2 == 0 else (1, 3, 5)
        for k in keys:
            start = _BASE_S + sl * _SLICE_S + _REGULAR_OFFSETS[k // 2]
            for off in _BURST_OFFSETS:
                rows.append((eid, start + off, f"u{k}", "click"))
                eid += 1
                if k == 0:
                    rows.append((eid, start + off, "u0", "view"))
                    eid += 1
        closer_start = _BASE_S + sl * _SLICE_S + _CLOSER_OFFSET
        for off in _BURST_OFFSETS:
            rows.append((eid, closer_start + off, f"c{sl % 4}", "click"))
            eid += 1
    return rows


def _write_sliced_fixture(spark, tmp_path):
    """One parquet file per time slice, mtimes strictly increasing so
    the file stream (maxFilesPerTrigger=1) replays slices in event-time
    order — the watermark advances between micro-batches."""
    df = spark.createDataFrame(
        _fixture_rows(), "event_id long, sec long, user_id string, event_type string"
    ).select(
        "event_id",
        F.timestamp_seconds("sec").alias("ts"),
        "user_id",
        "event_type",
    )
    src = tmp_path / "events_src"
    src.mkdir()
    for sl in range(_N_SLICES):
        lo = _BASE_S + sl * _SLICE_S
        part_dir = tmp_path / f"__part{sl}"
        (
            df.filter(
                (F.unix_timestamp("ts") >= lo)
                & (F.unix_timestamp("ts") < lo + _SLICE_S)
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(part_dir))
        )
        part_file = next(part_dir.glob("part-*.parquet"))
        dest = src / f"slice_{sl:03d}.parquet"
        shutil.move(str(part_file), str(dest))
        os.utime(dest, (1_700_000_000 + sl, 1_700_000_000 + sl))
    return str(src), df


def _drain(stream_df, tmp_path, name):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _read_stream(spark, src):
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_debounce_stream_matches_batch(spark, tmp_path):
    src, batch_df = _write_sliced_fixture(spark, tmp_path)
    _drain(debounce_stream(_read_stream(spark, src)), tmp_path, "debounce_out")
    got = {
        (r.user_id, r.event_type, r.event_id)
        for r in spark.sql(
            "SELECT user_id, event_type, event_id FROM debounce_out"
        ).collect()
    }
    want = {
        (r.user_id, r.event_type, r.event_id)
        for r in debounce_batch(spark.read.parquet(src)).collect()
    }
    assert got == want
    # sanity: exactly one survivor per burst — 6 regular keys x 4
    # bursts, u0's 4 "view" twin bursts, 4 closer keys x 2 bursts
    n_bursts = 6 * 4 + 4 + 4 * 2
    assert len(want) == n_bursts
    # and the survivors are exactly the burst heads (in-slice offsets
    # 40/100/160/260)
    heads = {
        (r.user_id, r.event_type, r.event_id)
        for r in batch_df.withColumn(
            "off", (F.unix_timestamp("ts") - _BASE_S) % _SLICE_S
        )
        .filter(F.col("off").isin(40, 100, 160, 260))
        .collect()
    }
    assert want == heads


def test_sliding_distinct_stream_matches_batch(spark, tmp_path):
    src, _ = _write_sliced_fixture(spark, tmp_path)
    _drain(
        sliding_distinct_users_stream(_read_stream(spark, src)),
        tmp_path,
        "sliding_out",
    )
    got = {
        (r.window_start, r.n_distinct_users, r.n_events)
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    batch = sliding_distinct_users_batch(spark.read.parquet(src)).collect()
    # only windows the final watermark closed can have been emitted:
    # watermark = max event time - 30 s
    max_ts = _BASE_S + (_N_SLICES - 1) * _SLICE_S + _CLOSER_OFFSET + 28
    wm = max_ts - 30
    closed = {
        (r.window_start, r.n_distinct_users, r.n_events)
        for r in batch
        if r.window_start.timestamp() + 3600 <= wm
    }
    assert got == closed
    assert len(closed) > 0


def test_session_windows_stream_matches_batch(spark, tmp_path):
    """F.session_window with gap_ms + 1 must reproduce the batch
    lag-chain sessions (strict > gap_ms split rule) exactly, for
    every session the final watermark closed. gap 90 s < the 600 s
    same-key burst separation, so each burst is its own session."""
    from bigdata_jobmatching_spark.streaming.event_hygiene import (
        session_windows_batch,
        session_windows_stream,
    )

    gap_ms = 90_000
    src, _ = _write_sliced_fixture(spark, tmp_path)
    _drain(
        session_windows_stream(_read_stream(spark, src), gap_ms=gap_ms),
        tmp_path,
        "sessions_out",
    )
    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    batch = session_windows_batch(
        spark.read.parquet(src), gap_ms=gap_ms
    ).collect()
    # append mode emits a session once the watermark passes its merged
    # window end (last event + gap + 1 ms); watermark = max ts - 30 s
    max_ts = _BASE_S + (_N_SLICES - 1) * _SLICE_S + _CLOSER_OFFSET + 28
    wm_ms = (max_ts - 30) * 1000
    closed = {
        (r.user_id, r.session_start, r.n_events)
        for r in batch
        if r.last_ts.timestamp() * 1000 + gap_ms + 1 <= wm_ms
    }
    assert got == closed
    assert len(closed) > 0
    # every burst is one 4-event session (u0 carries the view twin
    # bursts interleaved at identical timestamps: 8 events)
    n_by_user = {}
    for u, _s, n in closed:
        n_by_user.setdefault(u, []).append(n)
    for u, counts in n_by_user.items():
        expect = 8 if u == "u0" else 4
        assert all(c == expect for c in counts), (u, counts)
