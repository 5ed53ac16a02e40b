"""A wire-compatible, file-backed Kafka test double as a Spark
Python Data Source — the round-10 answer to the one environmental
gap in SURVEY §2.1 S1.

The reference executes ``readStream.format("kafka")`` against a live
broker (spark/streaming/consume_jobs.py:93-100). This image bundles
no spark-sql-kafka jar and has no network to fetch one, so the real
connector cannot LOAD here (pinned by
tests/test_streaming.py::test_kafka_source_invocation_documented).
What CAN execute — and what this module provides — is everything the
connector contributes on the Spark side of the wire:

- **log model**: a topic is a directory of numbered partitions, each
  an append-only JSONL file; a record is (key, value, timestamp) with
  key/value base64 (binary-safe, tombstones as null) — Kafka's
  partitioned-offset-log semantics on a filesystem;
- **output schema**: rows come back in the CONNECTOR'S EXACT shape —
  ``key binary, value binary, topic string, partition int, offset
  long, timestamp timestamp, timestampType int`` — so the S2+S3
  decode (streaming/ingest.decode_kafka_offers) and everything
  downstream runs UNCHANGED against either source;
- **offset protocol**: streaming offsets are {partition: next_index}
  dicts; micro-batches replay exactly (the log is immutable), giving
  checkpoint-restart exactly-once through the standard file-sink
  discipline;
- **options**: ``path`` (broker dir), ``subscribe`` (topic),
  ``startingOffsets`` earliest|latest, ``maxOffsetsPerTrigger``
  (per-batch row cap across partitions, the backpressure knob the
  reference sets inertly via DStream confs).

What it deliberately does NOT cover: the TCP broker protocol,
consumer groups, and transactional producers — those live beyond the
Spark/connector boundary this engine is responsible for. With this
double, S1 is exercised by EXECUTION (subscribe -> offsets ->
micro-batches -> decode -> lake landing, restart included) rather
than by construction.

Scale note: one input partition per topic partition, read in
parallel by executors exactly like the real connector's 1:1
Kafka-partition-to-Spark-partition mapping; a production swap is
``format("kafka_wire") -> format("kafka")`` plus broker options.
"""

from __future__ import annotations

import base64
import datetime as _dt
import json
import os
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def _topic_dir(path: str, topic: str) -> str:
    return os.path.join(path, topic)


def _partition_file(path: str, topic: str, partition: int) -> str:
    return os.path.join(_topic_dir(path, topic), f"p{partition:04d}.jsonl")


def _list_partitions(path: str, topic: str) -> list[int]:
    d = _topic_dir(path, topic)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(n[1:-6]) for n in os.listdir(d)
        if n.startswith("p") and n.endswith(".jsonl")
    )


def _b64(b: bytes | None) -> str | None:
    return None if b is None else base64.b64encode(b).decode()


def _unb64(s: str | None) -> bytes | None:
    return None if s is None else base64.b64decode(s)


def produce(
    path: str,
    topic: str,
    records: list[tuple[bytes | None, bytes | None]],
    partitions: int = 2,
    timestamp_ms: int | None = None,
) -> None:
    """Harness-side producer twin (base_scraper.py:94-109: keyed JSON,
    acks=all): append (key, value) records to the topic log. Records
    route to partitions by key hash (None key -> round robin), the
    connector-visible half of Kafka's default partitioner."""
    os.makedirs(_topic_dir(path, topic), exist_ok=True)
    ts = timestamp_ms if timestamp_ms is not None else 1_700_000_000_000
    rr = 0
    by_part: dict[int, list[str]] = {}
    for key, value in records:
        if key is None:
            p = rr % partitions
            rr += 1
        else:
            p = int.from_bytes(key[:8].ljust(8, b"\0"), "big") % partitions
        by_part.setdefault(p, []).append(json.dumps(
            {"k": _b64(key), "v": _b64(value), "ts": ts}))
    for p, lines in by_part.items():
        with open(_partition_file(path, topic, p), "a") as f:
            f.write("\n".join(lines) + "\n")


def _read_slice(
    path: str, topic: str, partition: int, lo: int, hi: int | None,
) -> Iterator[tuple]:
    f = _partition_file(path, topic, partition)
    if not os.path.isfile(f):
        return
    with open(f) as fh:
        for i, line in enumerate(fh):
            if i < lo:
                continue
            if hi is not None and i >= hi:
                break
            rec = json.loads(line)
            # tz-AWARE instant: a naive datetime would be read in the
            # session timezone and shift the stored instant whenever
            # that is not UTC — a parity break with format("kafka"),
            # which always lands the true epoch instant
            yield (
                _unb64(rec["k"]), _unb64(rec["v"]), topic, partition, i,
                _dt.datetime.fromtimestamp(
                    rec["ts"] / 1000.0, tz=_dt.timezone.utc),
                0,  # timestampType: CREATE_TIME, like the connector
            )


# (file byte size -> line count) per partition file: the log is
# append-only, so an unchanged size means an unchanged count — end
# offsets stay O(1) per idle trigger instead of re-counting the whole
# log every 30 s forever (a continuously-running stream would
# otherwise pay O(total) per trigger even with zero new records)
_COUNT_CACHE: dict[str, tuple[int, int]] = {}


def _end_offsets(path: str, topic: str) -> dict[str, int]:
    out: dict[str, int] = {}
    for p in _list_partitions(path, topic):
        f = _partition_file(path, topic, p)
        size = os.path.getsize(f)
        cached = _COUNT_CACHE.get(f)
        if cached is not None and cached[0] == size:
            out[str(p)] = cached[1]
            continue
        with open(f) as fh:
            n = sum(1 for _ in fh)
        _COUNT_CACHE[f] = (size, n)
        out[str(p)] = n
    return out


class _WirePartition(InputPartition):
    def __init__(self, partition: int, lo: int, hi: int | None) -> None:
        self.partition = partition
        self.lo = lo
        self.hi = hi


class KafkaWireBatchReader(DataSourceReader):
    """Batch face (the connector's ``spark.read.format("kafka")``):
    whole log, one Spark partition per topic partition."""

    def __init__(self, options) -> None:
        self.path = options["path"]
        self.topic = options["subscribe"]

    def partitions(self):
        return [
            _WirePartition(p, 0, None)
            for p in _list_partitions(self.path, self.topic)
        ] or [_WirePartition(0, 0, None)]

    def read(self, part: _WirePartition) -> Iterator[tuple]:
        return _read_slice(
            self.path, self.topic, part.partition, part.lo, part.hi)


class KafkaWireStreamReader(SimpleDataSourceStreamReader):
    """Offset = {partition(str): next unread line index}. The log is
    append-only and immutable below the end offset, so replaying
    [start, end) is exact — the property checkpoint recovery needs."""

    def __init__(self, options) -> None:
        self.path = options["path"]
        self.topic = options["subscribe"]
        self.starting = options.get("startingOffsets", "earliest")
        self.max_per_trigger = int(options.get("maxOffsetsPerTrigger", 0))

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            return _end_offsets(self.path, self.topic)
        return {str(p): 0 for p in _list_partitions(self.path, self.topic)}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        end = _end_offsets(self.path, self.topic)
        # honor maxOffsetsPerTrigger across partitions (connector
        # semantics: proportional cap; here simple round-robin fill)
        if self.max_per_trigger:
            budget = self.max_per_trigger
            capped: dict[str, int] = {}
            for p in sorted(end, key=int):
                lo = int(start.get(p, 0))
                take = min(end[p] - lo, budget)
                capped[p] = lo + max(take, 0)
                budget -= max(take, 0)
            end = capped
        rows: list[tuple] = []
        for p in sorted(end, key=int):
            lo = int(start.get(p, 0))
            rows.extend(_read_slice(self.path, self.topic, int(p), lo, end[p]))
        # carry forward partitions the cap skipped entirely
        merged = {**{k: int(v) for k, v in start.items()},
                  **{k: int(v) for k, v in end.items()}}
        return iter(rows), merged

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for p in sorted(end, key=int):
            lo, hi = int(start.get(p, 0)), int(end[p])
            yield from _read_slice(self.path, self.topic, int(p), lo, hi)


class KafkaWireDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_wire"

    def schema(self) -> str:
        return WIRE_SCHEMA

    def reader(self, schema) -> KafkaWireBatchReader:
        return KafkaWireBatchReader(self.options)

    def simpleStreamReader(self, schema) -> KafkaWireStreamReader:
        return KafkaWireStreamReader(self.options)


def register_kafka_wire(spark) -> None:
    spark.dataSource.register(KafkaWireDataSource)
