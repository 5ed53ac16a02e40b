"""Python Data Source (`synthetic_events`): partition planning,
filter pushdown, determinism, and the streaming face."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, IsNotNull, LessThan

from bigdata_jobmatching_spark.sources.pysource import (
    SyntheticEventsReader,
    gen_row,
    register_synthetic_source,
)


def _read(spark, **opts):
    register_synthetic_source(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_pysource_batch_read_matches_generator(spark):
    df = _read(spark, rows=500, partitions=4)
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(gen_row(i) for i in range(500))
    assert got == want
    # generation really fans out across the requested partitions
    nparts = df.select(F.spark_partition_id().alias("p")).distinct().count()
    assert nparts == 4


def test_pysource_filter_pushdown_contract(spark):
    # e2e: pushed filters must not change results vs post-filtering
    df = _read(spark, rows=1000, partitions=4)
    pushed = df.filter(
        (F.col("event_type") == "click")
        & (F.col("event_id") >= 100)
        & (F.col("event_id") < 600)
    )
    want = [
        gen_row(i) for i in range(100, 600) if gen_row(i)[2] == "click"
    ]
    assert sorted(tuple(r) for r in pushed.collect()) == sorted(want)

    # unit: the reader absorbs type-equality and id-range filters and
    # returns everything else as unhandled
    rd = SyntheticEventsReader({"rows": "1000", "partitions": "1"})
    unhandled = list(rd.pushFilters([
        EqualTo(("event_type",), "click"),
        GreaterThanOrEqual(("event_id",), 100),
        LessThan(("event_id",), 600),
        IsNotNull(("value",)),
    ]))
    assert [type(f) for f in unhandled] == [IsNotNull]
    rows = list(rd.read(rd.partitions()[0]))
    assert rows == want
    # the generator loop itself was bounded - no over-read then drop
    assert all(100 <= r[0] < 600 for r in rows)


def test_pysource_stream_reader(spark, tmp_path):
    register_synthetic_source(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .option("batch_size", 50)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    n = out.count()
    assert n >= 50 and n % 50 == 0
    got = sorted(tuple(r) for r in out.collect())
    assert got == sorted(gen_row(i) for i in range(n))
