"""Incremental warehouse rollup: continuous maintenance of a daily
aggregate table via ``foreachBatch`` + dynamic partition overwrite.

The reference loads its warehouse in full batches
(load_to_bigquery.py: WRITE_TRUNCATE of partitioned+clustered
tables); the production-shaped continuous answer is a streaming
aggregation whose output upserts only the CHANGED partitions each
micro-batch. Exactly-once comes from the checkpoint (each epoch
replays identically after restart) plus the idempotent
partition-overwrite write: re-running an epoch rewrites the same
partitions with the same bytes.

Scale: state is bounded by the watermark horizon x grain cardinality
(days x types, tiny); each micro-batch writes only partitions it
touched — at 100 TB/day the daily rewrite stays proportional to the
day's arrivals, never the table's history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

MONEY = "decimal(18,6)"


def daily_rollup(events: DataFrame, watermark: str = "2 days") -> DataFrame:
    """Watermarked daily (day, event_type) aggregate of an event
    stream. Update-mode compatible: each micro-batch emits the grains
    it changed."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("total_value"),
        )
    )


def stream_rollup_to_warehouse(
    spark: SparkSession,
    events: DataFrame,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuously maintain the daily rollup table at ``output_path``
    (parquet partitioned by day): every micro-batch overwrites exactly
    the day-partitions it changed, leaving the rest untouched."""

    def upsert_batch(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.sparkSession.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
        )
        (
            batch.write.mode("overwrite")
            .partitionBy("day")
            .parquet(output_path)
        )

    writer = (
        daily_rollup(events)
        .writeStream.outputMode("update")
        .foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()
