"""SparkSession factory tuned for this engine.

Local mode is the test bed; the conf defaults are chosen so the same
code scales to a real cluster: AQE handles runtime partition
coalescing and skew joins, shuffle partitions default to the core
count locally (a cluster deployment overrides via ``extra_conf`` or
spark-submit), Arrow is on for the pandas-UDF slow path, and the
session timezone is pinned to UTC so results are comparable with
external oracles (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def get_spark(
    app_name: str = "bigdata_jobmatching_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    At 100 TB the same logical plans run unchanged: AQE re-plans
    shuffle partition counts at runtime, skew-join splitting handles
    hot keys, and broadcast thresholds let small dimensions avoid
    shuffles entirely.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Subset co-partitioning (r15): let a join accept children
        # hash-partitioned on a SUBSET of the join keys instead of
        # re-shuffling both sides onto the full key list. The engine
        # deliberately partitions self-join inputs by their block key
        # (e.g. the semantic census partitions the long-form vector
        # table by (cluster, sig) and joins on (cluster, sig, j)); with
        # the default=true every such join added two full-key exchanges
        # AND destroyed the partitioning the downstream pair-grain
        # aggregate could have reused. Audited over all 265 registered
        # queries: 16 plan improvements (shuffle/SMJ eliminations), 0
        # regressions. The documented risk of subset co-partitioning —
        # under-parallelization when the subset key has few distinct
        # values — does not apply: every subset key here (block id,
        # query_id, cv_id) grows with the corpus.
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
