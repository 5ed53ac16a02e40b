"""Offline inspection of streaming state: Spark 4's State Data Source.

Operating a long-lived streaming pipeline (the reference's ingest,
consume_jobs.py) eventually requires answering "what is the query
remembering?" — which keys hold state, how big it is, whether a
watermark bug is leaking entries. The state-reader data source
(``spark.read.format("state-metadata") / format("statestore")``)
answers that OFFLINE, against the checkpoint directory, without
touching the running query: state files are versioned per batch, so
the read is a consistent snapshot.

At scale this matters because state is the streaming equivalent of a
hot table: a leak grows executor memory/RocksDB until the job dies.
An offline reader turns that from a post-mortem into a routine audit
(e.g. a scheduled "state rows per operator" report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator-level state metadata for a checkpoint: operator ids and
    names, partition counts, min/max readable batch ids."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    operator_id: int = 0,
    batch_id: int | None = None,
    store_name: str | None = None,
) -> DataFrame:
    """Key/value state rows of one stateful operator at one batch
    (default: the latest committed). Columns are ``key`` and ``value``
    structs whose fields mirror the operator's state schema, plus
    ``partition_id``."""
    r = (
        spark.read.format("statestore")
        .option("path", checkpoint)
        .option("operatorId", operator_id)
    )
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    return r.load()


def state_size_report(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Rows of (operator_id, operator_name, state_rows): the routine
    leak audit. One aggregate per operator over the state snapshot."""
    meta = state_metadata(spark, checkpoint).select(
        "operatorId", "operatorName"
    ).distinct()
    out = []
    for row in meta.collect():  # few operators per query, driver-side is fine
        n = read_state(spark, checkpoint, operator_id=row["operatorId"]).count()
        out.append((row["operatorId"], row["operatorName"], n))
    return spark.createDataFrame(
        out, "operator_id long, operator_name string, state_rows long"
    )
