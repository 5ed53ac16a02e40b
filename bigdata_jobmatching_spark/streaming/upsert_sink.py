"""Streaming SCD1 upsert sink: a change feed continuously MERGEd into
a versioned dimension table.

Composes two engine pieces: ``foreachBatch`` (per-micro-batch custom
sink with checkpointed epochs) and ``sources/versioned.merge_version``
(atomic-publish MERGE with rollback). Each micro-batch of updates
lands as a NEW dimension version whose pointer swap is atomic — a
reader never sees a half-applied batch, and a bad feed rolls back by
version number.

Exactly-once story: after a crash Spark replays only the last
uncommitted epoch, in order. Replaying a merge of the same update
rows is idempotent for SCD1 semantics (same keys replaced with the
same values — the extra version is byte-identical in content), so a
restart converges to the same current table. The dedup of multiple
updates for one key WITHIN a batch is explicit: latest ``ts`` wins,
tie-broken by the change id, so batch boundaries cannot reorder the
outcome.

Scale: the per-batch MERGE is one broadcast anti-join of the target
against the (micro-batch-sized) update keys plus a union — cost
proportional to target size per batch, which is the plain-parquet
floor; a table format with file-level merge-on-read is the upgrade
path when rewrite bandwidth dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources import versioned as V


def latest_per_key(updates: DataFrame, key_cols: tuple[str, ...], ts_col: str, id_col: str) -> DataFrame:
    """Collapse a change-feed micro-batch to one row per key: highest
    ``ts_col`` wins, ties broken by ``id_col`` — a total order, so the
    collapsed batch is deterministic whatever the arrival order."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_upsert_dimension(
    spark: SparkSession,
    changes: DataFrame,
    root: str,
    key_cols: tuple[str, ...],
    ts_col: str,
    id_col: str,
    checkpoint_path: str,
    delete_col: str | None = None,
    available_now: bool = True,
    stats_cols: tuple[str, ...] = (),
) -> StreamingQuery:
    """Maintain a versioned dimension from a streaming change feed.
    ``changes`` must carry the dimension columns plus ``ts_col`` and
    ``id_col`` (and optionally ``delete_col`` tombstones). With
    ``stats_cols``, every merged version carries a file-stats
    manifest (written before the pointer swap via the shared
    pre_publish hook), so manifest-pruned reads skip over
    stream-maintained dimensions too."""
    from ..sources.manifest import manifest_attacher

    pre_publish = manifest_attacher(stats_cols) if stats_cols else None

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if not batch.take(1):
            return
        collapsed = latest_per_key(batch, key_cols, ts_col, id_col).drop(
            ts_col, id_col
        )
        V.merge_version(spark, root, collapsed, key_cols,
                        delete_col=delete_col, pre_publish=pre_publish)

    writer = (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
