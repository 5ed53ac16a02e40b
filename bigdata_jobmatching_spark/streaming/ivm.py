"""Streaming incremental view maintenance: a change-data feed
continuously folded into a materialized per-group aggregate.

The batch twin (plans/versioned_queries.incremental_agg_refresh,
hash-proven equal to a full recompute in CORRECTNESS_r07) is the SPEC:
refresh(view, cdf) == recompute(v2). The streaming face applies each
micro-batch of change rows as per-group deltas onto the current
published aggregate version (sources/versioned) inside foreachBatch —
the view table never re-reads the base table, which is the IVM
thesis: refresh cost scales with |changes| + |groups|, not |table|.

Exactly-once story — and why this sink needs MORE than the SCD1
upsert sink (streaming/upsert_sink.py): an SCD1 merge is idempotent
(replaying "key := value" converges), but a delta-merge is NOT —
re-applying a replayed epoch double-counts. Each published aggregate
version therefore carries the epoch that produced it in an ``_EPOCH``
marker written into the version directory BEFORE the atomic pointer
swap, and ``apply`` skips any epoch <= the current version's marker:

- crash BEFORE the swap: ``_CURRENT`` still names the old version
  (old epoch), the half-published dir is orphaned (vacuumable), and
  the replayed epoch re-applies cleanly onto the old state;
- crash AFTER the swap: the marker rides with the published version,
  so the replayed epoch compares <= and is skipped.

Either way a restart converges to exactly-once application.

Scale shape per batch: the delta path aggregates |changes| rows to
the group grain (map-side combine), then one union + re-aggregation
against the current view (|groups| rows) — a single shuffle on the
group key, same plan the batch twin runs once.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..sources import versioned as V

_EPOCH_FILE = "_EPOCH"


def group_deltas(changes: DataFrame, ngroup: int) -> DataFrame:
    """Per-group (n_rows, sum_cents) deltas from flat change rows
    (id, change, old_cents, new_cents) — the same insert/+1 delete/-1
    update/0 arithmetic as the batch twin, unchanged rows dropped
    before any shuffle."""
    return changes.filter(F.col("change") != "unchanged").select(
        (F.col("id") % ngroup).alias("g"),
        F.when(F.col("change") == "insert", F.lit(1))
        .when(F.col("change") == "delete", F.lit(-1))
        .otherwise(F.lit(0)).alias("n_rows"),
        (
            F.coalesce(F.col("new_cents"), F.lit(0))
            - F.coalesce(F.col("old_cents"), F.lit(0))
        ).alias("sum_cents"),
    )


def current_epoch(root: str) -> int:
    """Epoch recorded with the currently published view version
    (-1 when the root is unseeded or the seed carries no marker)."""
    v = V.current_version(root)
    if v is None:
        return -1
    p = os.path.join(root, f"v{v:05d}", _EPOCH_FILE)
    if not os.path.isfile(p):
        return -1
    with open(p) as f:
        return int(f.read().strip())


def _publish_with_epoch(
    df: DataFrame, root: str, epoch_id: int,
    stats_cols: tuple[str, ...] = (),
) -> int:
    """Land ``df`` as the next version with its epoch marker (and,
    with ``stats_cols``, a file-stats manifest) riding the shared
    pre_publish hook — every sidecar lands strictly before the
    pointer swap (see module docstring for the crash-window
    analysis), so manifest-pruned reads work over stream-built
    versions exactly as over batch-built ones."""
    from ..sources.manifest import manifest_attacher

    def attach(vdir: str) -> None:
        if stats_cols:
            manifest_attacher(stats_cols)(vdir)
        with open(os.path.join(vdir, _EPOCH_FILE), "w") as f:
            f.write(str(epoch_id))

    return V.write_version(df, root, pre_publish=attach)


def seed_view(agg: DataFrame, root: str,
              stats_cols: tuple[str, ...] = ()) -> int:
    """Publish the initial materialized aggregate (epoch -1): columns
    (g, n_rows, sum_cents)."""
    return _publish_with_epoch(agg, root, -1, stats_cols)


def apply_cdf_batch(
    spark: SparkSession, batch: DataFrame, epoch_id: int, root: str,
    ngroup: int, stats_cols: tuple[str, ...] = (),
) -> bool:
    """Fold one micro-batch of change rows into the view. Returns
    False when the epoch was already applied (replay after a
    post-swap crash) and the batch is skipped.

    Epoch-regression guard (round-9 advice fix): checkpoint replay
    only ever re-delivers the LAST epoch, so an incoming
    ``epoch_id`` strictly below the published marker means the
    streaming checkpoint was deleted/recreated while the view root
    persisted (Spark restarts epochs at 0) — silently skipping every
    batch until the ids caught up would be silent data loss, so it
    raises instead: recreate the view root and the checkpoint
    TOGETHER."""
    cur_epoch = current_epoch(root)
    if epoch_id < cur_epoch:
        raise RuntimeError(
            f"stream_ivm_refresh: epoch regression (incoming {epoch_id} "
            f"< published marker {cur_epoch}) — the checkpoint was "
            f"recreated against a persisted view root; recreate "
            f"{root!r} and the checkpoint together"
        )
    if epoch_id == cur_epoch:
        return False
    _fold_deltas(spark, group_deltas(batch, ngroup), epoch_id, root,
                 stats_cols)
    return True


def _fold_deltas(
    spark: SparkSession, deltas: DataFrame, epoch_id: int, root: str,
    stats_cols: tuple[str, ...] = (),
) -> None:
    """Fold pre-computed per-row (g, n_rows, sum_cents) deltas into
    the view at ``root`` — the shared merge step of the single-level
    and chained refreshers (deltas are additive, so the SAME rows
    can fold into any coarsening of the grain)."""
    cur = V.read_version(spark, root).select("g", "n_rows", "sum_cents")
    merged = (
        cur.unionByName(deltas)
        .groupBy("g")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
        .filter(F.col("n_rows") > 0)
    )
    _publish_with_epoch(merged, root, epoch_id, stats_cols)


def stream_ivm_refresh(
    spark: SparkSession,
    changes: DataFrame,
    root: str,
    checkpoint_path: str,
    ngroup: int = 97,
    available_now: bool = True,
    stats_cols: tuple[str, ...] = (),
) -> StreamingQuery:
    """Maintain the materialized per-group aggregate from a streaming
    change feed of flat (id, change, old_cents, new_cents) rows. The
    root must be seeded with :func:`seed_view` first. With
    ``stats_cols``, every published view version carries a file-stats
    manifest, so manifest-pruned reads skip over stream-built tables
    too."""
    if V.current_version(root) is None:
        raise FileNotFoundError(
            f"stream_ivm_refresh: seed the view first (seed_view) — "
            f"no published version under {root}"
        )

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        apply_cdf_batch(spark, batch, epoch_id, root, ngroup, stats_cols)

    writer = (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ivm_refresh_chain(
    spark: SparkSession,
    changes: DataFrame,
    fine_root: str,
    coarse_root: str,
    checkpoint_path: str,
    ngroup: int = 97,
    coarsen: int = 10,
    available_now: bool = True,
    stats_cols: tuple[str, ...] = (),
) -> StreamingQuery:
    """MULTI-LEVEL incremental view maintenance: one change feed
    keeps the fine per-group aggregate AND its coarsened rollup
    (g % ``coarsen``) fresh in the same micro-batch — the
    Materialize-style view-of-a-view chain, reduced to the
    SUM-additive case the mv.py navigator serves.

    The chain never reads level 1 to refresh level 2: group deltas
    are ADDITIVE, so the same per-batch delta rows fold into any
    coarsening of the grain — refresh cost per level stays
    |changes| + |groups(level)|, and the whole chain is one
    foreachBatch. Each level carries its OWN epoch marker: a crash
    between the two publishes leaves the fine view one epoch ahead,
    and the replayed epoch skips the fine fold (already applied) and
    lands only the missing coarse one — per-level exactly-once, same
    discipline as the single-level sink.

    With ``stats_cols``, every published version AT EVERY LEVEL
    carries a file-stats manifest — parity with the single-level
    sink (round-10 advice: the chain used to publish without
    manifests, silently losing manifest-pruned reads over
    stream-built rollups).

    Seed BOTH roots (seed_view) with consistent aggregates of the
    same snapshot before starting."""
    for root in (fine_root, coarse_root):
        if V.current_version(root) is None:
            raise FileNotFoundError(
                f"stream_ivm_refresh_chain: seed {root!r} first")

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        deltas = group_deltas(batch, ngroup).localCheckpoint(eager=True)
        for root, dd in (
            (fine_root, deltas),
            (coarse_root, deltas.select(
                (F.col("g") % coarsen).alias("g"), "n_rows", "sum_cents")),
        ):
            cur_epoch = current_epoch(root)
            if epoch_id < cur_epoch:
                raise RuntimeError(
                    f"stream_ivm_refresh_chain: epoch regression at "
                    f"{root!r} (incoming {epoch_id} < {cur_epoch})")
            if epoch_id == cur_epoch:
                continue  # this level already landed this epoch
            _fold_deltas(spark, dd, epoch_id, root, stats_cols)

    writer = (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
