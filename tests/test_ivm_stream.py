"""AvailableNow-drain equivalence of the streaming IVM sink against
the batch incremental_agg_refresh twin (round-7 verdict task #5) —
the discipline streaming/event_hygiene.py established: the batch twin
(itself hash-proven equal to a full v2 recompute at the driver gate)
is the SPEC, the stream must converge to it on the same fixture."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from bigdata_jobmatching_spark.plans.versioned_queries import (
    _incremental_agg_refresh,
    _snap_v1,
    _snap_v2,
)
from bigdata_jobmatching_spark.sources import versioned as V
from bigdata_jobmatching_spark.streaming import ivm

_SF = "/root/testdata/sf0.001"
_NGROUP = 97


def _flat_cdf(spark):
    """The planted change feed, flattened for the stream: one row per
    non-unchanged key, (id, change, old_cents, new_cents)."""
    diff = V.diff_frames(_snap_v1(spark, _SF), _snap_v2(spark, _SF), ("id",))
    return diff.filter(F.col("change") != "unchanged").select(
        "id", "change",
        F.col("__old_val.cents").alias("old_cents"),
        F.col("__new_val.cents").alias("new_cents"),
    )


def _write_sliced_cdf(spark, tmp_path, n_slices=4):
    """One parquet file per id-residue slice, mtimes strictly
    increasing so maxFilesPerTrigger=1 replays them as separate
    micro-batches (delta application is commutative, so any slicing
    is a valid arrival order)."""
    cdf = _flat_cdf(spark)
    src = tmp_path / "cdf_src"
    src.mkdir()
    for sl in range(n_slices):
        part_dir = tmp_path / f"__part{sl}"
        (
            cdf.filter(F.col("id") % n_slices == sl)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(part_dir))
        )
        part_file = next(part_dir.glob("part-*.parquet"))
        dest = src / f"slice_{sl:03d}.parquet"
        shutil.move(str(part_file), str(dest))
        os.utime(dest, (1_700_000_000 + sl, 1_700_000_000 + sl))
    return str(src)


def _seed(spark, root):
    v1_agg = (
        _snap_v1(spark, _SF)
        .groupBy((F.col("id") % _NGROUP).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
    )
    ivm.seed_view(v1_agg, root)


def _view_rows(spark, root):
    return sorted(
        (r.g, r.n_rows, r.sum_cents)
        for r in V.read_version(spark, root).collect()
    )


def test_ivm_stream_matches_batch(spark, tmp_path):
    src = _write_sliced_cdf(spark, tmp_path)
    root = str(tmp_path / "agg_view")
    _seed(spark, root)

    schema = spark.read.parquet(src).schema
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = ivm.stream_ivm_refresh(
        spark, changes, root, str(tmp_path / "ck"), ngroup=_NGROUP
    )
    q.awaitTermination(300)

    got = _view_rows(spark, root)
    want = sorted(
        (r.g, r.n_rows, r.sum_cents)
        for r in _incremental_agg_refresh(spark, _SF).collect()
    )
    assert got == want
    # the stream really ran multiple delta epochs, not one big batch
    assert V.current_version(root) >= 4  # seed + 4 slices
    assert ivm.current_epoch(root) >= 3


def test_ivm_replayed_epoch_is_skipped(spark, tmp_path):
    """Post-swap-crash replay: re-applying the last committed epoch
    must be a no-op — the failure mode that separates a delta-merge
    sink from the idempotent SCD1 upsert sink."""
    root = str(tmp_path / "agg_view")
    _seed(spark, root)
    cdf = _flat_cdf(spark)

    assert ivm.apply_cdf_batch(spark, cdf, 0, root, _NGROUP) is True
    after_first = _view_rows(spark, root)
    v_after_first = V.current_version(root)

    # replay of the LAST committed epoch: skipped, no new version
    # published, view byte-identical
    assert ivm.apply_cdf_batch(spark, cdf, 0, root, _NGROUP) is False
    assert V.current_version(root) == v_after_first
    assert _view_rows(spark, root) == after_first


def test_ivm_epoch_regression_raises(spark, tmp_path):
    """Round-9 advice fix: checkpoint replay only re-delivers the LAST
    epoch, so an epoch strictly below the published marker means the
    checkpoint was recreated against a persisted view root (Spark
    restarts epochs at 0) — that must raise loudly, not silently drop
    every batch until the ids catch up."""
    import pytest

    root = str(tmp_path / "agg_view")
    _seed(spark, root)
    cdf = _flat_cdf(spark)
    assert ivm.apply_cdf_batch(spark, cdf, 0, root, _NGROUP) is True
    assert ivm.apply_cdf_batch(spark, cdf, 1, root, _NGROUP) is True

    with pytest.raises(RuntimeError, match="epoch regression"):
        ivm.apply_cdf_batch(spark, cdf, 0, root, _NGROUP)
    # replay of the last epoch still skips cleanly
    assert ivm.apply_cdf_batch(spark, cdf, 1, root, _NGROUP) is False


def test_ivm_stream_versions_carry_manifests_and_prune(spark, tmp_path):
    """Round-9 verdict task #6: with stats_cols, every stream-published
    view version carries _MANIFEST.json (written before the pointer
    swap), and manifest-pruned reads over the stream-built table
    preserve answers while skipping files."""
    from bigdata_jobmatching_spark.sources import manifest as MF

    src = _write_sliced_cdf(spark, tmp_path)
    root = str(tmp_path / "agg_view")
    v1_agg = (
        _snap_v1(spark, _SF)
        .groupBy((F.col("id") % _NGROUP).alias("g"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        # spread groups across files so a range predicate can skip:
        # 8 range partitions on g -> disjoint per-file g spans
        .repartitionByRange(8, "g")
    )
    ivm.seed_view(v1_agg, root, stats_cols=("g",))

    schema = spark.read.parquet(src).schema
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = ivm.stream_ivm_refresh(
        spark, changes, root, str(tmp_path / "ck"), ngroup=_NGROUP,
        stats_cols=("g",),
    )
    q.awaitTermination(300)

    # every published version carries its manifest
    for v in V.list_versions(root):
        assert MF.read_manifest(root, v)["stats_cols"] == ["g"]

    pruned, total, read = MF.read_pruned(spark, root, "g", 10, 20)
    # answers preserved vs the full current version
    pred = F.col("g").between(10, 20)
    want = sorted(
        (r.g, r.n_rows, r.sum_cents)
        for r in V.read_version(spark, root).filter(pred).collect()
    )
    got = sorted(
        (r.g, r.n_rows, r.sum_cents)
        for r in pruned.filter(pred).collect()
    )
    assert got == want and len(got) > 0


def test_upsert_sink_versions_carry_manifests(spark, tmp_path):
    """The SCD1 upsert sink shares the same pre_publish discipline:
    stream-merged dimension versions carry manifests and prune."""
    import json as _json

    from bigdata_jobmatching_spark.sources import manifest as MF
    from bigdata_jobmatching_spark.streaming.upsert_sink import (
        stream_upsert_dimension,
    )

    rows = [
        {"k": i, "val": f"v{i}", "ts": 1000 + i, "cid": i} for i in range(64)
    ]
    src = tmp_path / "dim_src"
    src.mkdir()
    with open(src / "b.json", "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    changes = (
        spark.readStream.schema("k INT, val STRING, ts LONG, cid LONG")
        .json(str(src))
    )
    root = str(tmp_path / "dim_v")
    q = stream_upsert_dimension(
        spark, changes, root, ("k",), "ts", "cid",
        str(tmp_path / "dim_ck"), stats_cols=("k",),
    )
    q.awaitTermination(300)

    v = V.current_version(root)
    assert v is not None
    assert MF.read_manifest(root, v)["stats_cols"] == ["k"]
    pruned, total, read = MF.read_pruned(spark, root, "k", 0, 1000)
    assert read <= total
    assert pruned.count() == V.read_version(spark, root).count() == 64


def test_ivm_pre_swap_crash_replay_converges(spark, tmp_path):
    """Pre-swap-crash replay: a version directory written WITHOUT the
    pointer swap (the other crash window) must not block or corrupt
    the replayed epoch — it re-applies onto the still-current state."""
    root = str(tmp_path / "agg_view")
    _seed(spark, root)
    cdf = _flat_cdf(spark)

    # simulate the crash: land an orphan version dir, no pointer swap
    orphan = os.path.join(root, "v00002")
    V.read_version(spark, root).write.parquet(orphan)
    with open(os.path.join(orphan, ivm._EPOCH_FILE), "w") as f:
        f.write("0")
    assert V.current_version(root) == 1  # pointer untouched
    assert ivm.current_epoch(root) == -1

    assert ivm.apply_cdf_batch(spark, cdf, 0, root, _NGROUP) is True
    want = sorted(
        (r.g, r.n_rows, r.sum_cents)
        for r in _incremental_agg_refresh(spark, _SF).collect()
    )
    assert _view_rows(spark, root) == want


def test_streamed_view_serves_rollups(spark, tmp_path):
    """Composition: the STREAM-maintained aggregate is a legitimate
    MatView — after the IVM drain, the mv.py navigator serves a
    coarser grain (gc = g % 10) from the published view, and the
    answer equals recomputing that grain from the final base state.
    This is the full write-side (IVM keeps the view fresh) +
    read-side (navigator serves rollups from it) contract in one
    test."""
    from bigdata_jobmatching_spark.mv import MatView, serve

    src = _write_sliced_cdf(spark, tmp_path)
    root = str(tmp_path / "agg_view")
    _seed(spark, root)
    schema = spark.read.parquet(src).schema
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    ivm.stream_ivm_refresh(
        spark, changes, root, str(tmp_path / "ck"), ngroup=_NGROUP
    ).awaitTermination(300)

    view = V.read_version(spark, root)
    mv = MatView("ivm_g", ("g",), ("n_rows", "sum_cents"), view,
                 {"gc": "g % 10"})
    served, src_name = serve(
        ("gc",), [mv],
        lambda: (_ for _ in ()).throw(AssertionError("must hit the MV")))
    assert src_name == "ivm_g"
    got = sorted((r.gc, r.n_rows, r.sum_cents) for r in served.collect())
    want = sorted(
        (r.gc, r.n_rows, r.sum_cents)
        for r in _snap_v2(spark, _SF)
        .groupBy(((F.col("id") % _NGROUP) % 10).alias("gc"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.sum("cents").cast("long").alias("sum_cents"))
        .collect()
    )
    assert got == want


def test_ivm_chain_maintains_both_levels(spark, tmp_path):
    """Multi-level IVM: one drained change feed leaves BOTH the fine
    view and its %10 rollup equal to recomputation from the final
    base state, with matching epoch markers — and a checkpoint
    replay (same source, same checkpoint) changes neither."""
    src = _write_sliced_cdf(spark, tmp_path)
    fine = str(tmp_path / "fine")
    coarse = str(tmp_path / "coarse")
    v1 = _snap_v1(spark, _SF)
    ivm.seed_view(
        v1.groupBy((F.col("id") % _NGROUP).alias("g")).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents")), fine)
    ivm.seed_view(
        v1.groupBy(((F.col("id") % _NGROUP) % 10).alias("g")).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("sum_cents")), coarse)

    schema = spark.read.parquet(src).schema

    def run():
        changes = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src)
        )
        ivm.stream_ivm_refresh_chain(
            spark, changes, fine, coarse, str(tmp_path / "ck"),
            ngroup=_NGROUP, coarsen=10, stats_cols=("g",),
        ).awaitTermination(300)

    run()

    # stats_cols parity with the single-level sink (round-10 advice):
    # chain-published versions at BOTH levels carry file-stats
    # manifests, so manifest-pruned reads work over stream-built
    # rollups too
    from bigdata_jobmatching_spark.sources import manifest as MF
    for root in (fine, coarse):
        man = MF.read_manifest(root)
        assert man["files"], f"chain level {root} published no manifest"
        assert all("stats" in e and "g" in e["stats"]
                   for e in man["files"])

    def want(grain):
        return sorted(
            (r.g, r.n_rows, r.sum_cents)
            for r in _snap_v2(spark, _SF)
            .groupBy(grain.alias("g")).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents"))
            .collect())

    assert _view_rows(spark, fine) == want(F.col("id") % _NGROUP)
    assert _view_rows(spark, coarse) == want((F.col("id") % _NGROUP) % 10)
    assert ivm.current_epoch(fine) == ivm.current_epoch(coarse) >= 3
    vf, vc = V.current_version(fine), V.current_version(coarse)

    # replay with the SAME checkpoint: nothing to do, nothing changes
    run()
    assert V.current_version(fine) == vf
    assert V.current_version(coarse) == vc


def test_ivm_chain_partial_crash_replay_converges(spark, tmp_path):
    """A crash BETWEEN the two publishes (fine landed, coarse did
    not) must converge on replay: the fine fold skips (epoch already
    marked), the coarse fold lands — per-level exactly-once."""
    src = _write_sliced_cdf(spark, tmp_path, n_slices=1)
    fine = str(tmp_path / "fine")
    coarse = str(tmp_path / "coarse")
    v1 = _snap_v1(spark, _SF)
    for root, grain in ((fine, F.col("id") % _NGROUP),
                        (coarse, (F.col("id") % _NGROUP) % 10)):
        ivm.seed_view(
            v1.groupBy(grain.alias("g")).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents")), root)

    batch = spark.read.parquet(src)
    # simulate the crash window: apply epoch 0 to the FINE level only
    ivm._fold_deltas(
        spark, ivm.group_deltas(batch, _NGROUP), 0, fine)
    assert ivm.current_epoch(fine) == 0
    assert ivm.current_epoch(coarse) == -1

    # replayed epoch 0 through the chain: fine skips, coarse lands
    changes = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    ivm.stream_ivm_refresh_chain(
        spark, changes, fine, coarse, str(tmp_path / "ck"),
        ngroup=_NGROUP, coarsen=10,
    ).awaitTermination(300)
    assert ivm.current_epoch(fine) == ivm.current_epoch(coarse) == 0
    # fine applied exactly once (version did not advance on replay)
    assert V.current_version(fine) == 2
    assert _view_rows(spark, fine) == sorted(
        (r.g, r.n_rows, r.sum_cents)
        for r in _incremental_agg_refresh(spark, _SF).collect())


def test_navigator_prefers_coarse_chained_view(spark, tmp_path):
    """Loop closure: after the chained drain, the mv.py navigator
    registered coarsest-first answers a coarse request from the
    COARSE maintained view and a fine request from the FINE one —
    write side (chain) and read side (navigator) agree with base."""
    from bigdata_jobmatching_spark.mv import MatView, serve

    src = _write_sliced_cdf(spark, tmp_path)
    fine = str(tmp_path / "fine")
    coarse = str(tmp_path / "coarse")
    v1 = _snap_v1(spark, _SF)
    for root, grain in ((fine, F.col("id") % _NGROUP),
                        (coarse, (F.col("id") % _NGROUP) % 10)):
        ivm.seed_view(
            v1.groupBy(grain.alias("g")).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("long").alias("sum_cents")), root)
    schema = spark.read.parquet(src).schema
    changes = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
    )
    ivm.stream_ivm_refresh_chain(
        spark, changes, fine, coarse, str(tmp_path / "ck"),
        ngroup=_NGROUP, coarsen=10,
    ).awaitTermination(300)

    mv_coarse = MatView(
        "coarse", ("gc",), ("n_rows", "sum_cents"),
        V.read_version(spark, coarse).withColumnRenamed("g", "gc"))
    mv_fine = MatView(
        "fine", ("g",), ("n_rows", "sum_cents"),
        V.read_version(spark, fine), {"gc": "g % 10"})

    out, src_name = serve(("gc",), [mv_coarse, mv_fine],
                          lambda: (_ for _ in ()).throw(AssertionError))
    assert src_name == "coarse"
    want = sorted(
        (r.gc, r.n_rows, r.sum_cents)
        for r in _snap_v2(spark, _SF)
        .groupBy(((F.col("id") % _NGROUP) % 10).alias("gc"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.sum("cents").cast("long").alias("sum_cents")).collect())
    assert sorted((r.gc, r.n_rows, r.sum_cents)
                  for r in out.collect()) == want

    _, src2 = serve(("g",), [mv_coarse, mv_fine],
                    lambda: (_ for _ in ()).throw(AssertionError))
    assert src2 == "fine"
