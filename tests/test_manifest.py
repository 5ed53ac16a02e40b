"""Manifest-based file skipping (sources/manifest.py): the Iceberg/
Delta core mechanic on plain parquet. The contract under test: pruning
may only skip files PROVABLY outside the predicate range — for any
predicate, pruned-scan-then-filter equals full-scan-then-filter — and
the manifest always rides inside the published version directory."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bigdata_jobmatching_spark.sources import manifest as MF
from bigdata_jobmatching_spark.sources import versioned as V
from bigdata_jobmatching_spark.sources.io import load_table

_SF = "/root/testdata/sf0.001"
# the synthetic lake spans 1995-01..2001-08; one year in the middle
_LO, _HI = "1997-01-01", "1997-12-31"


def _orders_bucketed(spark):
    """Orders hash-bucketed by order YEAR so each output file covers
    whole years — range-clustered file-level min/max spans (hashing by
    a finer grain like month scatters the grain across every file and
    nothing can prune; the bucket column must be COARSER than the
    query ranges, the same correlation rule zonemap_pruning_audit
    measures for sort keys)."""
    o = load_table(spark, _SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.year("o_orderdate").alias("yr"),
    )
    return o.repartition(8, F.col("yr"))


def test_manifest_prunes_and_preserves_answers(spark, tmp_path):
    root = str(tmp_path / "orders_v")
    v = MF.write_version_with_manifest(
        _orders_bucketed(spark), root, stats_cols=("odate",))
    assert v == 1
    man = MF.read_manifest(root)
    assert man["stats_cols"] == ["odate"]
    assert all(e["rows"] > 0 for e in man["files"])
    assert all("odate" in e["stats"] for e in man["files"])

    pruned, total, read = MF.read_pruned(spark, root, "odate", _LO, _HI)
    assert 0 < read < total, (read, total)

    pred = (F.col("odate") >= _LO) & (F.col("odate") <= _HI)
    full = V.read_version(spark, root)
    want = full.filter(pred).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"),
    ).collect()[0]
    got = pruned.filter(pred).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("c"),
    ).collect()[0]
    assert (got.n, got.c) == (want.n, want.c)
    assert want.n > 0


def test_manifest_disjoint_range_reads_zero_files(spark, tmp_path):
    root = str(tmp_path / "orders_v")
    MF.write_version_with_manifest(
        _orders_bucketed(spark), root, stats_cols=("odate",))
    pruned, total, read = MF.read_pruned(
        spark, root, "odate", "2090-01-01", "2090-12-31")
    assert read == 0 and total > 0
    assert pruned.count() == 0
    # schema preserved even for the empty relation
    assert "o_totalprice" in pruned.columns


def test_manifest_conservative_without_stats(spark, tmp_path):
    """A column the manifest carries no stats for can never be used
    to skip: every file is kept (skipping must not change answers)."""
    root = str(tmp_path / "orders_v")
    MF.write_version_with_manifest(
        _orders_bucketed(spark), root, stats_cols=("odate",))
    _, total, read = MF.read_pruned(spark, root, "o_custkey", 0, 1)
    assert read == total


def test_manifest_rides_the_published_version(spark, tmp_path):
    """The manifest is written inside the version dir BEFORE the
    pointer swap (the IVM epoch-marker discipline): the published
    version always carries it, and a second publish gets its own."""
    root = str(tmp_path / "orders_v")
    MF.write_version_with_manifest(
        _orders_bucketed(spark), root, stats_cols=("odate",))
    MF.write_version_with_manifest(
        _orders_bucketed(spark).filter(F.col("yr") >= 1996),
        root, stats_cols=("odate",))
    assert V.current_version(root) == 2
    assert os.path.isfile(os.path.join(root, "v00001", "_MANIFEST.json"))
    assert os.path.isfile(os.path.join(root, "v00002", "_MANIFEST.json"))
    # time travel keeps each version's own stats
    m1 = MF.read_manifest(root, 1)
    m2 = MF.read_manifest(root, 2)
    lo1 = min(e["stats"]["odate"]["min"] for e in m1["files"])
    lo2 = min(e["stats"]["odate"]["min"] for e in m2["files"])
    assert lo1 < "1996-01-01" <= lo2


def test_write_audit_publish_vetoes_bad_data(spark, tmp_path):
    """The WAP contract: a failing audit leaves the previous version
    current and the staged files unpublished-but-present (forensics);
    a passing audit publishes atomically."""
    import pytest

    root = str(tmp_path / "orders_v")
    good = _orders_bucketed(spark)
    v1 = MF.audit_then_publish(
        good, root,
        audits=[lambda d: None if d.count() > 0 else (_ for _ in ()).throw(
            ValueError("empty"))],
        stats_cols=("odate",),
    )
    assert v1 == 1 and V.current_version(root) == 1

    def no_nulls(d):
        n = d.filter(F.col("odate").isNull()).count()
        if n:
            raise ValueError(f"{n} null odate rows")

    bad = good.withColumn(
        "odate",
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(F.col("odate")),
    )
    with pytest.raises(ValueError, match="null odate"):
        MF.audit_then_publish(bad, root, audits=[no_nulls])
    # pointer untouched, staged dir orphaned for forensics
    assert V.current_version(root) == 1
    assert os.path.isdir(os.path.join(root, "v00002"))
    # next publish skips past the orphan
    v3 = MF.audit_then_publish(good, root, audits=[no_nulls],
                               stats_cols=("odate",))
    assert v3 == 3 and V.current_version(root) == 3


def test_compaction_preserves_data_and_cuts_files(spark, tmp_path):
    root = str(tmp_path / "orders_v")
    MF.write_version_with_manifest(
        _orders_bucketed(spark), root, stats_cols=("odate",))
    n_before = len(MF.read_manifest(root, 1)["files"])
    assert n_before > 2
    v2 = MF.compact_version(spark, root, target_files=2,
                            stats_cols=("odate",))
    assert v2 == 2 and V.current_version(root) == 2
    n_after = len(MF.read_manifest(root, 2)["files"])
    assert n_after <= 2
    # byte-equivalent content (order-insensitive)
    a = sorted(map(tuple, V.read_version(spark, root, 1).collect()))
    b = sorted(map(tuple, V.read_version(spark, root, 2).collect()))
    assert a == b
    # and the compacted version still prunes by manifest
    _, total, read = MF.read_pruned(spark, root, "odate", "2090-01-01",
                                    "2090-12-31")
    assert total == n_after and read == 0


def test_date_bounds_normalized_like_the_writer(spark, tmp_path):
    """Round-9 advice fix: date/datetime predicate bounds go through
    the manifest's own isoformat serializer, so a caller passing real
    ``datetime.date`` objects gets the same pruning (and the same
    answers) as one passing ISO strings."""
    import datetime as dt

    o = load_table(spark, _SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate",
        F.year("o_orderdate").alias("yr"),
    )
    root = str(tmp_path / "orders_dt")
    MF.write_version_with_manifest(
        o.repartition(8, F.col("yr")), root, stats_cols=("o_orderdate",))

    lo_d, hi_d = dt.date(1997, 1, 1), dt.date(1997, 12, 31)
    p1, t1, r1 = MF.read_pruned(spark, root, "o_orderdate", lo_d, hi_d)
    p2, t2, r2 = MF.read_pruned(spark, root, "o_orderdate", _LO, _HI)
    assert (t1, r1) == (t2, r2) and 0 < r1 < t1
    pred = F.col("o_orderdate").between(F.lit(lo_d), F.lit(hi_d))
    assert p1.filter(pred).count() == p2.filter(pred).count() > 0


def test_partitioned_layout_prunes_by_leaf_file(spark, tmp_path):
    """Hive-partitioned versions: the manifest tracks leaf files by
    relative path and read_pruned skips across partition dirs."""
    o = load_table(spark, _SF, "orders").select(
        "o_orderkey", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.year("o_orderdate").alias("yr"),
    )
    root = str(tmp_path / "orders_part")
    MF.write_version_with_manifest(
        o.repartition("yr"), root, stats_cols=("odate",),
        partition_by=("yr",))
    man = MF.read_manifest(root)
    # one leaf file per year dir, tracked by relative path
    assert all("/" in e["file"] and e["file"].startswith("yr=")
               for e in man["files"])
    years = {e["file"].split("/")[0] for e in man["files"]}
    assert len(years) == len(man["files"])  # exactly one file per year

    pruned, total, read = MF.read_pruned(spark, root, "odate", _LO, _HI)
    assert read == 1 and total == len(years)
    pred = (F.col("odate") >= _LO) & (F.col("odate") <= _HI)
    full = spark.read.parquet(
        os.path.join(root, "v00001")).filter(pred).count()
    assert pruned.filter(pred).count() == full > 0


def test_binary_stats_columns_conservatively_kept(spark, tmp_path):
    """A stats column whose footer min/max is raw binary cannot ride
    JSON: the writer must SKIP its stats (not crash), and read_pruned
    must then keep every file for predicates on it."""
    o = load_table(spark, _SF, "orders").select(
        "o_orderkey",
        F.sha2(F.col("o_orderkey").cast("string"), 256)
        .cast("binary").alias("bkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
    )
    root = str(tmp_path / "orders_bin")
    MF.write_version_with_manifest(
        o.repartition(4), root, stats_cols=("bkey", "odate"))
    man = MF.read_manifest(root)
    assert all("bkey" not in e["stats"] and "odate" in e["stats"]
               for e in man["files"])
    _, total, read = MF.read_pruned(spark, root, "bkey", "aa", "bb")
    assert read == total  # no stats -> nothing skippable


def test_schema_evolution_reader_contract(spark, tmp_path):
    """read_version_evolved: added columns backfill as typed NULLs,
    removed columns drop, column order follows the current schema,
    and a retype raises (round-9 schema-on-read)."""
    import pytest

    root = str(tmp_path / "evo")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, old STRING")
    V.write_version(v1, root)
    v2 = spark.createDataFrame([(3, 30)], "id long, extra long")
    V.write_version(v2, root)

    e1 = V.read_version_evolved(spark, root, 1)
    assert e1.columns == ["id", "extra"]  # current order, 'old' dropped
    assert [f.dataType.simpleString() for f in e1.schema.fields] == [
        "bigint", "bigint"]
    rows = sorted((r.id, r.extra) for r in e1.collect())
    assert rows == [(1, None), (2, None)]
    # unions cleanly with the current version
    both = e1.unionByName(V.read_version_evolved(spark, root, 2))
    assert both.count() == 3

    v3 = spark.createDataFrame([(4, "x")], "id long, extra STRING")
    V.write_version(v3, root)  # retype extra: long -> string
    with pytest.raises(ValueError, match="retyped"):
        V.read_version_evolved(spark, root, 2)
    changes = V.schema_changes(v1.schema, v3.schema)
    assert changes == {"added": ["extra"], "removed": ["old"],
                       "retyped": []}


def test_optimistic_write_survives_version_collisions(spark, tmp_path):
    """write_version_optimistic (round-9): a pre-claimed version dir
    (a concurrent writer's mkdir) forces a retry with the next number;
    a slower writer never moves the pointer backward; the retry budget
    is a loud ceiling."""
    import pytest

    root = str(tmp_path / "opt")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    assert V.write_version_optimistic(df, root) == 1
    # concurrent writer claimed v2 (and will publish later)
    os.makedirs(os.path.join(root, "v00002"))
    v = V.write_version_optimistic(df, root)
    assert v == 3 and V.current_version(root) == 3
    # slower writer finishing an OLD claim must not regress the pointer
    V.write_version(df, root)  # v4 published
    assert V.current_version(root) == 4
    # simulate: a writer that claimed early, finished late — monotone
    # publish keeps the newest pointer
    cur_before = V.current_version(root)
    assert cur_before == 4
    # a TRUE race: the version list goes stale between listing and
    # claiming (another writer mkdirs first) — simulated by pinning
    # list_versions to a stale snapshot; the loop must retry the SAME
    # number, collide, and exhaust loudly
    stale = V.list_versions(root)

    real_list = V.list_versions
    V.list_versions = lambda r: list(stale)
    try:
        os.makedirs(os.path.join(root, f"v{stale[-1] + 1:05d}"))
        with pytest.raises(RuntimeError, match="lost the version race"):
            V.write_version_optimistic(df, root, max_retries=3)
    finally:
        V.list_versions = real_list
    # with the live listing the writer skips past the claim
    v = V.write_version_optimistic(df, root)
    assert v == stale[-1] + 2 and V.current_version(root) == v
    assert V.read_version(spark, root).count() == 10


def test_merge_on_read_deletes(spark, tmp_path):
    """MOR deletes (round-9): a delete wave publishes only tombstones;
    reads resolve base-minus-keys; waves stack; materialize compacts
    the chain; vacuum pins the base of a surviving MOR layer."""
    import pytest

    from bigdata_jobmatching_spark.sources import mor as M

    root = str(tmp_path / "mor")
    df = spark.range(100).selectExpr("id", "id * 3 AS v")
    V.write_version(df, root)  # v1 materialized

    v2 = M.delete_keys_mor(
        spark, root, spark.range(10).selectExpr("id"), ("id",))
    assert v2 == 2
    got = M.read_version_mor(spark, root)
    assert got.count() == 90
    assert got.filter(F.col("id") < 10).count() == 0
    # physical cost = |keys|: the MOR dir holds no data files
    files = [f for f in os.listdir(os.path.join(root, "v00002"))
             if f.endswith(".parquet")]
    assert files == []

    # second wave stacks
    M.delete_keys_mor(
        spark, root, spark.range(90, 95).selectExpr("id"), ("id",))
    assert M.read_version_mor(spark, root).count() == 85
    # time travel: the first wave's view is unchanged
    assert M.read_version_mor(spark, root, 2).count() == 90
    # plain read_version on a MOR dir cannot silently return data
    with pytest.raises(Exception):
        V.read_version(spark, root, 3).collect()

    # key-cols mismatch is loud
    with pytest.raises(ValueError, match="key_cols"):
        M.delete_keys_mor(
            spark, root, spark.range(1).selectExpr("id AS v"), ("v",))

    # materialize compacts the chain
    v4 = M.materialize_mor(spark, root)
    assert M.mor_info(root, v4) is None
    assert V.read_version(spark, root, v4).count() == 85

    # vacuum pins the base of a surviving MOR layer: publish another
    # MOR wave on top, then vacuum keep=1 — v1 must survive while the
    # materialized v4 is current... rollback to the chain head first
    V.rollback(root, 3)
    deleted = V.vacuum(root, keep=1, grace_seconds=0.0)
    # current=3 (MOR) -> pins 2 -> pins 1; v4 is the newest complete
    assert 1 not in deleted and 2 not in deleted and 3 not in deleted
    assert M.read_version_mor(spark, root).count() == 85


def test_pruned_scan_keeps_partition_column(spark, tmp_path):
    """Round-10 advice fix: a pruned scan of a hive-partitioned layout
    reconstructs the partition column (basePath), so its schema equals
    read_version's and predicates on the partition column work."""
    o = load_table(spark, _SF, "orders").select(
        "o_orderkey", "o_totalprice",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.year("o_orderdate").alias("yr"),
    )
    root = str(tmp_path / "orders_part")
    MF.write_version_with_manifest(
        o.repartition("yr"), root, stats_cols=("odate",),
        partition_by=("yr",))

    pruned, total, read = MF.read_pruned(spark, root, "odate", _LO, _HI)
    assert 0 < read < total
    # partition column present, same column set as the full read
    assert set(pruned.columns) == set(V.read_version(spark, root).columns)
    # predicate ON the partition column: pruned == full
    full_97 = V.read_version(spark, root).filter(F.col("yr") == 1997)
    assert pruned.filter(F.col("yr") == 1997).count() == full_97.count() > 0
    # and the empty-keep path keeps the partition column too
    nothing, _, read0 = MF.read_pruned(
        spark, root, "odate", "2090-01-01", "2090-12-31")
    assert read0 == 0 and "yr" in nothing.columns


def test_read_pruned_zero_file_manifest(spark, tmp_path):
    """Round-10 advice fix: a version whose manifest lists ZERO data
    files (empty staged write) reads as an empty relation under the
    declared schema instead of raising IndexError."""
    import glob
    import json as _json

    root = str(tmp_path / "empty_v")
    empty = load_table(spark, _SF, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
    ).limit(0)
    MF.audit_then_publish(empty, root, audits=(), stats_cols=("odate",))
    # this Spark config still emits one 0-row part file; reduce the
    # version to the TRUE zero-file state (the one AQE-pruned writers
    # produce) so the guard's exact branch is exercised
    vdir = os.path.join(root, "v00001")
    for f in glob.glob(os.path.join(vdir, "*.parquet")):
        os.remove(f)
    mpath = os.path.join(vdir, "_MANIFEST.json")
    with open(mpath) as fh:
        man = _json.load(fh)
    man["files"] = []
    with open(mpath, "w") as fh:
        _json.dump(man, fh)
    assert MF.read_manifest(root)["files"] == []

    pruned, total, read = MF.read_pruned(
        spark, root, "odate", "1990-01-01", "2099-12-31")
    assert (total, read) == (0, 0)
    assert pruned.count() == 0
    assert set(pruned.columns) == {"o_orderkey", "odate"}


def test_optimistic_pointer_self_heals(spark, tmp_path):
    """Round-10 advice fix: publishing drops append-only _PUBLISHED
    markers and every optimistic writer restores the pointer to the
    max published version — a lost pointer race is transient, not
    permanent."""
    root = str(tmp_path / "heal")
    df = spark.range(5).selectExpr("id", "id AS v")
    V.write_version_optimistic(df, root)
    V.write_version_optimistic(df, root)
    assert V.current_version(root) == 2
    # simulate the lost race: a lower writer's pointer swap landed
    # AFTER the higher publish (check-then-act interleave)
    V._set_pointer(root, 1)
    assert V.current_version(root) == 1  # regressed
    # the next optimistic writer self-heals past its own publish
    v = V.write_version_optimistic(df, root)
    assert v == 3 and V.current_version(root) == 3
    # markers track every publish
    assert V._max_published(root) == 3


def test_connected_components_mixed_endpoint_types(spark):
    """Round-10 advice fix: the small-graph fast path builds its
    output schema from BOTH endpoint columns, so int src + long dst
    (with component labels sourced from the dst side) round-trips."""
    from pyspark.sql import types as TT

    from bigdata_jobmatching_spark.operators.graph import (
        connected_components,
    )

    schema = TT.StructType([
        TT.StructField("m", TT.IntegerType()),
        TT.StructField("n", TT.LongType()),
    ])
    # component labels: {5,7,2} -> 2 (dst-sourced long), {9,8} -> 8
    edges = spark.createDataFrame(
        [(5, 2), (7, 2), (9, 8)], schema)
    got = {r.node: r.component
           for r in connected_components(edges).collect()}
    assert got == {2: 2, 5: 2, 7: 2, 8: 8, 9: 8}


def test_optimistic_writers_concurrent_stress(spark, tmp_path):
    """Round-10 review fix: N threads race optimistic commits; every
    writer gets a distinct version, all versions stay readable, and
    the pointer converges to the max published marker (the heal
    loop's contract) with no regression left behind."""
    import threading

    root = str(tmp_path / "race")
    df = spark.range(20).selectExpr("id", "id AS v")
    got, errs = [], []

    def writer():
        try:
            # retries >= writer count: with N writers all racing the
            # same next number, the last one to win needs up to N
            # claim attempts — the default 5 is for the 2-job case and
            # flakes under test load (seen once on a busy box)
            got.append(V.write_version_optimistic(df, root, max_retries=12))
        except Exception as e:  # noqa: BLE001 - collected for assert
            errs.append(e)

    threads = [threading.Thread(target=writer) for _ in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert sorted(got) == list(range(1, 7))  # distinct claimed versions
    assert V.current_version(root) == V._max_published(root) == 6
    for v in got:
        assert V.read_version(spark, root, version=v).count() == 20


def test_bloom_point_pruning_laws(spark, tmp_path):
    """Bloom file-skipping laws: (1) NO FALSE NEGATIVES — every
    present key's pruned scan returns exactly the base rows for that
    key; (2) skipping is real — an absent key reads fewer files than
    the total (with 16k bits and tiny files the FP rate is ~0);
    (3) answers are preserved bit-for-bit."""
    from bigdata_jobmatching_spark.sources.manifest import (
        read_point_pruned, write_version_with_blooms,
    )

    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 100).alias("v"),
        (F.col("id") % 8).cast("int").alias("g"),
    )
    root = str(tmp_path / "bloomed")
    write_version_with_blooms(
        df.repartition("g"), root,
        stats_cols=("k",), bloom_cols=("k",), partition_by=("g",),
    )
    # law 1 + 3: every 37th present key round-trips exactly
    for k in range(0, 500, 37):
        pruned, total, read = read_point_pruned(spark, root, "k", k)
        rows = pruned.filter(F.col("k") == k).collect()
        assert total == 8 and 1 <= read <= 8
        assert [(r.k, r.v) for r in rows] == [(k, k * 7 % 100)]
    # law 2: an absent key skips (bitsets are sparse at this size)
    _, total, read = read_point_pruned(spark, root, "k", 10_000_019)
    assert total == 8 and read < total


def test_bloom_missing_column_keeps_all(spark, tmp_path):
    """A bloom requested on a column the files don't carry must keep
    every file (conservative, never answer-changing)."""
    from bigdata_jobmatching_spark.sources.manifest import (
        read_point_pruned, write_version_with_blooms,
    )

    df = spark.range(0, 40).select(F.col("id").alias("k"))
    root = str(tmp_path / "nobloom")
    write_version_with_blooms(
        df.repartition(4), root, stats_cols=("k",), bloom_cols=("zz",),
    )
    pruned, total, read = read_point_pruned(spark, root, "zz", 7)
    assert read == total == 4
    assert pruned.count() == 40


def test_join_strategy_from_manifest_stats(spark, tmp_path):
    """The stats-catalog join decision: a small versioned dim joins
    via an explicit broadcast (BroadcastHashJoin in the plan, no
    exchange on the big side); pushing the threshold below its row
    count flips the decision to shuffle — both read ONLY the
    manifest, never the data, to decide."""
    from bigdata_jobmatching_spark.sources.manifest import (
        join_versioned_by_stats, manifest_row_count,
        write_version_with_manifest,
    )

    dim = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr"))
    root = str(tmp_path / "dim")
    write_version_with_manifest(dim, root, stats_cols=("k",))
    assert manifest_row_count(root) == 50

    big = spark.range(0, 10_000).select((F.col("id") % 50).alias("k"))
    joined, strat = join_versioned_by_stats(big, spark, root, "k")
    assert strat == "broadcast"
    assert "BroadcastHashJoin" in joined._jdf.queryExecution().executedPlan().toString()
    assert joined.count() == 10_000

    joined2, strat2 = join_versioned_by_stats(
        big, spark, root, "k", broadcast_max_rows=10)
    assert strat2 == "shuffle"
    assert joined2.count() == 10_000


def test_compaction_preserves_blooms(spark, tmp_path):
    """compact_version(bloom_cols=...) re-derives per-file bitsets
    for the new layout: point lookups keep skipping after compaction
    and answers are unchanged."""
    from bigdata_jobmatching_spark.sources.manifest import (
        compact_version, read_manifest, read_point_pruned,
        write_version_with_blooms,
    )

    df = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 8).cast("int").alias("g"))
    root = str(tmp_path / "bl")
    write_version_with_blooms(
        df.repartition("g"), root,
        stats_cols=("k",), bloom_cols=("k",), partition_by=("g",))
    compact_version(spark, root, target_files=2,
                    stats_cols=("k",), bloom_cols=("k",))
    man = read_manifest(root)
    assert all("bloom" in e and "k" in e["bloom"] for e in man["files"])
    pruned, total, read = read_point_pruned(spark, root, "k", 123)
    assert pruned.filter(F.col("k") == 123).count() == 1
    _, total2, read2 = read_point_pruned(spark, root, "k", 99_999_989)
    assert read2 < total2


def test_pointer_swap_concurrent_unique_temps(tmp_path):
    """Round-11 concurrency fix, pinned: _set_pointer used a SHARED
    '_CURRENT.tmp' name, so two concurrent publishers could truncate
    each other's in-flight temp and the loser's os.replace raised
    FileNotFoundError after the winner moved the file away (the rare
    full-suite failure of the OCC stress test). 16 threads x 50 swaps
    hammer the swap directly: no exceptions, the final pointer parses,
    and it is one of the values actually written."""
    import threading

    root = str(tmp_path / "ptr")
    os.makedirs(root)
    errs: list[Exception] = []
    written: set[int] = set()

    def swapper(tid: int) -> None:
        try:
            for i in range(50):
                v = tid * 100 + i + 1
                written.add(v)
                V._set_pointer(root, v)
        except Exception as e:  # noqa: BLE001 - collected for assert
            errs.append(e)

    threads = [threading.Thread(target=swapper, args=(t,))
               for t in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs[:3]
    assert V.current_version(root) in written
    # no leaked temp files beyond the pointer itself
    leftovers = [n for n in os.listdir(root) if n.endswith(".tmp")]
    assert leftovers == []
