"""FFD packing invariants: the rows-only registry entry's
correctness contract (no SQL oracle can express the mutable per-pack
state, so the properties are pinned here instead)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bigdata_jobmatching_spark.operators.packing import ffd_pack

BUDGET = 100


def _mk(spark, rows):
    return spark.createDataFrame(
        [(g, i, t) for (g, i, t) in rows], "src string, id long, toks long"
    )


def _packed(spark, rows):
    return ffd_pack(_mk(spark, rows), ["src"], "id", "toks", BUDGET).collect()


def test_ffd_budget_and_coverage(spark):
    rows = [("a", i, (i * 37) % 90 + 5) for i in range(40)]
    out = _packed(spark, rows)
    # every item exactly once, token counts preserved
    assert sorted((r.id, r.toks) for r in out) == sorted((i, t) for _, i, t in rows)
    # no pack over budget; pack_fill consistent with members
    fills: dict[int, int] = {}
    for r in out:
        fills.setdefault(r.pack_id, 0)
        fills[r.pack_id] += r.toks
    for r in out:
        assert fills[r.pack_id] == r.pack_fill
        assert r.pack_fill <= BUDGET
    # pack count can never beat the volume lower bound
    total = sum(t for _, _, t in rows)
    assert len(fills) >= math.ceil(total / BUDGET)


def test_ffd_oversized_items_get_own_pack(spark):
    out = _packed(spark, [("a", 1, 250), ("a", 2, 30), ("a", 3, 40)])
    by_id = {r.id: r for r in out}
    # the oversized doc sits alone (fill == its own size > budget)
    assert by_id[1].pack_fill == 250
    assert {r.pack_id for r in out if r.id != 1} != {by_id[1].pack_id}
    # the two small docs share one pack (30+40 <= 100)
    assert by_id[2].pack_id == by_id[3].pack_id


def test_ffd_deterministic_under_repartition(spark):
    rows = [("s%d" % (i % 3), i, (i * 53) % 120 + 1) for i in range(60)]
    df = _mk(spark, rows)
    a = sorted(
        tuple(r) for r in ffd_pack(df, ["src"], "id", "toks", BUDGET).collect()
    )
    b = sorted(
        tuple(r)
        for r in ffd_pack(
            df.repartition(7, "id"), ["src"], "id", "toks", BUDGET
        ).collect()
    )
    assert a == b


def test_ffd_packs_tighter_than_or_equal_greedy_chain(spark):
    # FFD's whole point: on a descending-sorted stream with first-fit
    # placement it needs no more packs than the naive sequential cut.
    # (Not a theorem against every heuristic - checked empirically on
    # this fixture family as a regression pin.)
    rows = [("a", i, t) for i, t in enumerate([60, 55, 45, 40, 35, 30, 25, 10])]
    out = _packed(spark, rows)
    n_ffd = len({r.pack_id for r in out})
    # sequential greedy (arrival order) pack count
    fill, n_seq = 0, 1
    for _, _, t in rows:
        if fill + t > BUDGET:
            n_seq += 1
            fill = t
        else:
            fill += t
    assert n_ffd <= n_seq
