"""Round-12 additions: the winnowing-selected substring-family scale
face and the incremental serving face of the diversified dashboard.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_winnowed_windows_guarantee_and_subset(spark):
    """Winnowing invariants on constructed docs: (a) every selected
    fingerprint is one of the doc's exact k-window hashes; (b) two
    docs sharing a token run of >= k + w - 1 tokens share at least
    one selected fingerprint (the MOSS guarantee); (c) docs shorter
    than k + w - 1 tokens emit nothing."""
    from bigdata_jobmatching_spark.operators import dedup as D

    k, w = 8, 4
    run = " ".join(f"r{i}" for i in range(k + w - 1))  # 11 shared tokens
    rows = [
        (1, run + " " + " ".join(f"a{i}" for i in range(20))),
        (2, " ".join(f"b{i}" for i in range(20)) + " " + run),
        (3, " ".join(f"t{i}" for i in range(k + w - 2))),  # 10 tokens
        (4, " ".join(f"c{i}" for i in range(30))),         # unrelated
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    wins = {(r.doc_id, r.h)
            for r in D.substring_windows(docs, k=k).collect()}
    fps = {(r.doc_id, r.h)
           for r in D.winnowed_windows(docs, k=k, w=w).collect()}
    assert fps <= wins                                   # (a) subset
    fp1 = {h for d, h in fps if d == 1}
    fp2 = {h for d, h in fps if d == 2}
    fp4 = {h for d, h in fps if d == 4}
    assert fp1 & fp2                                     # (b) guarantee
    assert not (fp1 & fp4) and not (fp2 & fp4)
    assert not any(d == 3 for d, _ in fps)               # (c) too short
    # thinning actually happened (the point of the scale face)
    assert len(fps) < len(wins)


def test_winnowed_family_census_agrees_on_boilerplate(spark):
    """On the defect class the stage exists for — families built from
    LONG shared runs (>50% duplicated windows) — the winnowed census
    finds exactly the exact census's families: same groups, same
    keep-best choice. (On marginal real-corpus docs the two faces
    legitimately differ — fingerprint-grain heavy rule — which is why
    each carries its own oracle.)"""

    f1 = " ".join(f"w{i}" for i in range(40))
    f2 = " ".join(f"v{i}" for i in range(40))
    mid = " ".join(f"w{i}" for i in range(20, 60))
    rows = [
        (1, f1 + " tail one", "en", "a"),
        (2, f1 + " " + " ".join(f"w{i}" for i in range(40, 60)), "en", "a"),
        (3, mid + " tri", "en", "a"),
        (10, f2 + " x", "en", "a"),
        (11, f2 + " y", "en", "a"),
        (20, " ".join(f"solo{i}" for i in range(40)), "en", "a"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")

    from bigdata_jobmatching_spark.operators import dedup as D

    def census(wins_fn):
        wins = wins_fn(docs)
        stats = D.dup_stats_over(wins)
        heavy = stats.filter(
            F.col("n_dup_windows") * 1000 > 500 * F.col("n_windows")
        ).select("doc_id")
        fam = D.families_over(wins, heavy)
        return {tuple(r) for r in fam.collect()}

    exact = census(lambda d: D.substring_windows(d, k=8))
    winnowed = census(lambda d: D.winnowed_windows(d, k=8, w=4))
    assert exact == winnowed
    assert {g for _, g in exact} == {1, 10}  # two families, min-id labels


def test_winnowed_windows_rejects_non_power_of_two(spark):
    import pytest

    from bigdata_jobmatching_spark.operators import dedup as D

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        D.winnowed_windows(docs, k=6)
    with pytest.raises(ValueError):
        D.winnowed_windows(docs, k=8, w=3)
    # 0 passes the bare bit test (0 & -1 == 0) but must be rejected:
    # k=0 would hash single tokens, w=0 would skip winnowing (r12
    # advice fix pinned)
    with pytest.raises(ValueError):
        D.winnowed_windows(docs, k=0)
    with pytest.raises(ValueError):
        D.winnowed_windows(docs, k=8, w=0)


def test_candidate_recs_incremental_equals_full(spark, sf_dir):
    """Per-candidate independence, pinned locally: serving the
    population in three arrival slices (the gate query's shape) is
    row-identical to the one-shot dashboard."""
    from bigdata_jobmatching_spark.plans.catalog import load_all

    qs = load_all()
    full = {tuple(r) for r in
            qs["candidate_recs_diversified"].spark(spark, sf_dir).collect()}
    inc = {tuple(r) for r in
           qs["candidate_recs_incremental"].spark(spark, sf_dir).collect()}
    assert full == inc and len(full) > 0
