"""Round-14 (optimization round) pins.

Optimization-round rule: every rewrite must keep results identical.
These tests pin the equivalences the r14 plan rewrites rely on
locally, so a regression fails in CI before the driver gate sees it:

- hybrid census == exact census on the smoke corpus (r13 advice: the
  proposal stage is an empirically-bounded heuristic with no local
  regression test — only the gate oracle caught a recall miss);
- the single-scan explode corpus of fuzzy_title_pairs equals the
  two-branch union formulation it replaced.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_hybrid_census_equals_exact_census(spark):
    """_ss_family_census_hybrid's proposal stage (half-threshold +
    short-doc floor) is a measured heuristic, not a guarantee; pin
    hybrid == exact on the smoke corpus so a threshold/partner-logic
    regression fails here before the gate (r13 advice)."""
    from bigdata_jobmatching_spark.plans.dedup_queries import (
        _ss_family_census,
        _ss_family_census_hybrid,
    )

    cols = ("grp", "n_members", "kept_id", "kept_len", "sum_member_ids")
    exact = sorted(
        tuple(r[c] for c in cols)
        for r in _ss_family_census(spark, SF).collect())
    hybrid = sorted(
        tuple(r[c] for c in cols)
        for r in _ss_family_census_hybrid(spark, SF).collect())
    assert len(exact) > 0
    assert hybrid == exact


def test_fuzzy_pairs_single_scan_corpus_equals_union(spark):
    """r14 rewrite: the planted-twin corpus is built in ONE scan via a
    conditional explode instead of a two-branch union (which made the
    optimizer duplicate the oversized-block subtree per consumer).
    The rows must be identical to the union formulation."""
    from bigdata_jobmatching_spark.operators import dedup as D
    from bigdata_jobmatching_spark.plans.dedup_queries import _fuzzy_pairs
    from bigdata_jobmatching_spark.sources.io import load_table

    got = sorted(
        (r.id_a, r.id_b, r.distance)
        for r in _fuzzy_pairs(spark, SF).collect())

    p = load_table(spark, SF, "part").select("p_partkey", "p_name")
    twins = p.filter(F.col("p_partkey") % 5 == 0).select(
        (F.col("p_partkey") + 1_000_000).alias("p_partkey"),
        F.concat(F.col("p_name"), F.lit("aa")).alias("p_name"),
    )
    corpus = p.unionByName(twins)
    want = sorted(
        (r.id_a, r.id_b, r.distance)
        for r in D.levenshtein_pairs(
            corpus, "p_partkey", "p_name", max_distance=3).collect())
    assert len(want) > 0
    assert got == want
