"""Round-14 (optimization round) pins.

Optimization-round rule: every rewrite must keep results identical.
These tests pin the equivalences the r14 plan rewrites rely on
locally, so a regression fails in CI before the driver gate sees it:

- hybrid census == exact census on the smoke corpus (r13 advice: the
  proposal stage is an empirically-bounded heuristic with no local
  regression test — only the gate oracle caught a recall miss);
- the single-scan explode corpus of fuzzy_title_pairs equals the
  two-branch union formulation it replaced;
- the size-ratio prefilter in front of every pairwise Jaccard verify
  is lossless (J <= min/max over set sizes), pinned against the
  unfiltered formulation;
- minhash_lsh_pairs' payload-free candidate join (bare ids through
  band join + distinct, shingles attached once after) equals the
  payload-carrying formulation it replaced.
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


def test_jaccard_pairs_size_prefilter_lossless(spark):
    """r14 rewrite: docs_jaccard_pairs prunes in-block pairs with
    5*min(|A|,|B|) < 4*max before the intersect (J <= min/max, so no
    J >= 0.8 pair can be pruned). Pin against the unfiltered
    formulation on the smoke corpus."""
    from bigdata_jobmatching_spark.functions import similarity as S
    from bigdata_jobmatching_spark.functions import text as X
    from bigdata_jobmatching_spark.operators import dedup as D
    from bigdata_jobmatching_spark.plans.dedup_queries import (
        _hashed, _jaccard_pairs,
    )
    from bigdata_jobmatching_spark.sources.io import fan_out, load_table

    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in _jaccard_pairs(spark, SF).collect())

    d = (
        fan_out(load_table(spark, SF, "documents"))
        .withColumn("blk", F.concat_ws("|", "lang", "source"))
        .withColumn("tokset", _hashed(F.array_distinct(X.tokens(F.col("text")))))
        .select("blk", "doc_id", "tokset")
    )
    pairs = D.pairwise_candidates(d, "blk", "doc_id", ["tokset"])
    want = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in pairs.withColumn(
            "jaccard", S.jaccard(F.col("tokset_a"), F.col("tokset_b")))
        .filter(F.col("jaccard") >= 0.8)
        .select(F.col("doc_id_a").alias("id_a"),
                F.col("doc_id_b").alias("id_b"), "jaccard")
        .collect())
    assert len(want) > 0
    assert got == want


def test_minhash_lsh_pairs_payload_free_equals_carrying(spark):
    """r14 rewrite: the LSH candidate join/distinct runs on bare ids;
    shingles are attached once after. Pin against the old
    payload-carrying formulation."""
    from bigdata_jobmatching_spark.functions import similarity as S
    from bigdata_jobmatching_spark.operators import dedup as D
    from bigdata_jobmatching_spark.sources.io import fan_out, load_table

    d = load_table(spark, SF, "documents")
    got = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in D.minhash_lsh_pairs(
            d, "doc_id", "text", shingle_n=3, num_hashes=32,
            num_bands=8, jaccard_threshold=0.6).collect())

    sh = fan_out(d.select("doc_id", "text")).select(
        F.col("doc_id"),
        S.word_ngrams(F.col("text"), 3).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sig = sh.withColumn("sig", S.minhash_signature(F.col("shingles"), 32))
    banded = sig.select(
        "doc_id", "shingles",
        F.explode(S.minhash_bands(F.col("sig"), 8, 4)).alias("band"),
    )
    a = banded.select("band", F.col("doc_id").alias("id_a"),
                      F.col("shingles").alias("sh_a"))
    b = banded.select("band", F.col("doc_id").alias("id_b"),
                      F.col("shingles").alias("sh_b"))
    want = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 6))
        for r in a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("jaccard", S.jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= 0.6)
        .select("id_a", "id_b", "jaccard")
        .collect())
    assert len(want) > 0
    assert got == want
