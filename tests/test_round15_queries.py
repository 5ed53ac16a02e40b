"""Round-15 (optimization round 2/2) pins.

Optimization-round rule: every rewrite must keep results identical.
These tests pin the equivalences the r15 plan rewrites rely on, plus
the r14-ADVICE losslessness pins that were missing:

- the 0.9 keep_best/cluster_sizes size prefilter, the 0.18 ngram
  prefilter and the rounding-slackened 799999/1000000 _minhash_md5
  prefilter are pinned against their unfiltered formulations
  (r14 advice #3 — only the 0.8 jaccard prefilter had a pin);
- mmr_greedy accepts unordered (a < b) symmetric sims and yields the
  exact trajectory of the ordered (a != b) formulation;
- match_offers_cvs with the job_id-partitioned skill stream equals
  the unpartitioned formulation;
- semantic_dedup_pairs with the (cluster, sig)-partitioned dot stage
  and sig-augmented pair grouping equals the r14 formulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_keep_best_prefilter_lossless(spark):
    """r14 batch-1: _block_dup_frames prunes 10*min < 9*max pairs
    before the 0.9-Jaccard intersect. Pin the dup-pair set against
    the unfiltered formulation (covers keep_best AND cluster_sizes,
    which share the frame)."""
    from bigdata_jobmatching_spark.functions import similarity as S
    from bigdata_jobmatching_spark.functions import text as X
    from bigdata_jobmatching_spark.operators import dedup as D
    from bigdata_jobmatching_spark.plans.dedup_queries import (
        _block_dup_frames, _hashed,
    )
    from bigdata_jobmatching_spark.sources.io import fan_out, load_table

    _, dup_pairs = _block_dup_frames(spark, SF)
    got = _rows(
        dup_pairs.select(
            F.col("doc_id_a").alias("id_a"),
            F.col("doc_id_b").alias("id_b"),
            F.round("jaccard", 6).alias("j"),
        ),
        ("id_a", "id_b", "j"),
    )

    d = (
        fan_out(load_table(spark, SF, "documents"))
        .withColumn("blk", F.concat_ws("|", "lang", "source"))
        .withColumn("tokset", _hashed(F.array_distinct(X.tokens(F.col("text")))))
        .select("blk", "doc_id", "tokset")
    )
    want = _rows(
        D.pairwise_candidates(d, "blk", "doc_id", ["tokset"])
        .withColumn("jaccard", S.jaccard(F.col("tokset_a"), F.col("tokset_b")))
        .filter(F.col("jaccard") >= 0.9)
        .select(
            F.col("doc_id_a").alias("id_a"),
            F.col("doc_id_b").alias("id_b"),
            F.round("jaccard", 6).alias("j"),
        ),
        ("id_a", "id_b", "j"),
    )
    assert len(want) > 0
    assert got == want


def test_ngram_prefilter_lossless(spark):
    """r14 batch-1: docs_ngram_jaccard_pairs prunes 50*min < 9*max
    before the 0.18-Jaccard verify. Pin against the unfiltered
    formulation."""
    from bigdata_jobmatching_spark.functions import similarity as S
    from bigdata_jobmatching_spark.operators import dedup as D
    from bigdata_jobmatching_spark.plans.dedup_queries import _ngram_pairs
    from bigdata_jobmatching_spark.sources.io import fan_out, load_table

    got = _rows(
        _ngram_pairs(spark, SF).withColumn("jaccard", F.round("jaccard", 6)),
        ("id_a", "id_b", "jaccard"),
    )

    d = (
        fan_out(load_table(spark, SF, "documents"))
        .withColumn("blk", F.concat_ws("|", "lang", "source"))
        .withColumn("sh", S.word_ngrams(F.col("text"), 3))
        .select("blk", "doc_id", "sh")
    )
    want = _rows(
        D.pairwise_candidates(d, "blk", "doc_id", ["sh"])
        .withColumn("jaccard", S.jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= 0.18)
        .select(
            F.col("doc_id_a").alias("id_a"),
            F.col("doc_id_b").alias("id_b"),
            F.round("jaccard", 6).alias("jaccard"),
        ),
        ("id_a", "id_b", "jaccard"),
    )
    assert len(want) > 0
    assert got == want


def test_minhash_md5_prefilter_lossless(spark):
    """r14 batch-1 + r15 overflow fix: the 1000000/799999 size
    prefilter (long-cast) in _minhash_md5 absorbs the 6-dp rounding
    of the verify and never drops a qualifying pair. Pin against the
    unfiltered formulation."""
    from bigdata_jobmatching_spark.functions import similarity as S
    from bigdata_jobmatching_spark.plans.dedup_queries import (
        _MMH_THRESHOLD, _minhash_md5, _mmh_base_and_candidates,
    )

    got = _rows(_minhash_md5(spark, SF), ("id_a", "id_b", "jaccard"))

    base, cand = _mmh_base_and_candidates(spark, SF)
    ts = base.select("doc_id", "ts")
    want = _rows(
        cand.join(ts.select(F.col("doc_id").alias("id_a"),
                            F.col("ts").alias("ts_a")), "id_a")
        .join(ts.select(F.col("doc_id").alias("id_b"),
                        F.col("ts").alias("ts_b")), "id_b")
        .withColumn("jaccard", F.round(S.jaccard(F.col("ts_a"), F.col("ts_b")), 6))
        .filter(F.col("jaccard") >= _MMH_THRESHOLD)
        .select("id_a", "id_b", "jaccard"),
        ("id_a", "id_b", "jaccard"),
    )
    assert len(want) > 0
    assert got == want


def test_mmr_greedy_unordered_sims_equals_ordered(spark):
    """r15: mmr_greedy mirrors unordered (a < b) symmetric sims rows
    into both orientations internally; the trajectory must equal the
    ordered (a != b) formulation's."""
    from bigdata_jobmatching_spark.operators.similarity_search import mmr_greedy

    pool = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 90), (1, 12, 80), (1, 13, 70),
         (2, 20, 50), (2, 21, 50), (2, 22, 10),
         (3, 30, 5)],
        "query_id long, vec_id_ long, rel long",
    )
    unordered = [
        (1, 10, 11, 95), (1, 10, 12, 5), (1, 11, 12, 5), (1, 10, 13, 50),
        (1, 11, 13, 60), (1, 12, 13, 70),
        (2, 20, 21, 99), (2, 20, 22, 1), (2, 21, 22, 1),
    ]
    sims_u = spark.createDataFrame(
        unordered, "query_id long, a long, b long, sim long")
    sims_o = spark.createDataFrame(
        unordered + [(q, b, a, s) for q, a, b, s in unordered],
        "query_id long, a long, b long, sim long")

    cols = ("query_id", "vec_id_", "rel", "score", "rnk")
    got = _rows(mmr_greedy(pool, sims_u, k=3, lam=(7, 3)), cols)
    want = _rows(mmr_greedy(pool, sims_o, k=3, lam=(7, 3)), cols)
    assert len(want) > 0
    assert got == want


def test_matching_partitioned_skill_stream_equals_plain(spark):
    """r15: match_offers_cvs hash-partitions the offer-side skill
    stream by job_id before the inverted-index join (so the pair
    aggregate reuses the partitioning). Rows must be identical to the
    straightforward formulation."""
    from bigdata_jobmatching_spark.operators.matching import (
        _score_pairs, match_offers_cvs,
    )
    from bigdata_jobmatching_spark.plans.domain_queries import (
        _derived_cvs, _derived_offers,
    )

    offers = _derived_offers(spark, SF)
    cvs = _derived_cvs(spark, SF)
    cols = ("job_id", "candidate_id", "skill_match_pct", "location_match_pct",
            "salary_match_pct", "experience_match_pct", "match_score")
    got = _rows(match_offers_cvs(offers, cvs), cols)

    norm_skills = F.array_distinct(F.transform(
        F.coalesce(F.col("skills"), F.array()), lambda s: F.lower(F.trim(s))))
    norm_comp = F.array_distinct(F.transform(
        F.coalesce(F.col("competences"), F.array()),
        lambda s: F.lower(F.trim(s))))
    o_sk = offers.select("job_id", F.explode(norm_skills).alias("skill"))
    c_sk = cvs.select("cv_id", F.explode(norm_comp).alias("skill"))
    shared = (
        o_sk.join(c_sk, "skill")
        .groupBy("job_id", "cv_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    o_dim = offers.select(
        "job_id", F.size(norm_skills).alias("n_offer_skills"),
        F.col("localisation_id").alias("o_loc"),
        "salaire_min", "salaire_max",
        F.col("niveau_experience").alias("o_exp"),
    )
    c_dim = cvs.select(
        "cv_id", F.col("localisation_souhaitee_id").alias("c_loc"),
        F.col("salaire_souhaite"), F.col("annees_experience"),
    )
    want = _rows(
        _score_pairs(shared.join(o_dim, "job_id").join(F.broadcast(c_dim), "cv_id")),
        cols,
    )
    assert len(want) > 0
    assert got == want


def test_semantic_pairs_block_partitioned_equals_r14(spark):
    """r15: semantic_dedup_pairs partitions the long-form table by
    (cluster, sig) and adds sig to the pair grouping keys (both
    members share one block, so groups are unchanged). Pin against
    the r14 formulation."""
    from bigdata_jobmatching_spark.operators import dedup as D
    from bigdata_jobmatching_spark.sources.io import load_table

    e = load_table(spark, SF, "embeddings")
    cols = ("cluster", "id_a", "id_b", "dot", "da", "db", "drop_id")
    got = _rows(
        D.semantic_dedup_pairs(e, "vec_id", "embedding", details=True), cols)

    F_ = F
    blocks = D.semantic_blocks(e, "vec_id", "embedding")
    v, asg, norms = blocks.v, blocks.asg, blocks.norms
    a = v.select("cluster", "sig", F_.col("__id").alias("id_a"), "j",
                 F_.col("q").alias("qa"))
    b = v.select("cluster", "sig", F_.col("__id").alias("id_b"), "j",
                 F_.col("q").alias("qb"))
    dots = (
        a.join(b, ["cluster", "sig", "j"])
        .filter(F_.col("id_a") < F_.col("id_b"))
        .groupBy("cluster", "id_a", "id_b")
        .agg(F_.sum(F_.col("qa") * F_.col("qb")).alias("dot"))
    )
    tau_num, tau_den = 49, 400
    dec = lambda c: F_.col(c).cast("decimal(38,0)")  # noqa: E731
    want = _rows(
        dots
        .join(F_.broadcast(norms.select(F_.col("__id").alias("id_a"),
                                        F_.col("n2").alias("na"))), "id_a")
        .join(F_.broadcast(norms.select(F_.col("__id").alias("id_b"),
                                        F_.col("n2").alias("nb"))), "id_b")
        .join(F_.broadcast(asg.select(F_.col("__id").alias("id_a"),
                                      F_.col("seed_dist").alias("da"))), "id_a")
        .join(F_.broadcast(asg.select(F_.col("__id").alias("id_b"),
                                      F_.col("seed_dist").alias("db"))), "id_b")
        .filter(
            (F_.col("dot") >= 0)
            & (dec("dot") * dec("dot") * F_.lit(tau_den).cast("decimal(38,0)")
               >= dec("na") * dec("nb") * F_.lit(tau_num).cast("decimal(38,0)"))
        )
        .withColumn(
            "drop_id",
            F_.when(F_.col("db") < F_.col("da"), F_.col("id_b"))
            .when(F_.col("db") > F_.col("da"), F_.col("id_a"))
            .otherwise(F_.col("id_b")),
        )
        .select(*cols),
        cols,
    )
    assert len(want) > 0
    assert got == want
