"""Round-8 operator tests: rare-token prefiltered matching (exact-score
contract + top-k preservation) and the new loud-ceiling guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_jobmatching_spark.operators import matching as M


# --- prefiltered matching --------------------------------------------------
# Fixture designed so top-k preservation holds BY CONSTRUCTION: every
# non-skill score component is uniform (same location, same salary fit,
# same experience), so ranking is purely by skill overlap — and any
# pair sharing a rare skill (n_shared=2: rare + excel) strictly
# outranks any excel-only pair (n_shared=1). Each CV shares a rare
# skill with 4 of the 20 offers, so top-3 per candidate is entirely
# rare-sharing pairs.

_N = 20


def _fixture(spark):
    offers = spark.range(_N).select(
        F.col("id").alias("job_id"),
        F.array(
            F.concat(F.lit("r"), (F.col("id") % 5).cast("string")),
            F.lit("excel"),
        ).alias("skills"),
        F.lit("LOC_0").alias("localisation_id"),
        F.lit(100000.0).alias("salaire_min"),
        F.lit(200000.0).alias("salaire_max"),
        F.lit("Senior").alias("niveau_experience"),
    )
    cvs = spark.range(_N).select(
        F.col("id").alias("cv_id"),
        F.array(
            F.concat(F.lit("r"), (F.col("id") % 5).cast("string")),
            F.lit("excel"),
        ).alias("competences"),
        F.lit("LOC_0").alias("localisation_souhaitee_id"),
        F.lit(150000.0).alias("salaire_souhaite"),
        F.lit(8).cast("int").alias("annees_experience"),
    )
    return offers, cvs


def test_prefiltered_scores_are_exact(spark):
    """The semantic contract vs the capped variant: pruning changes
    candidate RECALL, never a survivor's score — prefiltered output
    must equal the full all-pairs matching restricted to pairs sharing
    at least one rare skill, scores bit-identical."""
    offers, cvs = _fixture(spark)
    full = M.match_offers_cvs(offers, cvs)  # all-pairs via 'excel'
    pre = M.match_offers_cvs_prefiltered(
        offers, cvs, max_skill_df_frac=0.5)  # r* df=0.2 kept, excel dropped

    # expected survivors: pairs with matching rare skill (id % 5 equal)
    full_rare = full.filter(
        (F.col("job_id") % 5) == (F.col("candidate_id") % 5))
    got = sorted(map(tuple, pre.collect()))
    want = sorted(map(tuple, full_rare.collect()))
    assert got == want
    assert len(got) == _N * (_N // 5)  # 4 rare-sharing offers per CV
    # every survivor's n_shared counted the dropped 'excel' too:
    # skill_pct = 2/2 = 1.0, not the capped variant's 1/2
    assert all(r[2] == 1.0 for r in got)


def test_prefiltered_preserves_topk(spark):
    """Top-k preservation on a corpus where every true top-k pair
    shares a rare skill: prefiltered top-k == exact all-pairs top-k."""
    offers, cvs = _fixture(spark)
    k = 3
    full_topk = M.top_matches_per_candidate(
        M.match_offers_cvs(offers, cvs), k=k)
    pre_topk = M.top_matches_per_candidate(
        M.match_offers_cvs_prefiltered(offers, cvs, max_skill_df_frac=0.5),
        k=k)
    got = sorted(map(tuple, pre_topk.collect()))
    want = sorted(map(tuple, full_topk.collect()))
    assert got == want
    assert len(got) == _N * k


def test_prefiltered_requires_a_cap(spark):
    offers, cvs = _fixture(spark)
    with pytest.raises(ValueError, match="uncapped prefilter"):
        M.match_offers_cvs_prefiltered(offers, cvs)


# --- loud-ceiling guards (r7 ADVICE) ----------------------------------------

def test_distribution_drift_degenerate_split_raises(spark, tmp_path):
    """Single-day lake => every event in one half => t1 or t2 = 0.
    DuckDB errors on the zero divisor; the Spark side must raise
    loudly too instead of silently yielding NULL shares."""
    from bigdata_jobmatching_spark.plans.catalog import load_all

    spec = load_all()["events_distribution_drift"]
    one_day = spark.createDataFrame(
        [("click", "2024-01-01 10:00:00"), ("view", "2024-01-01 11:00:00")],
        "event_type string, ts_str string",
    ).select("event_type", F.col("ts_str").cast("timestamp").alias("ts"))
    sf = str(tmp_path / "sfdeg")
    one_day.write.parquet(f"{sf}/events.parquet")
    with pytest.raises(Exception, match="degenerate half-split"):
        spec.spark(spark, sf).collect()
