"""Streaming serving of the diversified recommendations dashboard.

The reference promises the "Top 20 offres-CVs" dashboard
(PLAN_REALISATION.md:483-511) as a BI artifact refreshed from batch
jobs; a production recommender serves it when a candidate ARRIVES.
This module is that face: arriving CVs come in as a stream, each
micro-batch runs the EXACT batch serving pipeline
(plans/domain_queries.candidate_recs_for — prefiltered matching for
relevance, skill-set Jaccard for diversity, the shared integer-exact
MMR greedy) against a FROZEN offers corpus, and the per-epoch results
land idempotently.

Correctness story: the pipeline is per-candidate independent (the
rare-skill prefilter threshold is a function of offers only;
matching, pooling, sims and the greedy all partition by candidate),
so micro-batched serving is bit-equal to the one-shot batch dashboard
restricted to the same candidates. That equivalence is pinned twice:
externally by the ``candidate_recs_incremental`` gate query (three
arrival slices vs the full-dashboard oracle SQL) and locally by
``tests/test_streaming.py::test_stream_candidate_recs_matches_batch``.

Scale shape: the offers side (skills, posting lists) is materialized
once per stream start (eager checkpoint) — per-epoch cost is linear
in the arriving slice through the posting-list prefilter, with the
pool-bounded sims and one-Arrow-pass greedy of the batch query.
Epoch landing is ``epoch=N`` overwrite: serving against a frozen
corpus is deterministic, so a crash-replayed epoch rewrites identical
rows (the exactly-once discipline shared with the corpus stages).

Re-arrivals are a FEATURE, not a defect: a candidate whose CV
re-arrives (profile update, upstream replay) is re-served in the new
epoch, and the store's read contract is LATEST-WINS per candidate —
:func:`read_current_recs` resolves it (max epoch per candidate, the
merge-on-read posture of sources/mor.py applied at serving grain).
Raw ``spark.read.parquet(out_root)`` is the full serving HISTORY;
dashboards read through the resolver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def stream_candidate_recs(
    spark: SparkSession,
    sf: str,
    cvs_stream: DataFrame,
    out_root: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Serve diversified recs for each micro-batch of arriving CVs.

    ``cvs_stream`` must carry the CV serving schema (the
    ``_tiered_cvs`` shape: cv_id, competences, location/salary/
    experience attributes) — the ingest normalization stages
    (streaming/ingest.py) produce it upstream.
    """
    from ..plans.domain_queries import _tiered_offers, candidate_recs_for

    offers = _tiered_offers(spark, sf).localCheckpoint(eager=True)

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        recs = candidate_recs_for(spark, sf, batch, offers)
        recs.write.mode("overwrite").parquet(f"{out_root}/epoch={epoch_id}")

    writer = (
        cvs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_current_recs(spark: SparkSession, out_root: str) -> DataFrame:
    """The serving store's read contract: each candidate's CURRENT
    recommendations — the rows of their newest epoch (latest-wins, so
    a re-served candidate's stale epochs are superseded, never
    double-read). One window at candidate grain over the compact
    (candidate, epoch) store; returns the batch-query columns."""
    hist = spark.read.parquet(out_root)
    latest = hist.groupBy("candidate_id").agg(
        F.max("epoch").alias("epoch"))
    return hist.join(latest, ["candidate_id", "epoch"]).drop("epoch")
