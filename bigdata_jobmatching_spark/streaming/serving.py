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
from pyspark.sql.utils import AnalysisException

from .corpus_stream import benign_analysis_error


def _persistent_rdd_ids(spark: SparkSession) -> dict[int, object]:
    """{rdd id: java rdd} for every block-manager-resident RDD —
    localCheckpoint'ed frames included (they are persisted RDDs with
    truncated lineage). MEASUREMENT helper for the storage-bounded
    stream tests; the epoch cleanup itself uses the scoped
    :func:`_free_checkpoints` (a before/after diff here would also
    free checkpoints a CONCURRENT workload on the same session
    created mid-epoch — and a localCheckpoint's data is
    unrecoverable once unpersisted)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {e.getKey(): e.getValue() for e in jmap.entrySet().toArray()}


def _free_checkpoints(frames: list[DataFrame]) -> None:
    """Free exactly the given localCheckpoint'ed frames' block-manager
    storage (each frame's analyzed plan is a LogicalRDD over the
    checkpointed RDD — unpersist that specific RDD). Deterministic
    and SCOPED: nothing another workload checkpointed is touched.
    The frames are dead afterwards (truncated lineage, no recompute),
    so call only at the end of an epoch whose outputs are written."""
    for df in frames:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)


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
        # The batch pipeline eagerly checkpoints its pool/sims frames;
        # left to Python GC those blocks accumulate in executor
        # storage across epochs of a long stream (r12 advice). Track
        # exactly the checkpoints this epoch creates and free them
        # after the write — the stream-lifetime offers checkpoint is
        # never in the list.
        track: list[DataFrame] = []
        try:
            recs = candidate_recs_for(spark, sf, batch, offers, track=track)
            recs.write.mode("overwrite").parquet(f"{out_root}/epoch={epoch_id}")
        finally:
            _free_checkpoints(track)

    writer = (
        cvs_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bootstrap_offer_serving(
    spark: SparkSession,
    sf: str,
    out_root: str,
    base_offers: DataFrame,
    cvs: DataFrame | None = None,
) -> None:
    """Land the full dashboard for every candidate against the
    bootstrap offers corpus at ``epoch=-1`` — the serving store's
    starting state before :func:`stream_offer_arrivals` epochs (which
    begin at 0) refresh slices of it latest-wins."""
    from ..plans.domain_queries import _tiered_cvs, candidate_recs_for

    if cvs is None:
        cvs = _tiered_cvs(spark, sf)
    track: list[DataFrame] = []
    base = base_offers.localCheckpoint(eager=True)
    track.append(base)
    try:
        # materialize the offers side once — the pipeline consumes it
        # three ways, and the bootstrap serves the FULL population
        recs = candidate_recs_for(spark, sf, cvs, base, track=track)
        recs.write.mode("overwrite").parquet(f"{out_root}/epoch=-1")
    finally:
        _free_checkpoints(track)


def stream_offer_arrivals(
    spark: SparkSession,
    sf: str,
    offers_stream: DataFrame,
    out_root: str,
    checkpoint_path: str,
    offers_store: str,
    base_offers: DataFrame | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Delta-driven re-serve when OFFERS arrive (r12 verdict task #4:
    the CV-arrival stream froze the offers corpus at start; this is
    the other half of the product surface). Each micro-batch of
    arriving offers:

    1. reconstructs the current corpus (bootstrap offers + every
       arrival epoch landed in ``offers_store``, excluding a crash
       replay of this epoch),
    2. computes the AFFECTED candidate set through the posting lists
       (plans/domain_queries.offer_arrival_affected_cvs — rare-status
       flips plus arriving rare skills; every other candidate's
       pool/MMR trajectory is provably bit-identical),
    3. lands the (deduplicated) batch to ``offers_store`` at
       ``epoch=N`` FIRST, so base ∪ store is the updated corpus in
       durable form and the serve reads it from disk instead of
       re-checkpointing the whole corpus per epoch,
    4. re-runs the exact serving pipeline for the affected slice
       against that corpus and lands it at ``epoch=N`` (latest-wins
       via :func:`read_current_recs`).

    Exactly-once: both writes are per-epoch overwrites of
    deterministic content; the OLD-corpus read excludes the current
    epoch while the NEW one includes the just-landed batch, so a
    crash between the two writes replays to identical frames and
    identical rows. Equivalence to the full recompute over the final
    corpus is pinned by the stream displacement test and by the
    ``candidate_recs_offer_arrivals`` gate oracle."""
    from ..plans.domain_queries import (
        _tiered_cvs,
        _tiered_offers,
        delta_serve_slice,
        offer_skill_freq,
        rare_skills_from_freq,
    )

    base = (base_offers if base_offers is not None
            else _tiered_offers(spark, sf)).localCheckpoint(eager=True)

    # Maintained ACROSS epochs: the offer-side skill document
    # frequencies and corpus size. Both rare sets an epoch needs
    # (affected-set math + the matcher's prefilter) derive from these
    # tiny frames, so the per-epoch cost of the frequency side is
    # |batch| + |distinct skills| instead of a corpus scan — document
    # frequencies are purely additive over the (duplicate-guarded,
    # disjoint) arrival batches, so the maintained frame is EXACTLY
    # the recomputed one. Reset on restart: the first epoch after a
    # (re)start derives state from the landed corpus once. The two
    # ints are driver-side metadata-scale scalars (corpus row counts),
    # deterministic.
    state: dict[str, object] = {"freq": None, "n": None}

    def _total(n: int) -> DataFrame:
        return spark.range(1).select(
            F.lit(n).cast("long").alias("__n_offers"))

    def apply_batch(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        track: list[DataFrame] = []
        try:
            try:
                landed = (
                    spark.read.option("basePath", offers_store)
                    .parquet(offers_store)
                    .filter(F.col("epoch") != epoch_id)
                    .drop("epoch")
                )
                old = base.unionByName(landed)
            except AnalysisException as exc:
                # first epoch: nothing landed yet (same benign-class
                # probe as the corpus stream — getCondition first,
                # legacy getErrorClass, then substring fallback)
                if not benign_analysis_error(
                    exc, ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")
                ):
                    raise
                old = base
            # DUPLICATE-DELIVERY GUARD: offers are immutable postings,
            # so an at-least-once upstream re-delivering a job_id must
            # not land it twice — a duplicate would double the skill's
            # document frequency (can flip rare status corpus-wide)
            # and put the offer twice in affected pools. Drop in-batch
            # twins, then anti-join the already-landed corpus (the
            # corpus_stream seen-keys contract at offer grain).
            batch = (
                batch.dropDuplicates(["job_id"])
                .join(old.select("job_id"), "job_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            track.append(batch)
            if batch.isEmpty():
                return
            # Land the batch BEFORE serving: base ∪ store is then the
            # updated corpus in DURABLE form, so the serve reads it
            # from disk instead of re-checkpointing the whole corpus
            # every epoch (the fixed O(|corpus|) per-epoch term the
            # sf1 measurement flagged). Crash between this write and
            # the recs write replays identically: the OLD corpus read
            # excludes the current epoch, the NEW one includes the
            # landed batch — same frames, same outputs, overwritten.
            batch.write.mode("overwrite").parquet(
                f"{offers_store}/epoch={epoch_id}")
            corpus_new = base.unionByName(
                spark.read.option("basePath", offers_store)
                .parquet(offers_store).drop("epoch"))

            # frequency state: derive once after a (re)start, then
            # roll additively; freq_new outlives the epoch, so it is
            # NOT in track — it is freed when the NEXT roll replaces
            # it (or on an error below)
            if state["freq"] is None:
                state["freq"] = offer_skill_freq(old).localCheckpoint(
                    eager=True)
                state["n"] = old.count()
            freq_old, n_old = state["freq"], state["n"]
            freq_new = (
                freq_old.unionByName(offer_skill_freq(batch))
                .groupBy("skill").agg(F.sum("count").alias("count"))
                .localCheckpoint(eager=True)
            )
            n_new = n_old + batch.count()
            rare_old = rare_skills_from_freq(freq_old, _total(n_old))
            rare_new = rare_skills_from_freq(
                freq_new, _total(n_new)).localCheckpoint(eager=True)
            track.append(rare_new)

            cvs = _tiered_cvs(spark, sf)
            try:
                affected, fresh, _newc = delta_serve_slice(
                    spark, sf, old, batch, cvs, track=track,
                    corpus_new=corpus_new,
                    rare_old=rare_old, rare_new=rare_new)
                fresh = fresh.localCheckpoint(eager=True)
                track.append(fresh)
                # TOMBSTONES: an affected candidate whose pool became
                # EMPTY under the new corpus (a rare-status flip
                # removed their only pairs) produces no fresh rows —
                # without an explicit marker their STALE bootstrap
                # rows would win the latest-epoch read (the batch
                # API's anti-join merge drops them for free; a
                # latest-wins store needs the marker). Land a
                # null-rnk row per such candidate; read_current_recs
                # filters them out after resolving the newest epoch.
                tomb_src = (
                    affected.withColumnRenamed("cv_id", "candidate_id")
                    .join(fresh.select("candidate_id"), "candidate_id",
                          "left_anti")
                )
                tomb = tomb_src.select(
                    "candidate_id",
                    *[F.lit(None).cast(f.dataType).alias(f.name)
                      for f in fresh.schema.fields
                      if f.name != "candidate_id"],
                )
                fresh.unionByName(tomb).write.mode("overwrite").parquet(
                    f"{out_root}/epoch={epoch_id}")
            except BaseException:
                # the epoch failed: the rolled frequency frame must
                # not leak (it was kept out of track to outlive a
                # SUCCESSFUL epoch)
                _free_checkpoints([freq_new])
                raise
            # epoch committed: roll the maintained state and free the
            # superseded frequency frame
            state["freq"], state["n"] = freq_new, n_new
            _free_checkpoints([freq_old])
        except BaseException:
            # a foreachBatch exception fails the QUERY terminally —
            # nothing outlives it, so free the stream-lifetime frames
            # deterministically too (r13 advice: the maintained
            # frequency frame and the base-corpus checkpoint otherwise
            # stay persisted until session end; a restart re-derives
            # state from the landed corpus). unpersist is idempotent,
            # so overlap with the inner freq_new handler is harmless.
            frames = [base]
            if state["freq"] is not None:
                frames.append(state["freq"])
            state["freq"], state["n"] = None, None
            _free_checkpoints(frames)
            raise
        finally:
            # free this epoch's checkpoints deterministically, scoped
            # to exactly what this epoch created
            _free_checkpoints(track)

    writer = (
        offers_stream.writeStream.foreachBatch(apply_batch)
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
    (candidate, epoch) store; returns the batch-query columns.
    Null-rnk rows are TOMBSTONES (a candidate re-served into an empty
    rec set, stream_offer_arrivals): they win the epoch race like any
    other row and are then dropped, so the candidate disappears from
    the current view instead of resurrecting stale recs."""
    hist = spark.read.parquet(out_root)
    latest = hist.groupBy("candidate_id").agg(
        F.max("epoch").alias("epoch"))
    return (
        hist.join(latest, ["candidate_id", "epoch"]).drop("epoch")
        .filter(F.col("rnk").isNotNull())
    )
