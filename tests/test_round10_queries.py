"""Round-10 unit tests: SemDeDup keep-farthest representative rule,
input-derived seeds (round-9 advice #2), and the de-vacuated
events_sequence_match / customers_without_orders queries (round-9
verdict wrong #2 — their gate greens had only ever matched 0 rows,
which proves nothing about the join logic; these fixtures make the
semantics fail loudly if either query regresses)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T


def _vecs(spark, rows):
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    return spark.createDataFrame(rows, schema)


def test_semantic_dedup_keep_farthest_rule(spark):
    """The paper's representative rule, deterministic: in each
    tau-close pair the member NEARER its assigned seed drops; ties
    drop the larger id. Crafted 2-seed corpus where the expected
    drop set is computable by hand."""
    from bigdata_jobmatching_spark.operators import dedup as D

    # seeds (2 smallest ids): 100 -> cid 0, 101 -> cid 1
    # cluster 0 = {100, 102, 103, 104}; quantized seed dists:
    #   100: 0, 102: 1.25e10, 103: 5e10, 104: 1.25e10 (== 102)
    vecs = _vecs(spark, [
        (100, [1.0, 0.0]),
        (101, [0.0, 1.0]),
        (102, [0.9, 0.05]),
        (103, [0.8, 0.1]),
        (104, [0.9, 0.05]),
    ])
    pairs = D.semantic_dedup_pairs(
        vecs, "vec_id", "embedding", n_seeds=2, details=True,
    ).collect()
    drop_by_pair = {(r.id_a, r.id_b): r.drop_id for r in pairs}
    # seed 100 is NEAREST its own centroid -> drops in every pair
    assert drop_by_pair[(100, 102)] == 100
    assert drop_by_pair[(100, 103)] == 100
    assert drop_by_pair[(100, 104)] == 100
    # 102 nearer seed than 103 -> 102 drops
    assert drop_by_pair[(102, 103)] == 102
    # exact tie (102 == 104 coords) -> larger id drops
    assert drop_by_pair[(102, 104)] == 104
    assert drop_by_pair[(103, 104)] == 104
    # kept representative of cluster 0 is the farthest-from-seed: 103
    dropped = {r.drop_id for r in pairs}
    assert dropped == {100, 102, 104}


def test_semantic_dedup_seeds_from_input(spark):
    """Round-9 advice #2: seeds derive from the ids ACTUALLY PRESENT.
    A corpus whose ids all exceed the old hard-coded `id < n_seeds`
    window (e.g. ids 0..7 were deduped upstream) must still find
    pairs instead of silently deduping nothing."""
    from bigdata_jobmatching_spark.operators import dedup as D

    # seeds = 2 smallest PRESENT ids: 500 and 501 (orthogonal);
    # 503 is a near-dup of seed 500 and lands in its cluster
    vecs = _vecs(spark, [
        (500, [1.0, 0.0, 0.0]),
        (501, [0.0, 1.0, 0.0]),
        (503, [0.99, 0.01, 0.0]),   # near-dup of 500
    ])
    pairs = D.semantic_dedup_pairs(
        vecs, "vec_id", "embedding", n_seeds=2).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(500, 503)}
    # 500 is seed (dist 0) -> nearer -> drops; 503 kept
    assert pairs[0].drop_id == 500

    # empty input => empty output, honest, no crash
    empty = _vecs(spark, [])
    assert D.semantic_dedup_pairs(empty, "vec_id", "embedding").count() == 0


def test_semantic_dedup_docs_drops_by_rule(spark):
    """Corpus stage follows the operator's drop decision: exactly the
    drop_ids leave, docs without embeddings pass through."""
    from bigdata_jobmatching_spark.orchestrate_corpus import (
        semantic_dedup_docs,
    )

    # default n_seeds=8: ids 500..507 are the seeds (orthogonal unit
    # vectors, dim 8); 510 is a near-dup of seed 500
    ids = list(range(500, 508))
    docs = spark.createDataFrame(
        [(i, f"doc{i}") for i in ids] + [(510, "twin"), (900, "no-vec")],
        ["doc_id", "text"],
    )
    unit = [[1.0 if j == k else 0.0 for j in range(8)] for k in range(8)]
    twin = [0.99, 0.01] + [0.0] * 6
    emb = _vecs(spark, list(zip(ids, unit)) + [(510, twin)])
    kept = {r.doc_id for r in semantic_dedup_docs(docs, emb).collect()}
    # 500 drops (seed itself: nearest its own centroid, the paper's
    # keep-farthest rule keeps the twin); 900 has no embedding and
    # passes through untouched
    assert kept == {501, 502, 503, 504, 505, 506, 507, 510, 900}


def _write_events(spark, path, rows):
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ])
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{path}/events.parquet")


def test_events_sequence_match_crafted_chains(spark, tmp_path):
    """Non-empty on crafted view->click->purchase chains; earliest-next
    semantics; a chain broken by the gap yields nothing."""
    from bigdata_jobmatching_spark.plans.events_queries import _seq_match

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)

    def ev(i, minutes, user, typ):
        return (i, t0 + dt.timedelta(minutes=minutes), user, typ, 1.0, "{}")

    rows = [
        # user 1: complete chain inside 6h gaps -> 1 sequence
        ev(1, 0, 1, "view"),
        ev(2, 30, 1, "click"),
        ev(3, 90, 1, "purchase"),
        # user 2: click lands 7h after the view -> no match
        ev(4, 0, 2, "view"),
        ev(5, 420, 2, "click"),
        ev(6, 430, 2, "purchase"),
        # user 3: purchase 7h after the click -> no match
        ev(7, 0, 3, "view"),
        ev(8, 10, 3, "click"),
        ev(9, 10 + 420, 3, "purchase"),
        # user 4: two views complete off the SAME click/purchase
        ev(10, 0, 4, "view"),
        ev(11, 5, 4, "view"),
        ev(12, 60, 4, "click"),
        ev(13, 120, 4, "purchase"),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = _seq_match(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].n_sequences == 3  # user 1 once + user 4 twice
    assert out[0].n_users == 2


def test_events_sequence_match_earliest_next(spark, tmp_path):
    """EARLIEST-next click is the anchor: if the first click's window
    holds no purchase, a later click inside the view's gap does NOT
    rescue the view (deterministic non-combinatorial semantics)."""
    from bigdata_jobmatching_spark.plans.events_queries import _seq_match

    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        # earliest click at +10 min; its 6 h window ends at +370 min
        (2, t0 + dt.timedelta(minutes=10), 1, "click", 1.0, "{}"),
        # later click at +100 min (ignored: not the earliest)
        (3, t0 + dt.timedelta(minutes=100), 1, "click", 1.0, "{}"),
        # purchase at +400 min: outside the earliest click's window,
        # inside the later click's -> must NOT count
        (4, t0 + dt.timedelta(minutes=400), 1, "purchase", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    assert _seq_match(spark, str(tmp_path)).count() == 0


def test_customers_without_urgent_orders_crafted(spark, tmp_path):
    """Anti-join fires on the URGENT subset: a customer with only
    non-urgent orders counts; one with any urgent order doesn't."""
    from bigdata_jobmatching_spark.plans.relational import _anti

    spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20)],
        ["c_custkey", "c_nationkey"],
    ).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(100, 1, "1-URGENT"), (101, 2, "3-MEDIUM"), (102, 2, "5-LOW")],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    ).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        [(10, "FRANCE"), (20, "KENYA")],
        ["n_nationkey", "n_name"],
    ).write.mode("overwrite").parquet(f"{tmp_path}/nation.parquet")

    out = {r.n_name: r.n_customers
           for r in _anti(spark, str(tmp_path)).collect()}
    # cust 1 has an urgent order -> excluded; cust 2 (non-urgent only)
    # and cust 3 (no orders at all) both count
    assert out == {"FRANCE": 1, "KENYA": 1}


def test_image_phash_near_dups_invariants(spark):
    """Perceptual image dedup: planted variant pairs stay in their
    div-8 group, exact twins hash identically, threshold holds."""
    from bigdata_jobmatching_spark.plans.multimodal_queries import (
        _image_phash_pairs, _PH_MAXDIST,
    )

    rows = _image_phash_pairs(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    for r in rows:
        assert r.hamming <= _PH_MAXDIST
        # cross-group content is mixed noise: every surviving pair
        # must come from one planted div-8 near-dup clique
        assert r.id_a // 8 == r.id_b // 8
    # exact twins (same img, same variant -> identical PNG) at dist 0
    exact = [r for r in rows
             if (r.id_a % 8) // 2 == (r.id_b % 8) // 2]
    assert exact and all(r.hamming == 0 for r in exact)


def test_image_dhash_invariants(spark):
    """dHash twin of the pHash invariants: real resample path, div-8
    cliques, exact twins at distance 0."""
    from bigdata_jobmatching_spark.plans.multimodal_queries import (
        _DH_MAXDIST, _image_dhash_pairs,
    )

    rows = _image_dhash_pairs(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r.hamming <= _DH_MAXDIST and r.id_a // 8 == r.id_b // 8
               for r in rows)
    exact = [r for r in rows if (r.id_a % 8) // 2 == (r.id_b % 8) // 2]
    assert exact and all(r.hamming == 0 for r in exact)


def test_semantic_match_against_self_is_total(spark):
    """Sanity law: matching a corpus against ITSELF flags every
    vector (each lands in its own block and has cos=1 with itself,
    which passes any tau < 1) — and the result is a subset of the
    probe ids."""
    from bigdata_jobmatching_spark.operators import dedup as D
    from bigdata_jobmatching_spark.sources.io import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(50)
    parts = D.semantic_blocks(e, "vec_id", "embedding")
    got = {r.match_id for r in
           D.semantic_match_against(e, parts, "vec_id", "embedding")
           .collect()}
    want = {r.vec_id for r in e.select("vec_id").collect()}
    assert got == want


def test_audio_fp_near_dups_invariants(spark):
    """Audio perceptual dedup: planted variant pairs stay in their
    div-8 clique, exact twins (same clip+variant -> identical FLAC)
    at distance 0, threshold holds."""
    from bigdata_jobmatching_spark.plans.multimodal_queries import (
        _AF_MAXDIST, _audio_fp_pairs,
    )

    rows = _audio_fp_pairs(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r.hamming <= _AF_MAXDIST and r.id_a // 8 == r.id_b // 8
               for r in rows)
    exact = [r for r in rows if (r.id_a % 8) // 2 == (r.id_b % 8) // 2]
    assert exact and all(r.hamming == 0 for r in exact)


def test_audio_fp_flac_roundtrip_feeds_hash(spark):
    """The fingerprint hashes the DECODED stream: corrupting one
    sample before encode flips the fingerprint (the codec is in the
    loop, not bypassed), and the planted generator round-trips."""
    import numpy as np

    from bigdata_jobmatching_spark.operators.flac_codec import (
        decode_flac, encode_flac,
    )
    from bigdata_jobmatching_spark.plans.multimodal_queries import (
        _AF_N, _audio_fp_of, _audio_samples,
    )

    x = [int(v) for v in _audio_samples(7, 2)]
    blob = encode_flac(16000, [x], blocksize=32, fixed_order=2,
                       partition_order=1)
    _, nch, chans = decode_flac(blob)
    assert nch == 1 and list(chans[0]) == x and len(x) == _AF_N

    # same (clip, vr) twice -> identical fingerprint (deterministic)
    assert _audio_fp_of(7, 2) == _audio_fp_of(7, 2)
    # different clips -> far fingerprints (measured cross min 12)
    d = bin(_audio_fp_of(7, 2) ^ _audio_fp_of(8, 2)).count("1")
    assert d > 10


def test_mmr_rerank_diversifies(spark):
    """MMR demotes a redundant high-relevance candidate: with probe
    [1,0], A=[1,1] wins round 1 on pure relevance; B=[0.95,1.2] is
    nearly parallel to A (sim 2.15 vs rel 0.95 -> score 0.2) while
    C=[0.7,-0.5] is anti-correlated with A (sim 0.2 -> score 4.3), so
    the greedy order is A, C, B even though relevance says A, B, C."""
    from bigdata_jobmatching_spark.operators.similarity_search import (
        mmr_rerank_topk,
    )

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    corpus = spark.createDataFrame([
        (1, [1.0, 1.0]),     # A
        (2, [0.95, 1.2]),    # B: near-dup direction of A
        (3, [0.7, -0.5]),    # C: diverse
    ], schema)
    probes = spark.createDataFrame([(0, [1.0, 0.0])], schema)
    out = mmr_rerank_topk(corpus, probes, "vec_id", "embedding",
                          pool=20, k=3).collect()
    order = [r.neighbor_id for r in sorted(out, key=lambda r: r.rnk)]
    assert order == [1, 3, 2]
    # round-1 score is pure scaled relevance; later rounds subtract
    by_rank = {r.rnk: r for r in out}
    assert by_rank[1].score == by_rank[1].rel * 7
    assert by_rank[2].score < by_rank[2].rel * 7


def test_mmr_rerank_ties_and_small_pool(spark):
    """Exact-duplicate candidates tie on every score -> smaller id
    first; a pool smaller than k just stops early (no padding)."""
    from bigdata_jobmatching_spark.operators.similarity_search import (
        mmr_rerank_topk,
    )

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    corpus = spark.createDataFrame(
        [(5, [1.0, 0.0]), (6, [1.0, 0.0])], schema)
    probes = spark.createDataFrame([(0, [1.0, 0.0])], schema)
    out = sorted(mmr_rerank_topk(corpus, probes, "vec_id", "embedding",
                                 pool=20, k=5).collect(),
                 key=lambda r: r.rnk)
    assert [(r.rnk, r.neighbor_id) for r in out] == [(1, 5), (2, 6)]


def test_mv_navigator_serves_and_falls_back(spark):
    """The aggregate navigator: a servable request re-aggregates the
    FIRST servable registered view (coarsest-first contract); an
    unservable one falls back to base; roll_to raises on misuse."""
    import pytest as _pytest

    from bigdata_jobmatching_spark.mv import MatView, serve

    base_df = spark.createDataFrame(
        [("2024-01-01", "a", 1, 10), ("2024-01-01", "a", 1, 20),
         ("2024-01-02", "b", 1, 30), ("2024-02-01", "a", 1, 40)],
        ["day", "typ", "n", "cents"],
    ).withColumn("day", F.to_date("day"))
    daily = base_df.groupBy("day", "typ").agg(
        F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    monthly = daily.withColumn("month", F.trunc("day", "month")) \
        .groupBy("month", "typ").agg(
            F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    mv_m = MatView("monthly", ("month", "typ"), ("n", "cents"), monthly)
    mv_d = MatView("daily", ("day", "typ"), ("n", "cents"), daily,
                   {"month": "trunc(day, 'month')"})

    # coarsest-first: month x typ answered by the monthly MV
    out, src = serve(("month", "typ"), [mv_m, mv_d], lambda: base_df)
    assert src == "monthly"
    got = {(str(r.month), r.typ): (r.n, r.cents) for r in out.collect()}
    assert got == {("2024-01-01", "a"): (2, 30),
                   ("2024-01-01", "b"): (1, 30),
                   ("2024-02-01", "a"): (1, 40)}

    # monthly can't serve a day grain; daily can (identity dims)
    out, src = serve(("day", "typ"), [mv_m, mv_d], lambda: base_df)
    assert src == "daily"

    # nothing serves a dim no MV carries -> base
    out, src = serve(("day", "cents"), [mv_m, mv_d], lambda: base_df)
    assert src == "base" and out is base_df

    with _pytest.raises(ValueError):
        mv_m.roll_to(("day", "typ"))


def test_mv_serving_equals_base(spark):
    """The SUM-reaggregation algebra the serving layer rests on:
    month x typ from the daily MV == month x typ from base rows."""
    from bigdata_jobmatching_spark.mv import MatView, serve

    rows = [(f"2024-{m:02d}-{d:02d}", t, v)
            for m in (1, 2) for d in (1, 5, 28)
            for t, v in (("x", 3), ("y", 7))]
    base_df = spark.createDataFrame(rows, ["day", "typ", "v"]) \
        .withColumn("day", F.to_date("day"))
    daily = base_df.groupBy("day", "typ").agg(F.sum("v").alias("v"))
    mv = MatView("daily", ("day", "typ"), ("v",), daily,
                 {"month": "trunc(day, 'month')"})
    served, src = serve(("month", "typ"), [mv],
                        lambda: (_ for _ in ()).throw(AssertionError))
    assert src == "daily"
    direct = base_df.withColumn("month", F.trunc("day", "month")) \
        .groupBy("month", "typ").agg(F.sum("v").alias("v"))
    assert sorted(map(tuple, served.collect())) == \
        sorted(map(tuple, direct.collect()))


def test_leakfree_split_semantics(spark, tmp_path):
    """Cluster-grain carve on a crafted corpus: near-dup twins always
    land on one side, and the naive doc-grain carve demonstrably
    splits at least one planted pair on this fixture."""
    from bigdata_jobmatching_spark.plans.dedup_queries import (
        _leakfree_split,
    )

    # 30 planted twin pairs: doc 2k and 2k+1 share identical text ->
    # jaccard 1.0 -> one cluster; distinct filler words elsewhere
    rows = []
    for k in range(30):
        txt = f"alpha{k} beta{k} gamma{k} delta{k} epsilon{k}"
        rows.append((2 * k, txt, "en", "src"))
        rows.append((2 * k + 1, txt, "en", "src"))
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source"],
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")

    out = {r.side: r for r in _leakfree_split(spark, str(tmp_path)).collect()}
    a = next(iter(out.values()))
    assert a.n_dup_pairs == 30
    assert a.cross_pairs_cluster_split == 0
    # the naive doc-id carve splits SOME twin pair here (doc ids 2k
    # and 2k+1 hash independently; with 30 pairs at 10% val the
    # chance all stay together is (0.82)^30-ish — this fixture was
    # checked to leak)
    assert a.cross_pairs_doc_split > 0
    assert sum(r.n_docs for r in out.values()) == 60


def test_split_and_pack_fenced_carve(spark):
    """split_and_pack(fence_pairs=...) puts near-dup twins on ONE
    side; without pairs the historical doc-grain carve is unchanged
    (same split labels for the same doc_ids)."""
    from bigdata_jobmatching_spark.orchestrate_corpus import split_and_pack

    rows = [(i, f"w{i} x{i} y{i}", "src") for i in range(120)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # fence every (2k, 2k+1) pair
    pairs = spark.createDataFrame(
        [(2 * k, 2 * k + 1) for k in range(60)],
        ["doc_id_a", "doc_id_b"],
    )
    fenced = {r.doc_id: r.split
              for r in split_and_pack(docs, fence_pairs=pairs).collect()}
    for k in range(60):
        assert fenced[2 * k] == fenced[2 * k + 1]
    # default path unchanged vs the registered doc-grain split query
    plain = {r.doc_id: r.split for r in split_and_pack(docs).collect()}
    from bigdata_jobmatching_spark.plans.mixing_queries import (
        _LCG_A, _LCG_C, _LCG_M, _VAL_PCT,
    )
    for i in range(120):
        want = ("val" if (i * _LCG_A + _LCG_C) % _LCG_M
                < _LCG_M * _VAL_PCT // 100 else "train")
        assert plain[i] == want
    # the fenced carve differs from doc-grain somewhere on this
    # fixture (otherwise the test proves nothing)
    assert any(fenced[i] != plain[i] for i in range(120))


def test_gapfill_lerp_interior_and_edges(spark, tmp_path):
    """Crafted series pins the lerp semantics: interior gaps take the
    exact integer line between brackets, leading/trailing gaps carry
    the nearest observation, observed slots keep their own value."""
    import datetime as dt

    from bigdata_jobmatching_spark.plans.temporal_queries import (
        _GF_MOD, _gapfill_lerp,
    )

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        # observations at hours 2, 5 (values 1.00 and 7.00) and 6
        (_GF_MOD * 1, t0 + dt.timedelta(hours=2), 1, "a", 1.0, "{}"),
        (_GF_MOD * 2, t0 + dt.timedelta(hours=5), 1, "a", 7.0, "{}"),
        (_GF_MOD * 3, t0 + dt.timedelta(hours=6), 1, "a", 2.0, "{}"),
        # a non-multiple event id is filtered out of the series
        (1, t0 + dt.timedelta(hours=4), 1, "a", 999.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    out = {r.hour: r for r in _gapfill_lerp(spark, str(tmp_path)).collect()}
    assert sorted(out) == [2, 3, 4, 5, 6]
    # observed values in cents
    assert (out[2].cents_lerp, out[5].cents_lerp, out[6].cents_lerp) == \
        (100, 700, 200)
    # interior lerp between (h=2, 100) and (h=5, 700): slope 200/h
    assert out[3].cents_lerp == 300 and out[4].cents_lerp == 500
    assert out[3].is_observed == 0 and out[2].is_observed == 1


def test_corpus_pipeline_fence_configuration(spark, tmp_path):
    """Fence-instead-of-drop: the chain keeps near-duplicates (no
    near_deduped stage) and the packed carve puts every >=0.6-Jaccard
    pair on one side of the train/val fence."""
    from bigdata_jobmatching_spark.operators import dedup as D
    from bigdata_jobmatching_spark.orchestrate_corpus import (
        run_corpus_pipeline,
    )

    rows = []
    for k in range(40):
        words = [f"w{k}x{i}" for i in range(44)]
        base = " ".join(words)
        rows.append((2 * k, base, "en", "src", len(base)))
        # near-dup twin: three spaced swaps -> 3-gram shingle Jaccard
        # ~0.65 (>= 0.6, a fence pair) while ~2/3 of the 8-token
        # windows contain a change, so the substring-dedup stage
        # (window grain, >50% duplicated drops) keeps both
        tw = list(words)
        for i in (10, 22, 34):
            tw[i] = f"alt{k}x{i}"
        twin = " ".join(tw)
        rows.append((2 * k + 1, twin, "en", "src", len(twin)))
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"])

    out = str(tmp_path / "corpus")
    stats = run_corpus_pipeline(
        spark, docs, out, strict=True, min_quality=0.0,
        fence_near_dups=True)
    assert "near_deduped" not in stats
    # r10 verdict task #4: the substring stage now RUNS in the fenced
    # configuration (family grain) instead of being skipped; these
    # twins are below the heavy threshold so it passes them through
    assert stats["substring_deduped"]["rows"] == 80
    # near-dups were KEPT: packed row count equals the input
    assert stats["packed"]["rows"] == 80
    packed = spark.read.parquet(f"{out}/packed")
    side = {r.doc_id: r.split for r in packed.collect()}
    pairs = D.minhash_lsh_pairs(
        spark.read.parquet(f"{out}/scrubbed"), "doc_id", "text",
        jaccard_threshold=0.6).collect()
    assert pairs  # the twins really are near-dup pairs
    for p in pairs:
        assert side[p.id_a] == side[p.id_b]


def test_mmr_greedy_packed_edges(spark):
    """The round-11 one-Arrow-pass mmr_greedy: a size-1 pool arrives
    with a NULL packed sims cell (left join) and must still emit its
    rnk-1 row; a size-2 pool replays the exact integer trajectory
    (round 2 score = rel*7 - sim*3); k beyond the pool stops early."""
    from bigdata_jobmatching_spark.operators import (
        similarity_search as ANN,
    )

    pool = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 50), (2, 21, 40)],
        "query_id long, vec_id_ long, rel long")
    sims = spark.createDataFrame(
        [(2, 20, 21, 5), (2, 21, 20, 5)],
        "query_id long, a long, b long, sim long")
    out = sorted(tuple(r) for r in
                 ANN.mmr_greedy(pool, sims, k=3, lam=(7, 3)).collect())
    assert out == [
        (1, 10, 100, 700, 1),
        (2, 20, 50, 350, 1),
        (2, 21, 40, 40 * 7 - 5 * 3, 2),
    ]
