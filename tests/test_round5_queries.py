"""Round-5 additions: versioned-stage hardening (ADVICE r4), plus new
query/operator coverage added this round."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_jobmatching_spark.sources.io import load_table


def test_versioned_merge_into_never_published_root(spark, tmp_path):
    """First micro-batch against a dimension that was never seeded:
    merge_version must land the non-tombstone update rows as v1
    instead of raising FileNotFoundError (ADVICE r4: versioned.py:152)."""
    from bigdata_jobmatching_spark.sources import versioned as V

    root = str(tmp_path / "fresh_dim")
    updates = spark.createDataFrame(
        [(1, "a", False), (2, "b", False), (3, "tomb", True)],
        "id long, val string, deleted boolean",
    )
    v1 = V.merge_version(spark, root, updates, ("id",), delete_col="deleted")
    assert v1 == 1 and V.current_version(root) == 1
    got = {r["id"]: r["val"] for r in V.read_version(spark, root).collect()}
    assert got == {1: "a", 2: "b"}  # tombstone for an absent key is a no-op

    # and the NEXT merge behaves as a normal SCD1 upsert
    upd2 = spark.createDataFrame(
        [(2, "B", False), (4, "d", False)], "id long, val string, deleted boolean"
    )
    V.merge_version(spark, root, upd2, ("id",), delete_col="deleted")
    got2 = {r["id"]: r["val"] for r in V.read_version(spark, root).collect()}
    assert got2 == {1: "a", 2: "B", 4: "d"}


def test_vacuum_incomplete_versions_do_not_occupy_keep_slots(spark, tmp_path):
    """ADVICE r4 (versioned.py:122): junk directories from crashed
    writes sorted as 'newest' and displaced real versions from the
    keep window while themselves surviving. Now only _SUCCESS-complete
    versions count toward keep-N; incomplete dirs past the grace
    window are deleted."""
    from bigdata_jobmatching_spark.sources import versioned as V

    root = str(tmp_path / "stage")
    df = spark.range(3).select(F.col("id"))
    V.write_version(df, root)  # v1 (complete)
    V.write_version(df, root)  # v2 (complete, published)

    # two crashed writes land bare dirs with higher numbers; grace=0
    # marks them as aged past any in-flight window
    os.makedirs(os.path.join(root, "v00007"))
    os.makedirs(os.path.join(root, "v00008"))

    deleted = V.vacuum(root, keep=2, grace_seconds=0.0)
    # the junk is gone, BOTH real versions survive the keep-2 window
    assert set(deleted) == {7, 8}
    assert V.list_versions(root) == [1, 2]
    assert V.current_version(root) == 2


def test_vacuum_grace_period_protects_in_flight_writes(spark, tmp_path):
    """ADVICE r5 (versioned.py:122): an incomplete directory may be a
    CONCURRENT write_version that has not committed its _SUCCESS yet —
    vacuum must not race it. A fresh markerless dir survives the
    default grace window; the same dir with mtime aged past the grace
    is collected."""
    from bigdata_jobmatching_spark.sources import versioned as V

    root = str(tmp_path / "stage")
    df = spark.range(3).select(F.col("id"))
    V.write_version(df, root)  # v1 (complete, published)

    inflight = os.path.join(root, "v00005")
    os.makedirs(inflight)  # mtime = now: looks in-flight

    assert V.vacuum(root, keep=1) == []  # survives default grace
    assert os.path.isdir(inflight)

    # age it past the grace window -> it's crash junk, collect it
    old = 1_000_000_000.0
    os.utime(inflight, (old, old))
    assert V.vacuum(root, keep=1) == [5]
    assert not os.path.isdir(inflight)


# --- real PNG codec (round-5 de-stub) ------------------------------------

def test_png_codec_round_trip_all_filters_and_color_types():
    """encode -> decode must be identity for every scanline filter
    (None/Sub/Up/Average/Paeth) and every 8-bit color type the codec
    claims (gray, gray+alpha, RGB, RGBA)."""
    from bigdata_jobmatching_spark.operators.multimodal import decode_png, encode_png

    for ch in (1, 2, 3, 4):
        for ft in (0, 1, 2, 3, 4, None):
            w, h = 7, 6
            px = bytes((31 * i + 5 * ch + 17) % 256 for i in range(w * h * ch))
            assert decode_png(encode_png(w, h, px, channels=ch, filter_type=ft)) \
                == (w, h, ch, px), (ch, ft)


def test_png_codec_rejects_garbage_and_unsupported_loudly():
    from bigdata_jobmatching_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk, decode_png,
    )
    import pytest as _pytest

    assert decode_png(b"not a png") is None
    # 16-bit depth must raise (loud), not silently mis-decode
    ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([16, 2, 0, 0, 0])
    with _pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(_PNG_SIG + _png_chunk(b"IHDR", ihdr))


def test_resample_nearest_known_grid():
    """4x4 single-channel gradient -> 2x2 picks the top-left of each
    2x2 block (floor source-coordinate convention)."""
    from bigdata_jobmatching_spark.operators.multimodal import resample_nearest

    px = bytes(range(16))
    assert resample_nearest(px, 4, 4, 1, 2, 2) == bytes([0, 2, 8, 10])
    # identity when target == source
    assert resample_nearest(px, 4, 4, 1, 4, 4) == px


def test_resize_images_real_path_pixels(spark):
    """fake=False end-to-end: decode real pixels, nearest-resample,
    re-encode — the output PNG decodes to exactly the expected bytes;
    JPEG payloads keep their row with NULLs."""
    from bigdata_jobmatching_spark.operators import multimodal as MM
    import numpy as np

    w, h = 8, 4
    a = np.arange(w * h * 3, dtype=np.uint8).reshape(h, w, 3)
    png = MM.encode_png(w, h, a.tobytes(), channels=3, filter_type=None)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(MM.make_jpeg(100, 50)))],
        "p_partkey long, payload binary",
    )
    out = {r["p_partkey"]: r for r in
           MM.resize_images(df, max_side=4, fake=False).collect()}
    r1 = out[1]
    assert (r1["rs_format"], r1["rs_width"], r1["rs_height"]) == ("png", 4, 2)
    got = MM.decode_png(bytes(r1["resized"]))
    expect = a[np.ix_((np.arange(2) * h) // 2, (np.arange(4) * w) // 4)]
    assert got == (4, 2, 3, expect.tobytes())
    r2 = out[2]
    assert r2["rs_format"] is None and r2["resized"] is None


def test_extract_features_real_decode(spark):
    """fake=False features come from decoded pixels: per-channel
    mean/255 then max/255, padded to 4 channel slots each."""
    from bigdata_jobmatching_spark.operators import multimodal as MM

    px = bytes([0, 100, 200, 50, 150, 250])  # 2x1 RGB
    png = MM.encode_png(2, 1, px, channels=3)
    df = spark.createDataFrame(
        [("a", "image", None, bytearray(png), None, None, None),
         ("b", "image", None, bytearray(b"junk"), None, None, None)],
        MM.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in
            MM.extract_features(df, fake=False).collect()}
    feat = rows["a"]["feature"]
    assert feat[:4] == pytest.approx([25 / 255, 125 / 255, 225 / 255, 0.0])
    assert feat[4:] == pytest.approx([50 / 255, 150 / 255, 250 / 255, 0.0])
    assert rows["b"]["feature"] is None


# --- CV-stream ingestion twin (round-5) ----------------------------------

def _make_raw_cvs(n: int) -> list[dict]:
    rows = []
    for i in range(n):
        rows.append({
            "cv_id": None if i % 5 == 0 else f"CV_{i}",
            "annees_experience": None if i % 7 == 0 else i % 15,
            "niveau_etudes": ["Bac", "  Master ", None][i % 3],
            "salaire_souhaite": 100000.0 + i * 1000,
            "teletravail_souhaite": [True, None, False][i % 3],
            "competences": [" Python ", "SQL", f"s{i % 4}", "python"],
            "langues": [{"langue": "fr", "niveau": "C1"}] * (i % 3),
            "source_site": f"site_{i % 2}",
            "url_cv": f"https://s{i % 2}/cv/{i}",
            "scraped_at": f"2024-0{i % 3 + 1}-15T08:30:00",
            "statut": None if i % 4 == 0 else "candidat",
        })
    return rows


def test_cv_stream_lands_partitioned_parquet_exactly_once(spark, tmp_path):
    """The reference DECLARED a CV consumer but never wrote it
    (PLAN_REALISATION.md:260-271); this is its streaming twin:
    normalize_cvs applied on the stream, hive-partitioned parquet
    landing, exactly-once on checkpoint restart."""
    import json

    from bigdata_jobmatching_spark.streaming.ingest import stream_cvs_to_lake

    rows = _make_raw_cvs(30)
    (tmp_path / "in").mkdir()
    with open(tmp_path / "in" / "b1.json", "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    q = stream_cvs_to_lake(
        spark, str(tmp_path / "in"), str(tmp_path / "lake"),
        str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "lake"))
    assert out.count() == len(rows)
    parts = {p.name for p in (tmp_path / "lake").iterdir() if p.is_dir()}
    assert any(p.startswith("scraped_date=") for p in parts)

    got = {r["cv_id"]: r for r in out.collect()}
    # null cv_id got the md5 fallback (16-hex), normalization applied
    assert "CV_1" in got and got["CV_1"]["statut"] == "candidat"
    fallback = [k for k in got if not k.startswith("CV_")]
    assert fallback and all(len(k) == 16 for k in fallback)
    r1 = got["CV_1"]
    assert r1["competences"] == ["python", "sql", "s1"]  # trim+lower+distinct
    assert r1["niveau_etudes"] == "Master"
    assert r1["n_langues"] == 1
    assert got["CV_7"]["annees_experience"] == 0  # null clamped (7 % 7 == 0)

    # exactly-once: re-drain with same checkpoint adds nothing
    q2 = stream_cvs_to_lake(
        spark, str(tmp_path / "in"), str(tmp_path / "lake"), str(tmp_path / "ckpt")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "lake")).count() == len(rows)


def test_png_decode_ancillary_chunks_and_split_idat():
    """Real-world PNGs carry ancillary chunks (gAMA, tEXt, ...) before
    the image data and often split the zlib stream across multiple
    IDAT chunks; the decoder must skip the former and concatenate the
    latter per spec."""
    from bigdata_jobmatching_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk, decode_png, encode_png,
    )

    w, h, ch = 5, 4, 3
    px = bytes((7 * i + 1) % 256 for i in range(w * h * ch))
    std = encode_png(w, h, px, channels=ch, filter_type=None)
    pos, chunks = 8, []
    while pos + 8 <= len(std):
        ln = int.from_bytes(std[pos:pos + 4], "big")
        chunks.append((std[pos + 4:pos + 8], std[pos + 8:pos + 8 + ln]))
        pos += 12 + ln
    parts = dict(chunks)
    idat, third = parts[b"IDAT"], max(1, len(parts[b"IDAT"]) // 3)
    rebuilt = (
        _PNG_SIG
        + _png_chunk(b"IHDR", parts[b"IHDR"])
        + _png_chunk(b"gAMA", (45455).to_bytes(4, "big"))
        + _png_chunk(b"tEXt", b"Comment\x00hello")
        + _png_chunk(b"IDAT", idat[:third])
        + _png_chunk(b"IDAT", idat[third:2 * third])
        + _png_chunk(b"IDAT", idat[2 * third:])
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(rebuilt) == (w, h, ch, px)


def test_substring_dedup_stage_drops_boilerplate(spark):
    """The corpus pipeline's substring-dedup stage: a document that is
    mostly k-token windows shared with another document is dropped;
    documents with unique content and documents too short to carry
    any window both survive."""
    from bigdata_jobmatching_spark import orchestrate_corpus as OC

    shared = " ".join(f"w{i}" for i in range(40))
    rows = [
        (1, shared + " unique tail one", "a"),            # mostly shared -> drop
        (2, shared + " other unique ending", "a"),        # mostly shared -> drop
        (3, " ".join(f"only{i}" for i in range(40)), "a"),  # unique -> keep
        (4, "too short", "a"),                            # < k tokens -> keep
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = {r["doc_id"] for r in OC.substring_dedup_docs(docs, k=8).collect()}
    assert kept == {3, 4}
    # with a permissive threshold everything survives
    all_kept = {r["doc_id"] for r in
                OC.substring_dedup_docs(docs, k=8, max_dup_milli=1000).collect()}
    assert all_kept == {1, 2, 3, 4}


def test_substring_dedup_family_grain_keeps_one_representative(spark):
    """r10 verdict task #4: the drop-all form removes EVERY member of
    a duplicated-window family (the reference's drop-both defect
    class, deduplicate.py:287-306); family grain clusters the heavy
    docs by shared windows and keeps the best member per family
    (longest text, min id ties). Two disjoint families here — one
    chained a~b, b~c (components, not just direct pairs) — plus an
    untouched unique doc."""
    from bigdata_jobmatching_spark import orchestrate_corpus as OC

    f1 = " ".join(f"w{i}" for i in range(40))
    f2 = " ".join(f"v{i}" for i in range(40))
    mid = " ".join(f"w{i}" for i in range(20, 60))  # overlaps f1's tail
    rows = [
        (1, f1 + " tail one", "a"),
        (2, f1 + " " + " ".join(f"w{i}" for i in range(40, 60)), "a"),
        # doc 3 shares windows with doc 2's extension, not doc 1:
        # the family must still be {1, 2, 3} via the 2-hop chain
        (3, mid + " tri", "a"),
        (10, f2 + " x", "a"),
        (11, f2 + " y", "a"),
        (20, " ".join(f"solo{i}" for i in range(40)), "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # drop-all removes both families whole
    assert {r.doc_id for r in OC.substring_dedup_docs(docs, k=8).collect()} \
        == {20}
    kept = {r.doc_id for r in
            OC.substring_dedup_docs(docs, k=8, family_grain=True).collect()}
    # family {1,2,3}: doc 2 is the longest text; family {10,11}: equal
    # lengths except x/y (equal), min id 10 wins; solo survives
    assert kept == {2, 10, 20}


def test_end_to_end_offers_plus_cvs_to_matching(spark, tmp_path):
    """The reference's complete declared vision, executed end-to-end:
    offer JSON -> staged enrichment chain -> lake; CV JSON ->
    streaming normalize -> lake; both lakes -> inverted-index
    matching -> agg_matching_scores + per-candidate top-k landings.
    (The reference itself never wired the CV consumer or the matching
    job — matching_dag.py:50-57 is declared-only.)"""
    import json

    from bigdata_jobmatching_spark import orchestrate as O
    from bigdata_jobmatching_spark.schemas import JOB_RAW_SCHEMA
    from bigdata_jobmatching_spark.streaming.ingest import stream_cvs_to_lake
    from tests.fixtures import make_raw_offers

    # offer side: raw JSON through the staged chain
    offers_rows = make_raw_offers(40)
    (tmp_path / "offers_in").mkdir()
    with open(tmp_path / "offers_in" / "b.json", "w", encoding="utf-8") as f:
        for r in offers_rows:
            f.write(json.dumps(r) + "\n")
    raw = spark.read.schema(JOB_RAW_SCHEMA).json(str(tmp_path / "offers_in"))
    O.run_staged_pipeline(spark, raw, str(tmp_path / "offers_out"))

    # CV side: raw JSON through the streaming landing; competences
    # overlap the fixture offers' skill vocabulary (python/sql/excel)
    cvs = []
    for i in range(12):
        cvs.append({
            "cv_id": f"CV_{i}",
            "annees_experience": i % 10,
            "salaire_souhaite": 300000.0 + i * 25000,
            "competences": [["Python", "SQL"], ["Excel"], ["Spark", "Kafka"]][i % 3],
            "localisation_souhaitee_id": f"LOC_{i % 4}",
            "source_site": "cvtheque",
            "url_cv": f"https://cv/{i}",
            "scraped_at": "2024-03-15T09:00:00",
        })
    (tmp_path / "cvs_in").mkdir()
    with open(tmp_path / "cvs_in" / "b.json", "w", encoding="utf-8") as f:
        for r in cvs:
            f.write(json.dumps(r) + "\n")
    q = stream_cvs_to_lake(
        spark, str(tmp_path / "cvs_in"), str(tmp_path / "cv_lake"),
        str(tmp_path / "cv_ckpt"),
    )
    q.awaitTermination(120)

    # matching over the two lakes
    stats = O.match_lakes(
        spark,
        str(tmp_path / "offers_out" / "sectors_enriched"),
        str(tmp_path / "cv_lake"),
        str(tmp_path / "match_out"),
        top_k=5,
    )
    assert stats["matching_scores"] > 0
    assert 0 < stats["top_matches"] <= stats["matching_scores"]

    top = spark.read.parquet(str(tmp_path / "match_out" / "top_matches"))
    rows = top.collect()
    # scores are valid and ranks bounded
    assert all(0.0 <= r["match_score"] <= 1.0 for r in rows)
    assert all(1 <= r["rnk"] <= 5 for r in rows)
    # every candidate pair shares at least one skill by construction
    assert all(r["skill_match_pct"] > 0 for r in rows)


def test_heavy_hitters_exact_under_eviction_pressure(spark):
    """Misra-Gries candidate pruning with a summary much smaller than
    the key cardinality: thousands of distinct cold keys force
    constant evictions, yet the two hot keys (> n/denom) must survive
    phase 1 and phase 2 must report their EXACT counts."""
    from bigdata_jobmatching_spark.operators.skew import heavy_hitters_exact

    rows = [("hot_a",) for _ in range(800)] + [("hot_b",) for _ in range(300)]
    rows += [(f"cold_{i}",) for i in range(5000)]  # each appears once
    df = spark.createDataFrame(rows, "k string").repartition(8)
    out = {r["k"]: r for r in
           heavy_hitters_exact(df, "k", denom=10, summary_k=20).collect()}
    n = 800 + 300 + 5000  # threshold n/10 = 610
    assert set(out) == {"hot_a"}  # 800 > 610; hot_b 300 < 610; cold all 1
    assert out["hot_a"]["n_rows"] == 800 and out["hot_a"]["n_total"] == n


def test_heavy_hitters_merge_path_equals_plain_and_enforces_contract(spark):
    """The mergeable-summaries path (candidate broadcast bounded by
    summary_k regardless of partition count) must produce the SAME
    exact answer as the plain candidate union, and the recall
    contract summary_k + 1 >= denom is enforced loudly."""
    from bigdata_jobmatching_spark.operators.skew import heavy_hitters_exact

    rows = [("hot_a",)] * 800 + [("hot_b",)] * 300
    rows += [(f"cold_{i}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    merged = sorted(tuple(r) for r in heavy_hitters_exact(
        df, "k", denom=10, summary_k=20, merge_summaries=True).collect())
    plain = sorted(tuple(r) for r in heavy_hitters_exact(
        df, "k", denom=10, summary_k=20, merge_summaries=False).collect())
    n = 800 + 300 + 3000  # threshold n/10 = 410
    assert merged == plain == [("hot_a", 800, n)]
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters_exact(df, "k", denom=100, summary_k=50)


def test_heavy_hitters_equals_brute_force_on_random_data(spark):
    """Seeded randomized equivalence: the sketch-assisted operator
    must equal the brute-force groupBy answer on arbitrary skew
    shapes (Zipf-ish LCG draws), for several (denom, summary_k)
    settings including the minimal summary_k + 1 == denom contract."""
    from bigdata_jobmatching_spark.operators.skew import heavy_hitters_exact

    for seed, denom, k in ((1, 8, 7), (2, 5, 16), (3, 12, 40)):
        x, rows = seed, []
        for _ in range(4000):
            x = (1103515245 * x + 12345) % (1 << 31)
            # squaring a uniform draw skews mass toward low ids
            rows.append((f"k{(x % 40) * (x % 37) % 60}",))
        df = spark.createDataFrame(rows, "k string").repartition(7)
        got = sorted(tuple(r) for r in
                     heavy_hitters_exact(df, "k", denom=denom, summary_k=k).collect())
        n = len(rows)
        brute = sorted(
            (r["k"], r["cnt"], n)
            for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()
            if r["cnt"] * denom > n
        )
        assert got == brute, (seed, denom, k)
