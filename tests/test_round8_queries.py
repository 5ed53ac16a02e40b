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


# --- tRNS palette-alpha PNG (round-8) ---------------------------------------

def test_trns_png_round_trip_every_filter():
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM

    k, w, h, n_pal = 5, 9, 6, 7
    y, x = np.ogrid[0:h, 0:w]
    idx = ((k + 3 * x + 5 * y) % n_pal).astype(np.uint8)
    pal = bytes(
        (k + 11 * i + 101 * c) % 256 for i in range(n_pal) for c in range(3)
    )
    trans = bytes((k + 7 * i) % 256 for i in range(n_pal - 1))
    alpha_full = np.array(list(trans) + [255], dtype=np.uint8)
    rgb = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    expect = np.concatenate(
        [rgb[idx], alpha_full[idx][..., None]], axis=-1
    ).tobytes()
    for ft in (0, 1, 2, 3, 4, None):
        png = MM.encode_png(
            w, h, idx.tobytes(), channels=1, filter_type=ft, palette=pal,
            trans=trans,
        )
        dw, dh, ch, px = MM.decode_png(png)
        assert (dw, dh, ch) == (w, h, 4)
        assert px == expect


def test_trns_png_loud_failure_modes():
    import numpy as np
    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import multimodal as MM

    idx = np.zeros((4, 4), dtype=np.uint8)
    pal = bytes(range(9))  # 3 entries
    # tRNS without palette
    with _pytest.raises(ValueError, match="trans requires a palette"):
        MM.encode_png(4, 4, bytes(48), channels=3, trans=b"\x00")
    # tRNS longer than the palette
    with _pytest.raises(ValueError, match="bad tRNS length"):
        MM.encode_png(4, 4, idx.tobytes(), channels=1, palette=pal,
                      trans=bytes(4))
    # gray/truecolor tRNS stays out of subset: splice a tRNS chunk
    # into a grayscale PNG and the decoder must raise, not guess
    import zlib as _z

    gray = MM.encode_png(4, 4, bytes(16), channels=1, filter_type=0)
    chunk = b"tRNS" + b"\x00\x01"
    trns = (
        (2).to_bytes(4, "big") + chunk
        + _z.crc32(chunk).to_bytes(4, "big")
    )
    ihdr_end = 8 + 12 + 13  # signature + IHDR chunk
    spliced = gray[:ihdr_end] + trns + gray[ihdr_end:]
    with _pytest.raises(ValueError, match="color type 0/2"):
        MM.decode_png(spliced)


# --- HOF-CSE lint (round-8, strike-four prevention) --------------------------

def test_hof_lint_catches_the_winnowing_trap_shape():
    """The exact round-7 failure: a tokenize chain referenced inside a
    transform(sequence(...)) lambda — loop-invariant, re-evaluated per
    shingle position, O(n^2) regex work per document."""
    import sys
    from pathlib import Path

    sys.path.insert(0, "/root/repo")
    from tools.hof_lint import lint, lint_source

    bad = '''
from pyspark.sql import functions as F
from ..functions import text as X

def q(d):
    toks = X.tokens(F.col("text"))
    return d.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(9)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(X.tokens(F.col("text")), i + 1, 3))),
        ).alias("shingles")
    )
'''
    findings = lint_source(bad, Path("planted.py"))
    assert any("tokens" in f for f in findings), findings

    # per-element work consuming the lambda variable is NOT flagged
    good = '''
from pyspark.sql import functions as F

def q(d):
    return d.select(
        F.transform(F.col("toks"), lambda w: F.md5(w)).alias("hs")
    )
'''
    assert lint_source(good, Path("planted.py")) == []

    # the SQL-fragment face: expensive call after an arrow, no lambda var
    sql_bad = '''
EXPR = "transform(sequence(1, 10), i -> md5(col_name))"
'''
    assert lint_source(sql_bad, Path("planted.py"))
    sql_good = '''
EXPR = "transform(toks, w -> md5(w))"
ORACLE = "SELECT list_transform(toks, w -> length(w)), regexp_replace(text, 'x', '') FROM t WHERE 1 = (SELECT max(i -> 1) )"
'''
    assert lint_source(sql_good, Path("planted.py")) == []

    # and the live registry is clean
    assert lint() == []


# --- 1/2/4-bit packed-depth PNG (round-8) ------------------------------------

def test_lowbit_png_round_trip_every_depth_and_filter():
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM

    for d in (1, 2, 4):
        # widths chosen so rows end in partial bytes (the packing edge)
        for w, h in ((9, 6), (8, 5), (3, 7), (1, 1)):
            y, x = np.ogrid[0:h, 0:w]
            v = ((7 + x + 2 * y) % (1 << d)).astype(np.uint8)
            for ft in (0, 1, 2, 3, 4, None):
                png = MM.encode_png(
                    w, h, v.tobytes(), channels=1, filter_type=ft,
                    bit_depth=d,
                )
                dw, dh, ch, px = MM.decode_png(png)
                assert (dw, dh, ch) == (w, h, 1)
                assert px == (v * (255 // ((1 << d) - 1))).tobytes()


def test_lowbit_palette_trns_composes():
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM

    for d in (2, 4):
        n_pal = 1 << d
        w, h = 7, 5
        y, x = np.ogrid[0:h, 0:w]
        idx = ((3 + x + 2 * y) % n_pal).astype(np.uint8)
        pal = bytes(
            (11 * i + 101 * c) % 256 for i in range(n_pal) for c in range(3)
        )
        trans = bytes((5 + 7 * i) % 256 for i in range(n_pal - 1))
        png = MM.encode_png(
            w, h, idx.tobytes(), channels=1, filter_type=None, palette=pal,
            bit_depth=d, trans=trans,
        )
        dw, dh, ch, px = MM.decode_png(png)
        assert (dw, dh, ch) == (w, h, 4)
        rgb = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
        alpha = np.array(list(trans) + [255], dtype=np.uint8)
        expect = np.concatenate(
            [rgb[idx], alpha[idx][..., None]], axis=-1
        ).tobytes()
        assert px == expect


def test_lowbit_png_loud_failure_modes():
    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import multimodal as MM

    # round-9: sub-byte + Adam7 is now IN subset (per-pass repacked
    # strides) — the former loud fence must round-trip instead
    png_i = MM.encode_png(4, 4, bytes(16), channels=1, bit_depth=2,
                          interlace=True)
    assert MM.decode_png(png_i) == (4, 4, 1, bytes(16))
    with _pytest.raises(ValueError, match="does not fit depth"):
        MM.encode_png(4, 4, bytes([4]) + bytes(15), channels=1, bit_depth=2)
    with _pytest.raises(ValueError, match="1 sample per pixel"):
        MM.encode_png(2, 2, bytes(12), channels=3, bit_depth=4)
    with _pytest.raises(ValueError, match="do not fit depth"):
        MM.encode_png(2, 2, bytes(4), channels=1, bit_depth=1,
                      palette=bytes(9))


# --- progressive JPEG (round-8) ----------------------------------------------

def test_progressive_jpeg_bit_exact_vs_baseline():
    """The strongest possible round-trip: progressive and baseline
    encoders quantize identically, so decoding either stream of the
    same pixels must produce BIT-IDENTICAL output — across successive
    approximation depths, spectral band splits, and image sizes."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import jpeg_codec as J

    rng = np.random.RandomState(7)
    for h, w in [(16, 24), (8, 8)]:
        px = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        want = J.decode_jpeg(J.encode_jpeg_gray(px))
        for dc_al in (1, 2):
            for ac_al in (0, 1, 2):
                for split in (5, 1, 62):
                    got = J.decode_jpeg(J.encode_jpeg_progressive_gray(
                        px, dc_al=dc_al, ac_al=ac_al, band_split=split))
                    assert got == want, (h, w, dc_al, ac_al, split)


def test_progressive_jpeg_color_and_restarts():
    import numpy as np

    from bigdata_jobmatching_spark.operators import jpeg_codec as J

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(16, 16, 3)).astype(np.uint8)
    assert (J.decode_jpeg(J.encode_jpeg_progressive_color(rgb))
            == J.decode_jpeg(J.encode_jpeg_color(rgb)))
    # DRI persists across scans: restart markers in EVERY scan kind
    px = rng.randint(0, 256, size=(24, 24)).astype(np.uint8)
    want = J.decode_jpeg(J.encode_jpeg_gray(px))[3]
    for ri in (1, 2, 5):
        got = J.decode_jpeg(
            J.encode_jpeg_progressive_gray(px, restart_interval=ri))[3]
        assert got == want, ri


def test_progressive_jpeg_exact_flat_blocks_and_eob_runs():
    import numpy as np

    from bigdata_jobmatching_spark.operators import jpeg_codec as J

    vals = (np.arange(16, dtype=np.int64).reshape(4, 4) * 13 % 240)
    flat = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.uint8)
    out = J.decode_jpeg(
        J.encode_jpeg_progressive_gray(flat, qtable=J.QTABLE_FLAT8))[3]
    assert out == flat.tobytes()
    # a constant image drives 64-block cross-scan EOB runs
    const = np.full((64, 64), 200, dtype=np.uint8)
    out = J.decode_jpeg(
        J.encode_jpeg_progressive_gray(const, qtable=J.QTABLE_FLAT8))[3]
    assert out == const.tobytes()


def test_progressive_jpeg_loud_failure_modes():
    import numpy as np
    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import jpeg_codec as J

    px = np.full((8, 8), 100, dtype=np.uint8)
    prog = J.encode_jpeg_progressive_gray(px)
    # truncation inside a scan stays loud
    with _pytest.raises(ValueError):
        J.decode_jpeg(prog[:len(prog) // 2])
    # a stream with SOF2 but zero scans has no pixels to return
    eoi = prog.index(b"\xff\xda")
    with _pytest.raises(ValueError, match="no scan"):
        J.decode_jpeg(prog[:eoi] + b"\xff\xd9")


# --- interlaced GIF (round-8) -------------------------------------------------

def test_gif_interlace_round_trip():
    """4-pass GIF interlace is pure row reordering: interlaced and
    plain encodings of the same indices decode identically, across
    heights that leave passes empty (h=1 has only pass 1; h=2 adds
    pass 4; odd heights split unevenly)."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM

    for w, h in ((9, 11), (8, 8), (5, 1), (3, 2), (16, 17)):
        y, x = np.ogrid[0:h, 0:w]
        idx = ((3 + x + 2 * y) % 4).astype(np.uint8)
        pal = bytes((11 * i + 7 * c) % 256 for i in range(4) for c in range(3))
        plain = MM.decode_gif(MM.encode_gif(w, h, idx.tobytes(), pal))
        inter = MM.decode_gif(
            MM.encode_gif(w, h, idx.tobytes(), pal, interlace=True))
        assert plain == inter, (w, h)
        if h > 2:  # the wire really is row-reordered
            assert MM.encode_gif(w, h, idx.tobytes(), pal) != MM.encode_gif(
                w, h, idx.tobytes(), pal, interlace=True)


# --- TIFF LZW (round-8) --------------------------------------------------------

def test_tiff_lzw_round_trips():
    """Compressing-encoder round-trips that force every decoder path:
    width growth through 10/11/12 bits, mid-stream Clear at the
    4094-entry cap, the cScSc case, empty/one-byte inputs."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM

    rng = np.random.RandomState(3)
    cases = [
        b"", b"a",
        b"ababababababababab" * 50,
        bytes(rng.randint(0, 4, 20000)),
        bytes(rng.randint(0, 256, 9000)),
        bytes(range(256)) * 40,
        b"\x00" * 5000,
        bytes(rng.randint(0, 2, 60000)),
    ]
    for i, d in enumerate(cases):
        assert MM.tiff_lzw_decode(MM.tiff_lzw_encode(d), len(d)) == d, i


def test_tiff_lzw_container_round_trips():
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM

    rng = np.random.RandomState(5)
    for ch in (1, 3):
        for endian in ("little", "big"):
            for rps in (None, 3):
                px = rng.randint(0, 256, 7 * 11 * ch).astype(
                    np.uint8).tobytes()
                t = MM.encode_tiff_pixels(
                    7, 11, px, channels=ch, endian=endian,
                    rows_per_strip=rps, lzw=True)
                assert MM.decode_tiff(t) == (7, 11, ch, px)


def test_tiff_lzw_loud_failure_modes():
    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import multimodal as MM

    enc = MM.tiff_lzw_encode(b"hello world")
    with _pytest.raises(ValueError, match="truncated|without EOI|bad TIFF"):
        MM.tiff_lzw_decode(enc[:3], 11)
    with _pytest.raises(ValueError, match="of 99 bytes"):
        MM.tiff_lzw_decode(enc, 99)
    # predictor 2 (horizontal differencing) stays out of subset
    t = MM.encode_tiff_pixels(4, 4, bytes(16), channels=1, lzw=True)
    # splice tag 317=2 would need IFD surgery; the guard is covered by
    # the decode path check — assert the encoder cannot emit it
    with _pytest.raises(ValueError, match="pick one compression"):
        MM.encode_tiff_pixels(4, 4, bytes(16), channels=1, lzw=True,
                              packbits=True)


# --- coverage closure: exercised-nowhere-else helpers (round-8 sweep) --------

def test_decode_kafka_cvs_wire_format(spark):
    """The CV twin of the tested offer decoder: binary Kafka value ->
    typed CV columns against the fixed schema (pure transformation, so
    the batch twin is the streaming semantics)."""
    import json

    from bigdata_jobmatching_spark.streaming.ingest import decode_kafka_cvs

    payload = {
        "cv_id": "CV_1", "annees_experience": 4,
        "competences": ["python", "spark"],
        "localisation_souhaitee_id": "LOC_3",
        "salaire_souhaite": 450000.0,
    }
    wire = spark.createDataFrame(
        [(b"k1", json.dumps(payload).encode()), (b"k2", b"not json")],
        "key binary, value binary",
    )
    out = decode_kafka_cvs(wire).collect()
    by_id = {r.cv_id: r for r in out}
    assert by_id["CV_1"].annees_experience == 4
    assert by_id["CV_1"].competences == ["python", "spark"]
    assert None in by_id  # malformed JSON -> NULL row, not a crash


def test_global_topk_plans_as_take_ordered(spark):
    """global_topk must plan as TakeOrderedAndProject — each partition
    keeps k rows and only k x P rows reach the merge; a global Sort in
    the plan would be the 100 TB failure."""
    from pyspark.sql import functions as F

    from bigdata_jobmatching_spark.operators.topk import global_topk
    from bigdata_jobmatching_spark.sources.io import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    top = global_topk(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 5)
    rows = top.collect()
    assert len(rows) == 5
    assert [r.o_totalprice for r in rows] == sorted(
        (r.o_totalprice for r in rows), reverse=True)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_daily_rollup_stream_matches_batch(spark, tmp_path):
    """daily_rollup drained AvailableNow equals the same aggregation
    run as a batch — the event_hygiene equivalence discipline."""
    from pyspark.sql import functions as F

    from bigdata_jobmatching_spark.streaming.rollup import daily_rollup

    src = str(tmp_path / "ev")
    ev = spark.createDataFrame(
        [(i, f"2024-01-{(i % 3) + 1:02d} 10:00:00", "click" if i % 2 else "view",
          float(i)) for i in range(40)],
        "event_id long, ts_str string, event_type string, value double",
    ).select("event_id", F.col("ts_str").cast("timestamp").alias("ts"),
             "event_type", "value")
    ev.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = (
        daily_rollup(stream).writeStream.outputMode("complete")
        .format("memory").queryName("rollup_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = {
        (str(r.day), r.event_type, r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM rollup_out").collect()
    }
    want = {
        (str(r.day), r.event_type, r.n_events, r.total_value)
        for r in daily_rollup(ev).collect()  # batch: watermark is a no-op
    }
    assert got == want and len(want) == 6


# --- VP8L / WebP lossless (round-8) -------------------------------------------

def test_vp8l_feature_matrix_round_trips():
    """Every in-subset feature combination round-trips: simple/normal
    prefix codes, subtract-green, predictor (2 block sizes), color
    cache, LZ77 — on random pixels and edge geometries."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import vp8l_codec as V8

    rng = np.random.RandomState(9)
    for w, h in ((9, 7), (1, 1), (33, 2)):
        rgba = rng.randint(0, 256, size=h * w * 4).astype(np.uint8).tobytes()
        for sg in (False, True):
            for pb in (None, 2):
                for cb in (0, 4):
                    webp = V8.encode_vp8l(
                        w, h, rgba, subtract_green=sg, predictor_bits=pb,
                        cache_bits=cb, lz77=True)
                    assert V8.decode_vp8l(webp) == (w, h, 4, rgba), \
                        (w, h, sg, pb, cb)


def test_vp8l_all_predictor_modes_and_lz77_runs():
    import numpy as np

    from bigdata_jobmatching_spark.operators import vp8l_codec as V8

    flat = (np.ones((6, 40, 4), dtype=np.uint8) * 37).tobytes()
    for mode in range(14):
        webp = V8.encode_vp8l(40, 6, flat, predictor_bits=2,
                              predictor_mode=mode, cache_bits=5, lz77=True)
        assert V8.decode_vp8l(webp) == (40, 6, 4, flat), mode
    # tiny alphabet -> SIMPLE codes on the wire
    two = np.zeros((4, 5, 4), dtype=np.uint8)
    two[::2] = 200
    webp = V8.encode_vp8l(5, 4, two.tobytes())
    assert V8.decode_vp8l(webp) == (5, 4, 4, two.tobytes())


def test_vp8l_loud_failure_modes():
    import numpy as np
    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import multimodal as MM
    from bigdata_jobmatching_spark.operators import vp8l_codec as V8

    assert V8.decode_vp8l(b"not webp") is None
    rgba = np.zeros(4 * 4 * 4, dtype=np.uint8).tobytes()
    good = V8.encode_vp8l(4, 4, rgba)
    with _pytest.raises(ValueError):
        V8.decode_vp8l(good[: len(good) - 6])
    # lossy VP8 chunk stays loud (not silently empty)
    lossy = good[:12] + b"VP8 " + good[16:]
    with _pytest.raises(ValueError, match="not lossless"):
        V8.decode_vp8l(lossy)
    # dispatched through decode_image; WAV RIFF payloads don't collide
    assert MM.decode_image(good) == (4, 4, 4, rgba)
    wav = MM.make_wav(1, 8000, 16)
    assert MM.decode_image(wav) is None
