"""Round-7 operator tests: palette PNG (color type 3), BPE merge
application, and the ADVICE-fix loud paths."""

from __future__ import annotations

import numpy as np
import pytest

from bigdata_jobmatching_spark.operators import multimodal as MM


# --- palette PNG codec ----------------------------------------------------

def _planted_palette(k: int = 5, w: int = 9, h: int = 6, n_pal: int = 7):
    y, x = np.ogrid[0:h, 0:w]
    idx = ((k + 3 * x + 5 * y) % n_pal).astype(np.uint8)
    pal = bytes(
        (k + 11 * i + 101 * c) % 256 for i in range(n_pal) for c in range(3)
    )
    return idx, pal


def test_palette_png_round_trip_every_filter():
    idx, pal = _planted_palette()
    h, w = idx.shape
    expect = (
        np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx].tobytes()
    )
    for ft in (0, 1, 2, 3, 4, None):  # None cycles y % 5
        png = MM.encode_png(
            w, h, idx.tobytes(), channels=1, filter_type=ft, palette=pal
        )
        dw, dh, ch, px = MM.decode_png(png)
        assert (dw, dh, ch) == (w, h, 3)
        assert px == expect


def test_palette_png_loud_failure_modes():
    idx, pal = _planted_palette()
    h, w = idx.shape
    # index beyond palette
    bad = idx.copy()
    bad[0, 0] = len(pal) // 3
    png = MM.encode_png(
        w, h, bad.tobytes(), channels=1, filter_type=0, palette=pal
    )
    with pytest.raises(ValueError, match="palette index"):
        MM.decode_png(png)
    # missing PLTE: strip the chunk out of a valid palette PNG
    good = MM.encode_png(
        w, h, idx.tobytes(), channels=1, filter_type=0, palette=pal
    )
    plte_at = good.index(b"PLTE") - 4
    plte_len = int.from_bytes(good[plte_at:plte_at + 4], "big")
    stripped = good[:plte_at] + good[plte_at + 12 + plte_len:]
    with pytest.raises(ValueError, match="PLTE"):
        MM.decode_png(stripped)
    # palette tRNS is IN subset since round 8: a spliced alpha table
    # upgrades the decode to RGBA (entry 0 translucent, rest opaque);
    # gray/truecolor tRNS stays out of subset (test_round8_queries).
    iend_at = good.index(b"IEND") - 4
    trns = MM._png_chunk(b"tRNS", b"\x80")
    dw, dh, ch, px = MM.decode_png(good[:iend_at] + trns + good[iend_at:])
    assert (dw, dh, ch) == (w, h, 4)
    alphas = {px[i] for i in range(3, len(px), 4)}
    assert alphas == {0x80, 255}
    # encoder validation
    with pytest.raises(ValueError, match="1 index byte"):
        MM.encode_png(w, h, idx.tobytes(), channels=3, palette=pal)
    with pytest.raises(ValueError, match="PLTE length"):
        MM.encode_png(w, h, idx.tobytes(), channels=1, palette=b"\x00\x01")


def test_palette_png_decode_image_dispatch():
    # decode_image must route color-type-3 PNGs through the same
    # palette expansion (shared contract with the GIF decoder)
    idx, pal = _planted_palette(k=9)
    h, w = idx.shape
    png = MM.encode_png(
        w, h, idx.tobytes(), channels=1, filter_type=None, palette=pal
    )
    dw, dh, ch, px = MM.decode_image(png)
    assert (dw, dh, ch) == (w, h, 3)
    assert px == np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx].tobytes()


# --- BPE merge application (plans/text_queries.py fold) -------------------

def test_bpe_merge_pass_fold_semantics(spark):
    from pyspark.sql import functions as F

    from bigdata_jobmatching_spark.plans.text_queries import _bpe_merge_pass

    df = spark.createDataFrame(
        [("abab",), ("bbb",), ("a",), ("cabd",)], "w string"
    ).withColumn(
        "toks",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
    )
    out = {
        r.w: r.merged
        for r in df.select(
            "w", _bpe_merge_pass(F.col("toks"), F.lit("ab")).alias("merged")
        ).collect()
    }
    assert out == {
        "abab": ["ab", "ab"],
        "bbb": ["b", "b", "b"],
        "a": ["a"],
        "cabd": ["c", "ab", "d"],
    }
    # rank-priority chaining: a merged 2-char token never re-merges
    df2 = spark.createDataFrame([("abcb",)], "w string").withColumn(
        "toks",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
    )
    chained = _bpe_merge_pass(
        _bpe_merge_pass(F.col("toks"), F.lit("bc")), F.lit("cb")
    )
    assert df2.select(chained.alias("m")).collect()[0].m == ["a", "bc", "b"]


# --- ADVICE-fix loud paths ------------------------------------------------

def test_jpeg_multi_scan_baseline_raises():
    # A 3-component baseline JPEG whose SOS covers only 1 component
    # must raise, not silently decode a partial scan (round-6 ADVICE).
    from bigdata_jobmatching_spark.operators import jpeg_codec as JC

    rgb = np.full((16, 16, 3), (90, 120, 200), dtype=np.uint8)
    full = JC.encode_jpeg_color(rgb)
    sos_at = full.index(b"\xff\xda")
    seg_len = int.from_bytes(full[sos_at + 2:sos_at + 4], "big")
    # rewrite the SOS to cover a single component (ns=1, comp 1, tables 0/0)
    single = full[:sos_at] + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00" + (
        full[sos_at + 2 + seg_len:]
    )
    with pytest.raises(ValueError, match="multi-scan"):
        JC.decode_jpeg(single)


def test_versioned_insert_offset_guard_raises(spark):
    # keys at/above the insert offset must fail loudly, not collide
    from pyspark.sql import functions as F

    from bigdata_jobmatching_spark.plans.versioned_queries import (
        _INS_OFFSET,
        _guarded_insert_id,
    )
    from pyspark.errors import SparkRuntimeException

    ok = spark.range(5).select(_guarded_insert_id(F.col("id")).alias("id"))
    assert [r.id for r in ok.collect()] == [_INS_OFFSET + i for i in range(5)]
    bad = spark.createDataFrame([(int(_INS_OFFSET),)], "id long").select(
        _guarded_insert_id(F.col("id")).alias("id")
    )
    with pytest.raises(SparkRuntimeException):
        bad.collect()


def test_hard_negatives_null_label_is_distinct(spark):
    # NULL-labeled corpus rows stay eligible negatives (round-6 ADVICE)
    from bigdata_jobmatching_spark.operators.similarity_search import (
        hard_negatives_topk,
    )

    rows = [
        (1, [1.0, 0.0], "a"),
        (2, [0.9, 0.1], None),   # NULL label: a valid negative for "a"
        (3, [0.8, 0.2], "a"),    # same label: never a negative
        (4, [0.0, 1.0], "b"),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label string")
    out = hard_negatives_topk(
        df, df.filter("vec_id = 1"), "vec_id", "embedding", "label", k=3
    ).collect()
    got = {(r.neighbor_id, r.neighbor_label) for r in out}
    assert got == {(2, None), (4, "b")}


def test_resize_images_transcodes_tiff_and_palette_png(spark):
    """fake=False resize covers every decode_image format: a PackBits
    RGB TIFF and a palette PNG both come back as REAL PNG thumbnails
    with the exact nearest-resample pixels."""
    w, h = 8, 4
    rgb = bytes((5 * x + 11 * y + 23 * c) % 256
                for y in range(h) for x in range(w) for c in range(3))
    tiff = MM.encode_tiff_pixels(w, h, rgb, channels=3, packbits=True)
    idx, pal = _planted_palette(k=3, w=w, h=h)
    ppng = MM.encode_png(
        w, h, idx.tobytes(), channels=1, filter_type=None, palette=pal
    )
    df = spark.createDataFrame(
        [(1, bytearray(tiff)), (2, bytearray(ppng))],
        "p_partkey long, payload binary",
    )
    out = {r["p_partkey"]: r for r in
           MM.resize_images(df, max_side=4, fake=False).collect()}
    for key, src_bytes in ((1, rgb), (2, None)):
        r = out[key]
        assert (r["rs_format"], r["rs_width"], r["rs_height"]) == ("png", 4, 2)
    src = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    expect = src[np.ix_((np.arange(2) * h) // 2, (np.arange(4) * w) // 4)]
    assert MM.decode_png(bytes(out[1]["resized"])) == (4, 2, 3, expect.tobytes())
    psrc = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx]
    pexpect = psrc[np.ix_((np.arange(2) * h) // 2, (np.arange(4) * w) // 4)]
    assert MM.decode_png(bytes(out[2]["resized"])) == (4, 2, 3, pexpect.tobytes())


# --- Adam7 interlaced PNG (round-7 part 2) --------------------------------

def test_interlaced_png_round_trip_filters_channels_and_sizes():
    """encode(interlace=True) -> decode is identity across channel
    counts, filters, and sizes that exercise both empty passes
    (dims < pass grid) and multi-pass splits."""
    rng = np.random.RandomState(11)
    for w, h in ((1, 1), (2, 3), (7, 5), (8, 8), (9, 13), (16, 9), (1, 10)):
        for ch in (1, 2, 3, 4):
            px = rng.randint(0, 256, size=h * w * ch, dtype=np.uint8).tobytes()
            for ft in (0, 4, None):
                b = MM.encode_png(
                    w, h, px, channels=ch, filter_type=ft, interlace=True
                )
                assert MM.decode_png(b) == (w, h, ch, px), (w, h, ch, ft)


def test_interlaced_png_stream_is_genuinely_interlaced():
    """The interlaced stream must differ from the sequential one and
    carry interlace=1 in IHDR — i.e. the flag isn't a no-op."""
    px = bytes(range(9 * 13 * 3 % 256)) * 0 + bytes(
        (7 * i) % 256 for i in range(9 * 13 * 3)
    )
    seq = MM.encode_png(9, 13, px, channels=3)
    lace = MM.encode_png(9, 13, px, channels=3, interlace=True)
    assert seq != lace
    # IHDR interlace byte: offset 8 (sig) + 8 (len+type) + 12
    assert seq[8 + 8 + 12] == 0 and lace[8 + 8 + 12] == 1


def test_interlaced_palette_png_composes():
    idx, pal = _planted_palette(k=9, w=11, h=10, n_pal=13)
    h, w = idx.shape
    expect = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[idx].tobytes()
    b = MM.encode_png(
        w, h, idx.tobytes(), channels=1, filter_type=None,
        palette=pal, interlace=True,
    )
    assert MM.decode_png(b) == (w, h, 3, expect)


def test_interlaced_png_truncated_stream_is_loud():
    """Dropping pass bytes from the zlib stream must raise, not
    return a partially-scattered image."""
    import zlib

    px = bytes((5 * i) % 256 for i in range(12 * 10 * 3))
    b = MM.encode_png(12, 10, px, channels=3, interlace=True)
    # rebuild with a truncated IDAT payload (re-deflate a prefix so
    # the zlib stream itself is valid but short)
    sig_end = 8
    chunks = []
    pos = sig_end
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        ctype = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        chunks.append((ctype, data))
        pos += 12 + ln
    out = b[:sig_end]
    for ctype, data in chunks:
        if ctype == b"IDAT":
            data = zlib.compress(zlib.decompress(data)[:-7])
        out += MM._png_chunk(ctype, data)
    with pytest.raises(ValueError):
        MM.decode_png(out)


def test_decode_image_batch_decodes_interlaced_png(spark):
    """Interlaced PNGs are in-subset since round 7: the batch decoder
    must return real geometry + pixel sha1, not a NULL row."""
    import hashlib

    px = bytes((3 * i + 1) % 256 for i in range(6 * 7 * 3))
    lace = MM.encode_png(6, 7, px, channels=3, interlace=True)
    df = spark.createDataFrame(
        [(1, bytearray(lace))], "p_partkey long, payload binary"
    )
    row = MM.decode_image_batch(df).collect()[0]
    assert (row.px_width, row.px_height, row.px_channels) == (6, 7, 3)
    assert row.pixel_sha1 == hashlib.sha1(px).hexdigest()


# --- animated GIF + frame census (round-7 part 3) -------------------------

def test_animated_gif_census_and_first_frame():
    rng = np.random.RandomState(3)
    pal = bytes(rng.randint(0, 256, size=4 * 3, dtype=np.uint8))
    frames = [
        (bytes(rng.randint(0, 4, size=6, dtype=np.uint8)), d)
        for d in (5, 12, 0, 33)
    ]
    g = MM.encode_animated_gif(3, 2, frames, pal)
    assert MM.gif_frame_census(g) == (3, 2, 4, 50)
    # still-image decode reads frame 1 (documented first-frame rule)
    w, h, ch, px = MM.decode_gif(g)
    expect = (
        np.frombuffer(pal, dtype=np.uint8)
        .reshape(4, 3)[np.frombuffer(frames[0][0], dtype=np.uint8)]
        .tobytes()
    )
    assert (w, h, ch) == (3, 2, 3) and px == expect


def test_gif_frame_census_walk_properties():
    pal = bytes(range(12))
    single = MM.encode_gif(3, 2, bytes(6), pal)
    assert MM.gif_frame_census(single) == (3, 2, 1, 0)
    assert MM.gif_frame_census(b"not a gif") is None
    g = MM.encode_animated_gif(3, 2, [(bytes(6), 7)], pal)
    with pytest.raises(ValueError):
        MM.gif_frame_census(g[:-4])  # truncated: loud, not a guess
    with pytest.raises(ValueError):
        MM.encode_animated_gif(3, 2, [(bytes(6), 70000)], pal)  # delay > u16


# --- min-label propagation closed form ------------------------------------

def test_min_label_propagation_is_khop_ball_min(spark):
    """After k rounds, label(v) must equal min(id) over v's k-hop
    ball — checked on a path graph where the closed form is obvious:
    node i on a path 0-1-2-...-9 has label max(0, i-k)."""
    from bigdata_jobmatching_spark.operators.graph import (
        min_label_propagation,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "m long, n long"
    )
    for rounds in (1, 2, 3):
        got = {
            r.node: r.label
            for r in min_label_propagation(edges, rounds=rounds).collect()
        }
        assert got == {i: max(0, i - rounds) for i in range(10)}, rounds


# --- bit-exact k-means semantics ------------------------------------------

def test_kmeans_exact_separable_fixture(spark, monkeypatch, tmp_path):
    """On two well-separated blobs with seeds one-per-blob, a single
    Lloyd iteration must land each centroid on its blob's exact
    integer mean and the final assignment must split 50/50 with the
    within-blob inertia the fixture plants."""
    import numpy as np
    from bigdata_jobmatching_spark.plans import vector_queries as V

    rows = []
    for i in range(10):
        # blob A near +0.5, blob B near -0.5; dims 0/1 informative
        base = 0.5 if i % 2 == 0 else -0.5
        vec = [base + (i % 3) * 0.001] * 2 + [0.0] * 62
        rows.append((i, vec, i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    # seeds are vec_id 0 (blob A) and 1 (blob B) ... K=4 uses ids 0-3,
    # two seeds per blob: duplicate-seed clusters go empty and keep
    # their centroid (COALESCE path) — also exercised here
    out = {r.cluster_id: r for r in
           V._embedding_kmeans(spark, str(tmp_path)).collect()}
    assert sum(r.n_members for r in out.values()) == 10
    # blob membership: clusters seeded at 0/2 (blob A) and 1/3 (blob B)
    a = sum(r.n_members for cid, r in out.items() if cid in (0, 2))
    b = sum(r.n_members for cid, r in out.items() if cid in (1, 3))
    assert (a, b) == (5, 5)
    # centroid dim0 signs match the blobs for every non-empty cluster
    for cid, r in out.items():
        if r.n_members:
            assert (r.c_dim0 > 0) == (cid in (0, 2)), (cid, r)


def test_bm25_rational_scoring_monotonicity(spark, tmp_path):
    """Higher tf must rank a doc above a same-length doc with lower
    tf, and between equal-tf docs the shorter one scores higher —
    the two core BM25 monotonicities, on a planted corpus."""
    from bigdata_jobmatching_spark.plans import text_queries as TQ

    filler = ["pad%d" % i for i in range(12)]
    docs = [
        (0, "term term term " + " ".join(filler[:6])),   # tf=3, dl=9
        (1, "term term " + " ".join(filler[:7])),        # tf=2, dl=9
        (2, "term term " + " ".join(filler[:4])),        # tf=2, dl=6
        (3, " ".join(filler)),                           # tf=0
    ] + [(i, "zz%d yy%d xx%d" % (i, i, i)) for i in range(4, 40)]
    from pyspark.sql import functions as SF

    df = spark.createDataFrame(docs, "doc_id long, text string")
    df = df.withColumn("lang", SF.lit("en")).withColumn(
        "source", SF.lit("s")).withColumn("n_chars", SF.length("text"))
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    # make 'term' a query term: it must land on a queried freq rank.
    # With this corpus 'term' (freq 7) is rank 1... instead call the
    # scorer directly at a known rank set by monkeypatching the ranks
    import unittest.mock as mock

    with mock.patch.object(TQ, "_BM25_QRANKS", (1,)):
        got = TQ._bm25_topk(spark, str(tmp_path)).collect()
    scores = {r.doc_id: r.score_micro for r in got}
    assert set(scores) >= {0, 1, 2}
    assert 3 not in scores          # zero-tf docs never surface
    assert scores[0] > scores[1]    # tf monotone
    assert scores[2] > scores[1]    # shorter doc wins at equal tf


# --- 16-bit PNG + MP4 census (round-7 part 4) -----------------------------

def test_png16_round_trip_all_shapes():
    rng = np.random.RandomState(5)
    for w, h, ch in ((1, 1, 1), (3, 2, 3), (9, 13, 2), (8, 8, 4)):
        px = (
            rng.randint(0, 65536, size=h * w * ch, dtype=np.uint16)
            .astype(">u2").tobytes()
        )
        for ft in (0, 3, None):
            for il in (False, True):
                b = MM.encode_png(
                    w, h, px, channels=ch, filter_type=ft,
                    interlace=il, bit_depth=16,
                )
                assert MM.decode_png16(b) == (w, h, ch, px), (w, h, ch, ft, il)


def test_png16_depth_mismatch_is_loud():
    px16 = bytes(3 * 2 * 3 * 2)
    b16 = MM.encode_png(3, 2, px16, channels=3, bit_depth=16)
    with pytest.raises(ValueError, match="wants depth 8"):
        MM.decode_png(b16)
    px8 = bytes(3 * 2 * 3)
    b8 = MM.encode_png(3, 2, px8, channels=3)
    with pytest.raises(ValueError, match="wants depth 16"):
        MM.decode_png16(b8)
    with pytest.raises(ValueError, match="palette PNG requires bit depth 8"):
        MM.encode_png(3, 2, bytes(12), channels=1,
                      palette=bytes(12), bit_depth=16)


def test_mp4_track_census_walk():
    b = MM.make_mp4_tracked(
        2500, [(b"vide", [100, 250, 75]), (b"soun", [10] * 5)]
    )
    assert MM.mp4_track_census(b) == (2500, 2, 1, 1, 8, 475)
    assert MM.parse_mp4_header(b) == 2500  # old parser still agrees
    assert MM.mp4_track_census(b"not an mp4") is None
    # zero-track file from the minimal builder
    assert MM.mp4_track_census(MM.make_mp4(1234)) == (1234, 0, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        MM.mp4_track_census(b[:-6])  # truncated box: loud
