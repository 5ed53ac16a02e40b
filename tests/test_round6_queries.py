"""Round-6 additions: ADVICE r5 behavioral fixes (NULL heavy-hitter
group, decode_image_batch corrupt-PNG NULLs, extract_features dim
contract) plus new query/operator coverage added this round."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_jobmatching_spark.sources.io import load_table


# --- ADVICE r5 fixes -------------------------------------------------------

def test_heavy_hitters_reports_null_key_group(spark):
    """ADVICE r5 (skew.py:182): NULL keys used to count in n_total but
    could never be REPORTED (the semi-join drops nulls). Now the NULL
    group behaves exactly like SQL GROUP BY ... HAVING: reported when
    it exceeds n/denom, with its exact count."""
    from bigdata_jobmatching_spark.operators.skew import heavy_hitters_exact

    rows = [("hot",)] * 500 + [(None,)] * 400
    rows += [(f"cold_{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    n = len(rows)  # threshold n/10 = 290: hot and NULL both qualify
    out = {r["k"]: r for r in
           heavy_hitters_exact(df, "k", denom=10, summary_k=20).collect()}
    assert set(out) == {"hot", None}
    assert out["hot"]["n_rows"] == 500
    assert out[None]["n_rows"] == 400 and out[None]["n_total"] == n

    # matches the SQL-oracle shape on the same data
    df.createOrReplaceTempView("hh_null_t")
    brute = sorted(
        [(r["k"], r["n_rows"]) for r in spark.sql(
            "SELECT k, count(*) AS n_rows FROM hh_null_t "
            "GROUP BY k HAVING count(*) * 10 > (SELECT count(*) FROM hh_null_t)"
        ).collect()],
        key=lambda t: (t[0] is None, t[0] or ""))
    got = sorted([(k, v["n_rows"]) for k, v in out.items()],
                 key=lambda t: (t[0] is None, t[0] or ""))
    assert got == brute


def test_decode_image_batch_corrupt_png_yields_null_row(spark):
    """ADVICE r5 (multimodal.py:895): a PNG-signature payload that is
    corrupt (bad CRC) or outside the supported subset used to escape
    the mapInPandas worker as ValueError and kill the job. Now every
    undecodable payload keeps its row with NULL geometry
    (audit-don't-drop), like the sibling fake=False paths."""
    from bigdata_jobmatching_spark.operators import multimodal as MM

    good = MM.encode_png(2, 1, bytes([0, 100, 200, 50, 150, 250]), channels=3)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte inside the IEND/CRC region
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytes(bad_crc)),
         (3, MM._PNG_SIG + b"\x00truncated"), (4, None)],
        "p_partkey long, payload binary",
    )
    out = {r["p_partkey"]: r for r in MM.decode_image_batch(df).collect()}
    assert len(out) == 4  # no row dropped, no job failure
    assert (out[1]["px_width"], out[1]["px_height"], out[1]["px_channels"]) == (2, 1, 3)
    for k in (2, 3, 4):
        assert out[k]["px_width"] is None and out[k]["pixel_sha1"] is None


def test_extract_features_real_path_rejects_non_default_dim(spark):
    """ADVICE r5 (multimodal.py:94): fake=False silently ignored dim
    (the PNG channel feature is fixed 8-wide). Now it raises instead
    of returning a different width than requested."""
    from bigdata_jobmatching_spark.operators import multimodal as MM

    df = spark.createDataFrame([], MM.MEDIA_SCHEMA)
    with pytest.raises(ValueError, match="dim=16"):
        MM.extract_features(df, fake=False, dim=16)
    MM.extract_features(df, fake=False, dim=8)  # default width fine


# --- round-6 oracled twins for the rows-only trio --------------------------

def test_sentence_synth_case_analysis_matches_scanner():
    """The CASE table inside sentence_span_stats' oracle (expected
    sentence count per fragment/tail variant) must equal what the real
    imperative scanner produces on the same constructions — on hostile
    word contexts including single-letter words before the fragment."""
    from bigdata_jobmatching_spark.functions.segment import split_sentences
    from bigdata_jobmatching_spark.plans.text_queries import (
        _SENT_FRAG_B, _SENT_FRAGS, _SENT_TAIL_N, _SENT_TAILS,
    )

    heads = [
        "key agg row scan slow fast table value part a",  # 1-letter word
        "x",                                              # tiny doc
        "word " * 20,                                     # > substring window
    ]
    for head in heads:
        for fi, frag in enumerate(_SENT_FRAGS):
            for ti, tail in enumerate(_SENT_TAILS):
                synth = head[:40] + frag + " " + head[49:79] + tail
                spans = split_sentences(synth)
                assert len(spans) == _SENT_FRAG_B[fi] + _SENT_TAIL_N[ti], (
                    fi, ti, synth)
                assert sum(e - s for _, s, e, _ in spans) == len(synth)
                assert spans[0][1] == 0 and spans[-1][2] == len(synth)


def test_ffd_invariants_query_all_true(spark):
    """Every invariant boolean of ffd_packing_invariants must actually
    evaluate TRUE on real data (the oracle hashes them as literals, so
    a FALSE is a gate failure — this is the local early warning)."""
    from bigdata_jobmatching_spark.plans.mixing_queries import _ffd_invariants

    rows = _ffd_invariants(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        for b in ("fills_consistent", "fill_ok", "pack_lb_ok",
                  "pack_ub_ok", "one_light_ok"):
            assert r[b] is True, (r["source"], b)


def test_lake_match_stats_uses_the_match_lakes_adapters(spark, tmp_path):
    """The gate query and match_lakes must go through the SAME
    adaptation functions: running match_lakes over parquet landings of
    the query's synthetic lakes yields exactly the score rows the
    query aggregates."""
    from bigdata_jobmatching_spark.orchestrate import match_lakes
    from bigdata_jobmatching_spark.plans.domain_pipeline import normalize_cvs
    from bigdata_jobmatching_spark.plans.domain_queries import (
        _lake_match_stats, _lake_offers, _raw_cvs,
    )

    sf = "/root/testdata/sf0.001"
    offers_dir = str(tmp_path / "offers")
    cvs_dir = str(tmp_path / "cvs")
    _lake_offers(spark, sf).write.parquet(offers_dir)
    normalize_cvs(_raw_cvs(spark, sf)).write.parquet(cvs_dir)
    out = match_lakes(spark, offers_dir, cvs_dir, str(tmp_path / "out"),
                      max_skill_df_frac=0.5)
    n_pairs_lake = out["matching_scores"]
    agg = _lake_match_stats(spark, sf)
    assert sum(r["n_pairs"] for r in agg.collect()) == n_pairs_lake


# --- GIF LZW codec (round-6 second pixel-real format) ---------------------

def _lzw_compress_ref(min_code_size: int, indices: bytes) -> bytes:
    """Textbook compressing GIF-LZW writer (dictionary growth, width
    bumps, 12-bit cap + clear) — independent of the fixture writer's
    literals-only encoder, so decoding it proves the decoder's
    dictionary-rebuild logic, not just bit unpacking."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    put(clear, width)
    w = b""
    for ix in indices:
        wk = w + bytes([ix])
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            put(clear, width)
            width = min_code_size + 1
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
        w = bytes([ix])
    if w:
        put(table[w], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_lzw_decoder_inverts_real_compression():
    """Dictionary growth across width bumps AND the cScSc
    self-reference case: 'ababab...' forces code == next table slot
    immediately; a long LCG stream forces growth through 10/11/12-bit
    codes and a mid-stream clear."""
    from bigdata_jobmatching_spark.operators.multimodal import _lzw_decode

    cscsc = bytes([0, 1] * 50)
    got = _lzw_decode(2, _lzw_compress_ref(2, cscsc), len(cscsc))
    assert got == cscsc

    x, stream = 7, bytearray()
    for _ in range(20000):
        x = (1103515245 * x + 12345) % (1 << 31)
        stream.append(x % 256)
    comp = _lzw_compress_ref(8, bytes(stream))
    assert _lzw_decode(8, comp, len(stream)) == bytes(stream)


def test_gif_round_trip_all_variants():
    """encode_gif -> decode_gif identity over table kinds, versions,
    palette sizes, and shapes incl. 1x1."""
    from bigdata_jobmatching_spark.operators import multimodal as MM

    pal256 = bytes(b for i in range(256) for b in (i, (i * 3) % 256, (i * 7) % 256))
    pal4 = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    for pal, n in ((pal256, 256), (pal4, 4)):
        for w, h in ((1, 1), (7, 3), (8, 6)):
            idx = bytes((5 * x + 11 * y) % n for y in range(h) for x in range(w))
            for lt in (False, True):
                for anim in (False, True):
                    g = MM.encode_gif(w, h, idx, pal,
                                      local_table=lt, animated_89a=anim)
                    exp = bytes(c for ix in idx for c in pal[3 * ix:3 * ix + 3])
                    assert MM.decode_gif(g) == (w, h, 3, exp), (n, w, h, lt, anim)
                    assert MM.decode_image(g) == (w, h, 3, exp)
                    assert MM.parse_gif_header(g) == (w, h)


def test_gif_decoder_hostile_inputs():
    """Truncations and malformed structures raise ValueError (loud
    subset), non-GIF returns None — never a wrong answer."""
    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import multimodal as MM

    pal = bytes(range(12))
    good = MM.encode_gif(4, 3, bytes([0, 1, 2, 3] * 3), pal)
    assert MM.decode_gif(b"notagif") is None
    assert MM.decode_gif(b"") is None
    for cut in (14, len(good) // 2, len(good) - 3):
        with _pytest.raises(ValueError):
            MM.decode_gif(good[:cut])
    # interlace IS in subset since round 8: flipping the flag on a
    # plain stream makes a VALID interlaced GIF whose rows scatter by
    # the 4-pass order — for h=3 transmitted rows land at 0, 2, 1
    flipped = bytearray(good)
    i = flipped.index(0x2C)
    flipped[i + 9] |= 0x40
    w3, h3, c3, px3 = MM.decode_gif(bytes(flipped))
    plain = MM.decode_gif(good)[3]
    row = 4 * 3  # w=4, 3 bytes per pixel
    assert (w3, h3, c3) == (4, 3, 3)
    assert px3 == plain[0:row] + plain[2 * row:3 * row] + plain[row:2 * row]
    # palette index beyond a small color table
    with _pytest.raises(ValueError):
        MM.encode_gif(2, 1, bytes([0, 9]), pal)


def test_decode_image_batch_handles_gif_and_png(spark):
    """The format-dispatching batch decode: PNG and GIF rows both
    land real geometry+sha1, junk stays NULL-with-row."""
    import hashlib

    from bigdata_jobmatching_spark.operators import multimodal as MM

    png = MM.encode_png(2, 1, bytes([0, 100, 200, 50, 150, 250]), channels=3)
    pal = bytes([1, 2, 3, 4, 5, 6])
    gif = MM.encode_gif(3, 2, bytes([0, 1, 0, 1, 0, 1]), pal)
    gif_px = bytes([1, 2, 3, 4, 5, 6] * 3)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)), (3, b"junk")],
        "p_partkey long, payload binary",
    )
    out = {r["p_partkey"]: r for r in MM.decode_image_batch(df).collect()}
    assert (out[1]["px_width"], out[1]["px_height"], out[1]["px_channels"]) == (2, 1, 3)
    assert (out[2]["px_width"], out[2]["px_height"], out[2]["px_channels"]) == (3, 2, 3)
    assert out[2]["pixel_sha1"] == hashlib.sha1(gif_px).hexdigest()
    assert out[3]["px_width"] is None


def test_hard_negatives_exclude_same_label(spark):
    """Every mined negative must carry a different label than its
    query, scores must be non-increasing per query, and k bounds the
    fan-out."""
    from bigdata_jobmatching_spark.operators.similarity_search import (
        hard_negatives_topk,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    labels = {r["vec_id"]: r["label"] for r in
              e.select("vec_id", "label").collect()}
    out = hard_negatives_topk(e, q, "vec_id", "embedding", "label", k=3).collect()
    assert out
    per_q: dict = {}
    for r in out:
        assert labels[r["neighbor_id"]] == r["neighbor_label"]
        assert r["neighbor_label"] != labels[r["query_id"]]
        per_q.setdefault(r["query_id"], []).append((r["rnk"], r["score"]))
    for ranked in per_q.values():
        ranked.sort()
        assert len(ranked) <= 3
        scores = [s for _, s in ranked]
        assert scores == sorted(scores, reverse=True)


def test_resize_images_transcodes_gif_to_png_thumbnail(spark):
    """fake=False resize now accepts GIF input: decode via LZW,
    nearest-resample the palette-expanded RGB, re-encode as a REAL
    PNG thumbnail (format normalization). Header-only GIFs still
    yield NULL rows."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM

    pal = bytes(b for i in range(256) for b in (i, (2 * i) % 256, (3 * i) % 256))
    w, h = 8, 4
    idx = bytes((7 * x + 13 * y) % 256 for y in range(h) for x in range(w))
    gif = MM.encode_gif(w, h, idx, pal)
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(MM.make_gif(8, 8)))],
        "p_partkey long, payload binary",
    )
    out = {r["p_partkey"]: r for r in
           MM.resize_images(df, max_side=4, fake=False).collect()}
    r1 = out[1]
    assert (r1["rs_format"], r1["rs_width"], r1["rs_height"]) == ("png", 4, 2)
    src = np.frombuffer(
        bytes(c for ix in idx for c in pal[3 * ix:3 * ix + 3]), dtype=np.uint8
    ).reshape(h, w, 3)
    expect = src[np.ix_((np.arange(2) * h) // 2, (np.arange(4) * w) // 4)]
    assert MM.decode_png(bytes(r1["resized"])) == (4, 2, 3, expect.tobytes())
    assert out[2]["resized"] is None  # header-only GIF: loud subset -> NULL


def test_diff_versions_recovers_merge_change_feed(spark, tmp_path):
    """diff_frames over two PUBLISHED versions recovers exactly the
    change feed merge_version applied (the offline twin claim in its
    docstring): inserts, updates, tombstone deletes, and untouched
    rows classify correctly."""
    from bigdata_jobmatching_spark.sources import versioned as V

    root = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "id long, val string"
    )
    v1 = V.write_version(base, root)
    upd = spark.createDataFrame(
        [(2, "B", False), (3, "c", False), (4, "now-set", False),
         (5, "e", False), (1, None, True)],
        "id long, val string, deleted boolean",
    )
    v2 = V.merge_version(spark, root, upd, ("id",), delete_col="deleted")
    got = {r["id"]: r["change"] for r in
           V.diff_versions(spark, root, v1, v2, ("id",)).collect()}
    assert got == {1: "delete", 2: "update", 3: "unchanged",
                   4: "update", 5: "insert"}


def test_diff_frames_schema_mismatch_is_loud(spark):
    from bigdata_jobmatching_spark.sources.versioned import diff_frames

    a = spark.createDataFrame([(1, "x")], "id long, val string")
    b = spark.createDataFrame([(1, "x", 2)], "id long, val string, extra long")
    with pytest.raises(ValueError, match="schema mismatch"):
        diff_frames(a, b, ("id",))


def test_enrich_stream_with_dim_broadcast_join(spark, tmp_path):
    """Stream-static enrichment: every streamed offer row picks up its
    dimension attributes in-flight; dim misses survive as NULLs
    (left join), and the join is stateless (no watermark needed)."""
    import json as _json

    from bigdata_jobmatching_spark.streaming.ingest import (
        enrich_stream_with_dim,
    )

    src = tmp_path / "in"
    src.mkdir()
    rows = [{"loc": f"LOC_{i % 3}", "val": i} for i in range(20)]
    rows.append({"loc": "LOC_UNSEEN", "val": 99})
    (src / "batch.json").write_text(
        "\n".join(_json.dumps(r) for r in rows))
    stream = spark.readStream.schema("loc string, val long").json(str(src))
    dim = spark.createDataFrame(
        [(f"LOC_{i}", f"city{i}") for i in range(3)], "loc string, city string")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (enrich_stream_with_dim(stream, dim, "loc")
         .writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["val"]: r["city"] for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == 21
    assert got[0] == "city0" and got[1] == "city1" and got[5] == "city2"
    assert got[99] is None  # dim miss survives the left join


# --- baseline JPEG codec (round-6 third pixel-real format) ----------------

def test_jpeg_flat_block_pipeline_is_exact():
    """Flat 8x8 blocks + DC-step-8 quantization: the full
    FDCT -> quantize -> Huffman -> parse -> dequantize -> IDCT chain
    reproduces the planted bytes exactly — with and without restart
    markers (predictor reset + byte alignment)."""
    import numpy as np

    from bigdata_jobmatching_spark.operators.jpeg_codec import (
        QTABLE_FLAT8, decode_jpeg, encode_jpeg_gray,
    )

    h, w = 16, 24
    px = np.zeros((h, w), dtype=np.uint8)
    for by in range(h // 8):
        for bx in range(w // 8):
            px[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] = (7 + 5 * bx + 11 * by) % 200 + 20
    for ri in (0, 1, 2, 5):
        j = encode_jpeg_gray(px, QTABLE_FLAT8, restart_interval=ri)
        gw, gh, ch, raw = decode_jpeg(j)
        assert (gw, gh, ch) == (w, h, 1)
        assert np.array_equal(
            np.frombuffer(raw, dtype=np.uint8).reshape(gh, gw), px), ri


def test_jpeg_lossy_round_trip_is_close():
    """Real quantization path (Annex-K luma table) over gradients and
    random-ish texture: decode must land near the source (JPEG is
    lossy; closeness is the contract), exercising AC runs, ZRL and
    EOB codes."""
    import numpy as np

    from bigdata_jobmatching_spark.operators.jpeg_codec import (
        QTABLE_LUMA, decode_jpeg, encode_jpeg_gray,
    )

    yy, xx = np.mgrid[0:40, 0:64]
    # smooth, wrap-free ramp: sharp modulo seams would add legitimate
    # Gibbs ringing and test JPEG's nature, not the codec
    grad = np.clip(30 + xx * 2 + yy, 0, 230).astype(np.uint8)
    x = 42
    noise = np.zeros(40 * 64, dtype=np.uint8)
    for i in range(noise.size):
        x = (1103515245 * x + 12345) % (1 << 31)
        noise[i] = 100 + (x % 60)
    tex = noise.reshape(40, 64)
    for src, max_tol, mean_tol in ((grad, 8, 2.0), (tex, 45, 14.0)):
        j = encode_jpeg_gray(src, QTABLE_LUMA)
        w, h, _, raw = decode_jpeg(j)
        a = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(int)
        assert np.abs(a - src.astype(int)).max() <= max_tol
        assert np.abs(a - src.astype(int)).mean() < mean_tol


def test_jpeg_decoder_hostile_inputs():
    import numpy as np
    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import multimodal as MM
    from bigdata_jobmatching_spark.operators.jpeg_codec import (
        QTABLE_FLAT8, decode_jpeg, encode_jpeg_gray,
    )

    assert decode_jpeg(b"not a jpeg") is None
    assert decode_jpeg(b"") is None
    good = encode_jpeg_gray(
        np.full((8, 8), 90, dtype=np.uint8), QTABLE_FLAT8)
    for cut in (4, 20, len(good) // 2, len(good) - 3):
        with _pytest.raises(ValueError):
            decode_jpeg(good[:cut])
    # SOF2 is IN subset since round 8 — but a baseline stream with its
    # SOF marker flipped to SOF2 is a MALFORMED progressive stream
    # (its one SOS claims the 0..63 band for a DC scan) and must stay
    # loud, not decode to garbage
    prog = bytearray(good)
    i = prog.index(0xC0, 2)  # SOF0 marker byte after a 0xFF
    assert prog[i - 1] == 0xFF
    prog[i] = 0xC2
    with _pytest.raises(ValueError, match="DC scan with Se"):
        decode_jpeg(bytes(prog))
    # header-only fixture (no SOS) stays loud -> NULL rows downstream
    with _pytest.raises(ValueError):
        decode_jpeg(MM.make_jpeg(64, 32))


def test_decode_image_dispatches_jpeg_and_resize_transcodes(spark):
    """decode_image now covers all three formats; resize_images
    fake=False turns a REAL JPEG into a REAL PNG thumbnail whose
    pixels match the (exact-path) decoded source resampled."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM
    from bigdata_jobmatching_spark.operators.jpeg_codec import (
        QTABLE_FLAT8, encode_jpeg_gray,
    )

    h, w = 16, 16
    px = np.zeros((h, w), dtype=np.uint8)
    for by in range(2):
        for bx in range(2):
            px[8 * by:8 * by + 8, 8 * bx:8 * bx + 8] = 40 + 60 * bx + 100 * by
    j = encode_jpeg_gray(px, QTABLE_FLAT8)
    assert MM.decode_image(j) == (w, h, 1, px.tobytes())

    df = spark.createDataFrame([(1, bytearray(j))], "p_partkey long, payload binary")
    row = MM.resize_images(df, max_side=4, fake=False).collect()[0]
    assert (row["rs_format"], row["rs_width"], row["rs_height"]) == ("png", 4, 4)
    expect = px[np.ix_((np.arange(4) * h) // 4, (np.arange(4) * w) // 4)]
    assert MM.decode_png(bytes(row["resized"])) == (4, 4, 1, expect.tobytes())

    out = {r["p_partkey"]: r for r in MM.decode_image_batch(df).collect()}
    assert (out[1]["px_width"], out[1]["px_height"], out[1]["px_channels"]) == (w, h, 1)


def test_jpeg_color_444_and_420_decode():
    """The decoder's 3-component MCU interleave, chroma upsampling and
    YCbCr->RGB paths: smooth color planes survive 4:4:4 and 4:2:0
    round trips within chroma-subsampling tolerance."""
    import numpy as np

    from bigdata_jobmatching_spark.operators.jpeg_codec import (
        QTABLE_LUMA, decode_jpeg, encode_jpeg_color,
    )

    yy, xx = np.mgrid[0:32, 0:32]
    rgb = np.stack([
        np.clip(40 + xx * 3, 0, 230),
        np.clip(60 + yy * 3, 0, 230),
        np.clip(200 - xx - yy, 0, 230),
    ], axis=-1).astype(np.uint8)
    for sub, max_tol in ((False, 8), (True, 12)):
        j = encode_jpeg_color(rgb, QTABLE_LUMA, subsample_420=sub)
        w, h, ch, raw = decode_jpeg(j)
        assert (w, h, ch) == (32, 32, 3)
        a = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(int)
        err = np.abs(a - rgb.astype(int))
        assert err.max() <= max_tol and err.mean() < 3.0, sub


# --- real PCM sample decode (round-6 audio de-stub) ------------------------

def test_wav_pcm_round_trip_and_hostile():
    import numpy as np
    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import multimodal as MM

    x = ((np.arange(120) * 37) % 2001 - 1000).astype(np.int16).reshape(60, 2)
    w = MM.make_wav_pcm(2, 16000, x)
    ch, rate, a = MM.decode_wav_samples(w)
    assert (ch, rate) == (2, 16000) and np.array_equal(a, x)
    assert MM.decode_wav_samples(b"not riff") is None
    # header-only fixture declares data it doesn't carry -> loud
    with _pytest.raises(ValueError, match="shorter than declared"):
        MM.decode_wav_samples(MM.make_wav(1, 8000, 100))
    # compressed format tags are outside the PCM subset -> loud
    bad = bytearray(w)
    bad[20] = 2  # fmt tag: ADPCM
    with _pytest.raises(ValueError, match="format tag"):
        MM.decode_wav_samples(bytes(bad))


def test_wav_sample_stats_features_exact(spark):
    """Exact integer audio features over real PCM payloads, incl.
    stereo deinterleave (channel-1 junk must not leak into channel-0
    features) and NULL-with-row for undecodable payloads."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM

    c0 = np.array([100, -200, 300, -400, 500], dtype=np.int16)
    mono = MM.make_wav_pcm(1, 8000, c0.reshape(5, 1))
    stereo = MM.make_wav_pcm(
        2, 8000, np.stack([c0, np.full(5, 777, dtype=np.int16)], axis=1))
    df = spark.createDataFrame(
        [(1, bytearray(mono)), (2, bytearray(stereo)), (3, b"junk")],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in MM.wav_sample_stats(df).collect()}
    for k in (1, 2):
        r = out[k]
        assert (r["n_samples"], r["sum_abs"], r["peak"]) == (5, 1500, 500)
        assert r["sum_sq"] == int((c0.astype(np.int64) ** 2).sum())
        assert r["zero_crossings"] == 4
    assert out[2]["channels"] == 2
    assert out[3]["n_samples"] is None


def test_extract_features_real_path_covers_gif_and_jpeg(spark):
    """The fake=False feature now decodes all three real formats —
    GIF palette pixels and exact-path JPEG both land real channel
    means; undecodable payloads stay NULL."""
    import numpy as np

    from bigdata_jobmatching_spark.operators import multimodal as MM
    from bigdata_jobmatching_spark.operators.jpeg_codec import (
        QTABLE_FLAT8, encode_jpeg_gray,
    )

    pal = bytes([0, 0, 0, 255, 255, 255])  # black/white
    gif = MM.encode_gif(2, 1, bytes([0, 1]), pal)
    jpg = encode_jpeg_gray(np.full((8, 8), 200, dtype=np.uint8), QTABLE_FLAT8)
    df = spark.createDataFrame(
        [("g", "image", None, bytearray(gif), None, None, None),
         ("j", "image", None, bytearray(jpg), None, None, None),
         ("x", "image", None, bytearray(b"junk"), None, None, None)],
        MM.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in
            MM.extract_features(df, fake=False).collect()}
    g = rows["g"]["feature"]
    assert g[:3] == pytest.approx([0.5, 0.5, 0.5])   # mean of 0 and 255
    assert g[4:7] == pytest.approx([1.0, 1.0, 1.0])  # max 255
    j = rows["j"]["feature"]
    assert j[0] == pytest.approx(200 / 255) and j[4] == pytest.approx(200 / 255)
    assert j[1:4] == [0.0, 0.0, 0.0]  # grayscale pads channels 2-4
    assert rows["x"]["feature"] is None


# --- baseline TIFF codec (round-6 fourth pixel-real format) ----------------

def test_tiff_round_trip_full_matrix():
    """encode -> decode identity across gray/RGB x endianness x
    compression x strip layouts, plus WhiteIsZero inversion and
    hostile structures."""
    import itertools

    import pytest as _pytest

    from bigdata_jobmatching_spark.operators import multimodal as MM

    w, h = 7, 5
    for ch, endian, pb, rps in itertools.product(
            (1, 3), ("little", "big"), (False, True), (None, 2)):
        px = bytes((11 * i + 3) % 256 for i in range(w * h * ch))
        t = MM.encode_tiff_pixels(w, h, px, channels=ch, endian=endian,
                                  packbits=pb, rows_per_strip=rps)
        assert MM.decode_tiff(t) == (w, h, ch, px), (ch, endian, pb, rps)
        assert MM.decode_image(t) == (w, h, ch, px)
        assert MM.parse_tiff_header(t) == (w, h)

    # WhiteIsZero: photometric 0 inverts to the BlackIsZero convention
    px = bytes(range(35))
    t = bytearray(MM.encode_tiff_pixels(7, 5, px, channels=1))
    i = t.find((262).to_bytes(2, "little"))
    t[i + 8] = 0  # photometric interpretation -> WhiteIsZero
    got = MM.decode_tiff(bytes(t))
    assert got == (7, 5, 1, bytes(255 - v for v in px))

    assert MM.decode_tiff(b"notatiff") is None
    # header-only fixture lacks strip tags -> loud -> NULL downstream
    with _pytest.raises(ValueError, match="missing required tag"):
        MM.decode_tiff(MM.make_tiff(8, 8))
    # LZW IS in subset since round 8 — but splicing Compression=5 onto
    # UNCOMPRESSED strip data makes a malformed LZW stream and must
    # still fail loudly, not decode to garbage
    t2 = bytearray(MM.encode_tiff_pixels(7, 5, px, channels=1))
    j = t2.find((259).to_bytes(2, "little"))
    t2[j + 8] = 5
    with _pytest.raises(ValueError, match="LZW"):
        MM.decode_tiff(bytes(t2))


def test_packbits_codec_edges():
    from bigdata_jobmatching_spark.operators.multimodal import (
        packbits_decode, packbits_encode,
    )

    cases = [b"", b"\x00", b"aaaa", b"abcabc", b"a" * 300,
             bytes(range(256)), b"ab" + b"c" * 130 + b"de"]
    for c in cases:
        assert packbits_decode(packbits_encode(c), len(c)) == c
    # explicit noop byte (128) must be skipped
    assert packbits_decode(b"\x80\x00a", 1) == b"a"
