"""Multimodal binary-column plumbing: Arrow-batched mapInPandas
feature extraction (deterministic fake decoder) + frame-sampling."""

from __future__ import annotations

import hashlib

import pytest

from bigdata_jobmatching_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", "image/png", b"\x89PNG-fake-1", 64, 64, None),
        ("img2", "image", "image/png", b"\x89PNG-fake-2", 32, 32, None),
        ("aud1", "audio", "audio/wav", b"RIFF-fake", None, None, 4000),
        ("vid1", "video", "video/mp4", b"mp4-fake", 640, 480, 3500),
        ("nil1", "image", "image/png", None, None, None, None),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media):
    out = MM.extract_features(media, fake=True, dim=8)
    rows = {r.media_id: r for r in out.collect()}
    assert set(rows) == {"img1", "img2", "aud1", "vid1", "nil1"}
    r = rows["img1"]
    assert r.payload_bytes == len(b"\x89PNG-fake-1")
    assert r.payload_sha1 == hashlib.sha1(b"\x89PNG-fake-1").hexdigest()
    assert len(r.feature) == 8 and all(0.0 <= v <= 1.0 for v in r.feature)
    # null payload handled as empty bytes
    assert rows["nil1"].payload_bytes == 0
    # deterministic across runs
    again = {r.media_id: r.feature for r in MM.extract_features(media, fake=True, dim=8).collect()}
    assert again["img2"] == rows["img2"].feature


def test_real_decode_nulls_undecodable_payloads(spark, media):
    """fake=False is REAL since round 5 (stdlib-zlib PNG codec).
    Fake-signature payloads in this fixture aren't valid PNGs, so
    every row survives with a NULL feature — audit-don't-drop —
    while hashes/lengths still populate."""
    rows = {r.media_id: r for r in MM.extract_features(media, fake=False).collect()}
    assert set(rows) == {"img1", "img2", "aud1", "vid1", "nil1"}
    assert all(r.feature is None for r in rows.values())
    assert rows["img1"].payload_sha1 == hashlib.sha1(b"\x89PNG-fake-1").hexdigest()


def test_png_jpeg_header_parsers_pure_python():
    assert MM.parse_png_header(MM.make_png(640, 480)) == (640, 480)
    assert MM.parse_jpeg_header(MM.make_jpeg(1920, 1080)) == (1920, 1080)
    # JPEG parser must skip APP0 and find SOF0 even with extra markers
    jpeg = MM.make_jpeg(8, 8)
    assert MM.sniff_header(jpeg) == ("jpeg", 8, 8)
    assert MM.sniff_header(MM.make_png(1, 1)) == ("png", 1, 1)
    # truncated / garbage / empty payloads degrade to None, never raise
    assert MM.sniff_header(MM.make_png(9, 9)[:10]) == (None, None, None)
    assert MM.sniff_header(b"\xff\xd8\xff") == (None, None, None)
    assert MM.sniff_header(b"not an image") == (None, None, None)
    assert MM.sniff_header(None) == (None, None, None)
    assert MM.sniff_header(b"") == (None, None, None)


def test_sniff_image_dims_mapinpandas(spark):
    rows = [
        ("a", MM.make_png(300, 200)),
        ("b", MM.make_jpeg(64, 32)),
        ("c", b"garbage"),
        ("d", None),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r.media_id: r for r in MM.sniff_image_dims(df).collect()}
    assert (out["a"].hdr_format, out["a"].hdr_width, out["a"].hdr_height) == ("png", 300, 200)
    assert (out["b"].hdr_format, out["b"].hdr_width, out["b"].hdr_height) == ("jpeg", 64, 32)
    assert out["c"].hdr_format is None and out["d"].hdr_width is None
    # pass-through of the original columns
    assert out["a"].payload is not None


def test_frame_sampling(spark, media):
    frames = MM.sample_frames(media, every_ms=1000).collect()
    # vid1: 3500ms -> samples at 0,1000,2000,3000
    assert [f.frame_ts_ms for f in frames] == [0, 1000, 2000, 3000]
    assert all(f.media_id == "vid1" for f in frames)


def test_wav_mp4_header_parsers():
    # round-trip: synthesized containers parse back to planted values
    assert MM.parse_wav_header(MM.make_wav(2, 44100, 44100)) == (2, 44100, 1000)
    assert MM.parse_wav_header(MM.make_wav(1, 8000, 4000)) == (1, 8000, 500)
    assert MM.parse_mp4_header(MM.make_mp4(2500)) == 2500
    # malformed inputs must return None, never raise
    assert MM.parse_wav_header(b"RIFFxxxx") is None
    assert MM.parse_wav_header(b"RIFF\x00\x00\x00\x00WAVE") is None  # no fmt chunk
    assert MM.parse_mp4_header(b"\x00\x00\x00\x08ftyp") is None  # no moov
    assert MM.parse_mp4_header(b"junk") is None
    # a WAV is not an image and vice versa
    assert MM.sniff_header(MM.make_wav(1, 8000, 100)) == (None, None, None)
    assert MM.parse_wav_header(MM.make_png(10, 10)) is None


def test_sniff_media_meta_mixed(spark):
    rows = [
        ("img", MM.make_png(300, 200)),
        ("aud", MM.make_wav(2, 16000, 16000)),
        ("vid", MM.make_mp4(7300)),
        ("bad", b"not media"),
    ]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r.media_id: r for r in MM.sniff_media_meta(df).collect()}
    assert (out["img"].media_format, out["img"].hdr_width) == ("png", 300)
    assert (out["aud"].media_format, out["aud"].channels,
            out["aud"].sample_rate, out["aud"].duration_ms) == ("wav", 2, 16000, 1000)
    assert (out["vid"].media_format, out["vid"].duration_ms) == ("mp4", 7300)
    assert out["bad"].media_format is None


def test_mp4_mvhd_version1_and_unknown():
    # ADVICE r3: a version-1 mvhd (64-bit ctime/mtime) must parse via
    # the shifted offsets, not read creation-time bytes as duration;
    # unknown versions return None instead of garbage.
    from bigdata_jobmatching_spark.operators import multimodal as MM

    assert MM.parse_mp4_header(MM.make_mp4(4500, version=0)) == 4500
    assert MM.parse_mp4_header(MM.make_mp4(4500, version=1)) == 4500
    assert MM.parse_mp4_header(MM.make_mp4(7, timescale=90000, version=1)) == 7

    b = bytearray(MM.make_mp4(4500))
    b[b.index(b"mvhd") + 4] = 2  # unsupported version
    assert MM.parse_mp4_header(bytes(b)) is None


def test_gif_webp_header_parsers():
    from bigdata_jobmatching_spark.operators import multimodal as MM

    assert MM.parse_gif_header(MM.make_gif(320, 200)) == (320, 200)
    assert MM.parse_webp_header(MM.make_webp(1024, 768)) == (1024, 768)
    # VP8L variant: 0x2F signature + packed 14-bit minus-one dims
    bits = (99 - 1) | ((44 - 1) << 14)
    vp8l = (b"RIFF" + (13).to_bytes(4, "little") + b"WEBP"
            + b"VP8L" + (5).to_bytes(4, "little")
            + b"\x2f" + bits.to_bytes(4, "little"))
    assert MM.parse_webp_header(vp8l) == (99, 44)
    # sniff_header routes all four image formats
    assert MM.sniff_header(MM.make_gif(7, 9)) == ("gif", 7, 9)
    assert MM.sniff_header(MM.make_webp(7, 9)) == ("webp", 7, 9)
    assert MM.sniff_header(MM.make_png(7, 9))[0] == "png"
    assert MM.sniff_header(b"GIF12a junk") == (None, None, None)
    assert MM.parse_webp_header(b"RIFF\x00\x00\x00\x00WEBPABCD") is None


def test_resize_box_integer_exact():
    from bigdata_jobmatching_spark.operators.multimodal import resize_box

    assert resize_box(512, 256, 64) == (64, 32)
    assert resize_box(256, 512, 64) == (32, 64)
    assert resize_box(40, 30, 64) == (40, 30)      # under cap: untouched
    assert resize_box(64, 64, 64) == (64, 64)
    assert resize_box(1000, 3, 64) == (64, 1)      # floor never hits 0
    assert resize_box(3, 1000, 64) == (1, 64)


def test_resize_images_round_trip_and_passthrough(spark):
    from bigdata_jobmatching_spark.operators import multimodal as MM

    rows = [
        (0, MM.make_png(512, 256)),
        (1, MM.make_jpeg(100, 40)),
        (2, MM.make_png(10, 20)),       # under cap
        (3, b"not an image"),           # audit-don't-drop: NULLs
        (4, None),
    ]
    df = spark.createDataFrame(rows, "p_partkey long, payload binary")
    out = {r["p_partkey"]: r for r in MM.resize_images(df, max_side=64).collect()}
    assert (out[0]["rs_width"], out[0]["rs_height"], out[0]["rs_format"]) == (64, 32, "png")
    assert (out[1]["rs_width"], out[1]["rs_height"], out[1]["rs_format"]) == (64, 25, "jpeg")
    assert (out[2]["rs_width"], out[2]["rs_height"]) == (10, 20)
    assert out[3]["resized"] is None and out[3]["rs_format"] is None
    assert out[4]["resized"] is None
    # the emitted container genuinely carries the computed box
    for k, fmt in ((0, "png"), (1, "jpeg"), (2, "png")):
        b = bytes(out[k]["resized"])
        parsed = (
            MM.parse_png_header(b) if fmt == "png" else MM.parse_jpeg_header(b)
        )
        assert parsed == (out[k]["rs_width"], out[k]["rs_height"])


def test_resize_images_real_path_header_only_png_nulls(spark):
    """fake=False is REAL since round 5, and strict: make_png(8,8) is
    a header-only fixture with NO IDAT, so the real decoder returns
    None and the row survives with NULLs instead of fabricating
    pixels. (The pixel-exact happy path lives in
    test_round5_queries.test_resize_images_real_path_pixels.)"""
    from bigdata_jobmatching_spark.operators import multimodal as MM

    df = spark.createDataFrame([(0, MM.make_png(8, 8))], "p_partkey long, payload binary")
    row = MM.resize_images(df, fake=False).collect()[0]
    assert row["resized"] is None and row["rs_format"] is None
