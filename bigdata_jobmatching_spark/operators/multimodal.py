"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

PNG pixel decode is REAL (round-5): a complete 8-bit codec on stdlib
zlib + numpy (`decode_png` / `encode_png` / `resample_nearest`, all
five scanline filters, four color types) backs `decode_image_batch`,
`extract_features(fake=False)` and `resize_images(fake=False)`.
GIF pixel decode is REAL too (round-6): a pure-Python variable-width
LZW decoder + palette expansion (`decode_gif` / `encode_gif`), and so
is baseline JPEG (round-6, `jpeg_codec.py`: Huffman + dequant + IDCT
+ YCbCr, restart markers); `decode_image` dispatches PNG/GIF/JPEG for
format-agnostic callers. Audio SAMPLES are real too (round-6):
16-bit PCM needs no codec, so `decode_wav_samples` /
`wav_sample_stats` extract exact integer energy/peak/zero-crossing
features from WAV data chunks. Remaining formats whose decode needs
codec libs this container lacks (compressed audio,
video frames) keep their rows with NULL outputs — audit-don't-drop —
and the `fake=True` paths remain for deterministic plumbing tests.

Scale design: binary payloads ride the scan partition; mapInPandas
streams Arrow batches through Python without materializing the whole
partition; feature outputs are small typed columns so everything
downstream is ordinary columnar Spark.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("modality", T.StringType()),       # image|audio|video
    T.StructField("mime_type", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("modality", T.StringType()),
    T.StructField("payload_bytes", T.LongType()),
    T.StructField("payload_sha1", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+encoder: sha1-seeded
    floats in [0,1). Stable across runs and processes."""
    h = hashlib.sha1(payload or b"").digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def _real_image_feature(payload: bytes) -> list[float] | None:
    """8-dim feature from REAL decoded pixels (PNG, GIF or baseline
    JPEG via :func:`decode_image`): per-channel mean and max, each
    /255, channel slots padded with 0.0 up to 4. Returns None for
    payloads none of the codecs can decode — audit-don't-drop, the
    row survives with a NULL feature."""
    import numpy as np

    try:
        d = decode_image(payload)
    except ValueError:
        return None
    if d is None:
        return None
    w, h, c, px = d
    a = np.frombuffer(px, dtype=np.uint8).reshape(h * w, c)
    means = [float(a[:, i].mean()) / 255.0 for i in range(c)] + [0.0] * (4 - c)
    maxes = [float(a[:, i].max()) / 255.0 for i in range(c)] + [0.0] * (4 - c)
    return means + maxes


def extract_features(df: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """media rows -> feature rows via mapInPandas (Arrow batches).

    With ``fake=False`` the feature comes from a REAL pixel decode
    (PNG/GIF/baseline-JPEG via :func:`decode_image`): per-channel
    mean+max over the decoded pixels — a fixed 8-wide vector
    (4 channel means + 4 channel maxes), so ``dim`` must be 8 on that
    path (raises otherwise rather than silently ignoring it).
    Payloads outside the codecs' reach (audio,
    video) keep their row with a NULL feature.
    """
    if not fake and dim != 8:
        raise ValueError(
            f"fake=False produces a fixed 8-wide channel feature; got dim={dim}"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"].apply(lambda b: bytes(b) if b is not None else b"")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "payload_bytes": payloads.str.len().astype("int64"),
                "payload_sha1": payloads.apply(lambda b: hashlib.sha1(b).hexdigest()),
                "feature": payloads.apply(
                    (lambda b: _fake_feature(b, dim)) if fake else _real_image_feature
                ),
            })

    return df.mapInPandas(batches, FEATURE_SCHEMA)


# ----------------------------------------------------- header sniffing --
# One REAL modality with zero codec dependencies: container-header
# metadata (format, width, height) parsed from the leading bytes of
# the payload in pure Python. This is the part of image decode that
# needs no pixel codec — PNG stores dims in the IHDR chunk, JPEG in
# its SOFn frame header.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0..SOF15 minus DHT/JPG/DAC


def parse_png_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the IHDR chunk, or None if not a PNG.

    Layout: 8-byte signature, 4-byte chunk length, b'IHDR', then
    width/height as 4-byte big-endian ints.
    """
    if len(b) < 24 or not b.startswith(_PNG_SIG) or b[12:16] != b"IHDR":
        return None
    return (
        int.from_bytes(b[16:20], "big"),
        int.from_bytes(b[20:24], "big"),
    )


def parse_jpeg_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOFn marker, or None.

    Walks the marker stream: each segment is 0xFF, marker byte, 2-byte
    big-endian length (inclusive of itself). SOFn payload is
    [precision:1][height:2][width:2].
    """
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:  # SOI
        return None
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: no length
            i += 2
            continue
        if marker == 0xD9:  # EOI
            return None
        seg_len = int.from_bytes(b[i + 2:i + 4], "big")
        if seg_len < 2:
            return None
        if marker in _JPEG_SOF_MARKERS:
            if i + 9 > len(b):
                return None
            height = int.from_bytes(b[i + 5:i + 7], "big")
            width = int.from_bytes(b[i + 7:i + 9], "big")
            return (width, height)
        i += 2 + seg_len
    return None


def parse_gif_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the GIF logical screen descriptor, or None.

    Layout: 'GIF87a'/'GIF89a' signature, then canvas width/height as
    2-byte little-endian ints."""
    if len(b) < 10 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    return (
        int.from_bytes(b[6:8], "little"),
        int.from_bytes(b[8:10], "little"),
    )


def parse_webp_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a WebP container, or None.

    RIFF....WEBP, then the first chunk: VP8X carries the canvas size
    as 24-bit little-endian minus-one at payload bytes 4-9; VP8L packs
    14-bit minus-one fields after a 0x2F signature byte."""
    if len(b) < 20 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        return None
    ctype = b[12:16]
    if ctype == b"VP8X":
        if len(b) < 30:
            return None
        w = int.from_bytes(b[24:27], "little") + 1
        h = int.from_bytes(b[27:30], "little") + 1
        return (w, h)
    if ctype == b"VP8L":
        if len(b) < 25 or b[20] != 0x2F:
            return None
        bits = int.from_bytes(b[21:25], "little")
        return ((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
    return None


def parse_tiff_header(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a baseline TIFF IFD, or None.

    Layout: 'II*\0' (little-endian) or 'MM\0*' (big-endian), 4-byte
    offset to the first IFD; the IFD is a 2-byte entry count then
    12-byte entries (tag, type, count, value/offset). Width is tag
    256, height tag 257; SHORT(3) and LONG(4) inline values are read
    per the byte order. Malformed structures return None — offsets
    and entry counts are bounds-checked against the payload."""
    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        endian = "little"
    elif b[:4] == b"MM\x00*":
        endian = "big"
    else:
        return None
    ifd = int.from_bytes(b[4:8], endian)
    if ifd + 2 > len(b):
        return None
    n = int.from_bytes(b[ifd:ifd + 2], endian)
    width = height = None
    for k in range(n):
        e = ifd + 2 + 12 * k
        if e + 12 > len(b):
            return None
        tag = int.from_bytes(b[e:e + 2], endian)
        typ = int.from_bytes(b[e + 2:e + 4], endian)
        if tag in (256, 257) and typ in (3, 4):
            # inline value: SHORT uses the first 2 bytes of the value
            # field (endian-dependent position is handled by reading
            # the 4-byte field and masking for SHORT)
            # inline values are left-justified in the 4-byte field for
            # both byte orders: SHORT reads the first 2 bytes
            val4 = b[e + 8:e + 12]
            v = int.from_bytes(val4 if typ == 4 else val4[:2], endian)
            if tag == 256:
                width = v
            else:
                height = v
    if width is None or height is None:
        return None
    return (width, height)


def make_tiff(width: int, height: int, endian: str = "little") -> bytes:
    """Minimal single-IFD TIFF with width/height SHORT entries."""
    e = endian
    sig = b"II*\x00" if e == "little" else b"MM\x00*"

    def u(v: int, n: int) -> bytes:
        return v.to_bytes(n, e)

    ifd_off = 8
    entries = b""
    for tag, v in ((256, width), (257, height)):
        entries += u(tag, 2) + u(3, 2) + u(1, 4) + u(v, 2) + u(0, 2)
    ifd = u(2, 2) + entries + u(0, 4)
    return sig + u(ifd_off, 4) + ifd


def make_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a header + logical screen descriptor."""
    return (
        b"GIF89a"
        + width.to_bytes(2, "little") + height.to_bytes(2, "little")
        + b"\x00\x00\x00"  # flags, bg index, aspect
    )


def make_webp(width: int, height: int) -> bytes:
    """Minimal RIFF/WEBP container with a VP8X chunk carrying the
    canvas size (payload only — enough for the header parser)."""
    payload = (
        b"\x00\x00\x00\x00"  # VP8X flags + reserved
        + (width - 1).to_bytes(3, "little")
        + (height - 1).to_bytes(3, "little")
    )
    chunk = b"VP8X" + len(payload).to_bytes(4, "little") + payload
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def sniff_header(b: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) for PNG/JPEG/GIF/WebP payloads,
    (None,)*3 else."""
    if not b:
        return (None, None, None)
    for fmt, parse in (
        ("png", parse_png_header),
        ("jpeg", parse_jpeg_header),
        ("gif", parse_gif_header),
        ("webp", parse_webp_header),
        ("tiff", parse_tiff_header),
    ):
        dims = parse(b)
        if dims is not None:
            return (fmt, dims[0], dims[1])
    return (None, None, None)


def make_png(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG header (signature + IHDR) for
    fixtures — the sniffer reads dims, no pixel data needed."""
    ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    return _PNG_SIG + len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr + b"\x00" * 4


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + APP0(JFIF) + SOF0 carrying the dims."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0_payload = b"\x08" + height.to_bytes(2, "big") + width.to_bytes(2, "big") + b"\x01\x01\x11\x00"
    sof0 = b"\xff\xc0" + (len(sof0_payload) + 2).to_bytes(2, "big") + sof0_payload
    return b"\xff\xd8" + app0 + sof0


def sniff_image_dims(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append (hdr_format, hdr_width, hdr_height) parsed from the payload's
    container header — mapInPandas over Arrow batches, pure Python,
    no codec libs. All other columns pass through.

    Scale: payload bytes never shuffle (narrow transformation on the
    scan partitioning); the appended metadata is three small columns.
    """
    schema = T.StructType(
        [f for f in df.schema.fields]
        + [
            T.StructField("hdr_format", T.StringType()),
            T.StructField("hdr_width", T.IntegerType()),
            T.StructField("hdr_height", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sniffed = pdf[payload_col].apply(
                lambda b: sniff_header(bytes(b) if b is not None else None)
            )
            out = pdf.copy()
            out["hdr_format"] = sniffed.str[0]
            out["hdr_width"] = sniffed.str[1].astype("Int32")
            out["hdr_height"] = sniffed.str[2].astype("Int32")
            yield out

    return df.mapInPandas(batches, schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (native explode over a sequence — the decode of each
    frame would live in extract_features). Demonstrates the
    fan-out-then-process shape without touching codec libs."""
    return (
        df.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "mime_type", "frame_ts_ms")
    )


# ------------------------------------------------ audio/video headers --
# Same zero-codec principle for the other two modalities: WAV stores
# stream parameters in the RIFF fmt chunk; MP4 stores timescale and
# duration in the mvhd box. Parsing these is real metadata extraction
# — only SAMPLE decode needs codec libs.


def parse_wav_header(b: bytes) -> tuple[int, int, int] | None:
    """(channels, sample_rate, duration_ms) from RIFF/WAVE headers, or
    None. Walks chunks: 'fmt ' carries channels/rate/byte-rate, 'data'
    carries the payload size that determines duration."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = int.from_bytes(b[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            channels = int.from_bytes(b[i + 10:i + 12], "little")
            rate = int.from_bytes(b[i + 12:i + 16], "little")
            byte_rate = int.from_bytes(b[i + 16:i + 20], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or rate is None or not byte_rate:
        return None
    dur_ms = (data_size * 1000) // byte_rate if data_size is not None else 0
    return (channels, rate, dur_ms)


def parse_mp4_header(b: bytes) -> int | None:
    """duration_ms from the mvhd box (inside moov), or None.

    Walks top-level boxes; mvhd version 0 carries 32-bit timescale and
    duration after 32-bit ctime/mtime, version 1 shifts them past
    64-bit ctime/mtime (timescale at +28, 64-bit duration at +32).
    Other versions return None rather than reading garbage offsets."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    i = 0
    while i + 8 <= len(b):
        size = int.from_bytes(b[i:i + 4], "big")
        btype = b[i + 4:i + 8]
        if size < 8:
            return None
        if btype == b"moov":
            j = i + 8
            end = min(i + size, len(b))
            while j + 8 <= end:
                csize = int.from_bytes(b[j:j + 4], "big")
                ctype = b[j + 4:j + 8]
                if csize < 8:
                    return None
                if ctype == b"mvhd" and j + 9 <= len(b):
                    version = b[j + 8]
                    if version == 0 and j + 28 <= len(b):
                        timescale = int.from_bytes(b[j + 20:j + 24], "big")
                        duration = int.from_bytes(b[j + 24:j + 28], "big")
                    elif version == 1 and j + 40 <= len(b):
                        timescale = int.from_bytes(b[j + 28:j + 32], "big")
                        duration = int.from_bytes(b[j + 32:j + 40], "big")
                    else:
                        return None
                    if not timescale:
                        return None
                    return (duration * 1000) // timescale
                j += csize
            return None
        i += size
    return None


def make_mp4_tracked(
    duration_ms: int,
    tracks: list[tuple[bytes, list[int]]],
    timescale: int = 1000,
) -> bytes:
    """Structurally-real MP4: ftyp + moov{mvhd, per-track
    trak{tkhd, mdia{hdlr(handler), minf{stbl{stsz(sample sizes)}}}}}.
    ``tracks`` is [(handler_type e.g. b'vide'/b'soun', [sample
    sizes]), ...]. Every box length is correct, so a spec-compliant
    walker recovers the exact per-track sample counts/bytes — the
    payload-free skeleton a video catalog's metadata pass sees
    (round-7; sample DATA stays absent by design, decode is
    codec-bound)."""
    def box(btype: bytes, payload: bytes) -> bytes:
        return (8 + len(payload)).to_bytes(4, "big") + btype + payload

    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    duration = (duration_ms * timescale) // 1000
    mvhd = box(b"mvhd", bytes(4) + bytes(8)
               + timescale.to_bytes(4, "big")
               + duration.to_bytes(4, "big") + bytes(80))
    traks = b""
    for tid, (handler, sizes) in enumerate(tracks, start=1):
        if len(handler) != 4:
            raise ValueError(f"handler must be 4 bytes, got {handler!r}")
        tkhd = box(b"tkhd", bytes(4) + bytes(8)
                   + tid.to_bytes(4, "big") + bytes(72))
        hdlr = box(b"hdlr", bytes(8) + handler + bytes(13))
        stsz = box(b"stsz", bytes(4) + (0).to_bytes(4, "big")
                   + len(sizes).to_bytes(4, "big")
                   + b"".join(s.to_bytes(4, "big") for s in sizes))
        stbl = box(b"stbl", stsz)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        traks += box(b"trak", tkhd + mdia)
    return ftyp + box(b"moov", mvhd + traks)


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def mp4_track_census(
    b: bytes,
) -> tuple[int, int, int, int, int, int] | None:
    """(duration_ms, n_tracks, n_video, n_audio, total_samples,
    total_sample_bytes) for an MP4/ISO-BMFF stream, or None for
    non-MP4s. A pure box-tree WALK (recursing only into the five
    container types that lead to track metadata): stsz sample tables
    are summed, sample DATA is never touched — O(metadata bytes)
    regardless of media size, the catalog pass shape. Truncated or
    malformed boxes raise ValueError (loud subset)."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    duration_ms = parse_mp4_header(b)
    if duration_ms is None:
        raise ValueError("MP4 missing mvhd duration")
    stats = {"trak": 0, "vide": 0, "soun": 0, "n": 0, "bytes": 0}

    def walk(lo: int, hi: int) -> None:
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(b[i:i + 4], "big")
            btype = b[i + 4:i + 8]
            if size < 8 or i + size > hi:
                raise ValueError(f"bad MP4 box {btype!r} size {size}")
            if btype == b"trak":
                stats["trak"] += 1
            if btype in _MP4_CONTAINERS:
                walk(i + 8, i + size)
            elif btype == b"hdlr":
                if i + 20 > hi:
                    raise ValueError("truncated hdlr")
                h = b[i + 16:i + 20]
                if h == b"vide":
                    stats["vide"] += 1
                elif h == b"soun":
                    stats["soun"] += 1
            elif btype == b"stsz":
                if i + 20 > hi:
                    raise ValueError("truncated stsz")
                fixed = int.from_bytes(b[i + 12:i + 16], "big")
                n = int.from_bytes(b[i + 16:i + 20], "big")
                stats["n"] += n
                if fixed:
                    stats["bytes"] += fixed * n
                else:
                    if i + 20 + 4 * n > hi:
                        raise ValueError("truncated stsz table")
                    stats["bytes"] += sum(
                        int.from_bytes(b[i + 20 + 4 * k:i + 24 + 4 * k], "big")
                        for k in range(n)
                    )
            i += size

    walk(0, len(b))
    return (duration_ms, stats["trak"], stats["vide"], stats["soun"],
            stats["n"], stats["bytes"])


def make_wav(channels: int, sample_rate: int, n_samples: int) -> bytes:
    """Structurally-valid WAV header (fmt + data chunk header, 16-bit
    PCM) with a declared-but-absent data payload — enough for the
    header parser, no samples needed."""
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    data_size = n_samples * block_align
    body = b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt + b"data" + data_size.to_bytes(4, "little")
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + body


def make_mp4(duration_ms: int, timescale: int = 1000, version: int = 0) -> bytes:
    """Minimal ftyp + moov(mvhd v0 or v1) carrying the duration."""
    if version not in (0, 1):
        raise ValueError(f"mvhd version must be 0 or 1, got {version}")
    ftyp = b"ftyp" + b"isom" + (0).to_bytes(4, "big") + b"isomiso2"
    ftyp_box = (8 + len(ftyp) - 4).to_bytes(4, "big") + ftyp
    duration = (duration_ms * timescale) // 1000
    tw = 4 if version == 0 else 8  # ctime/mtime width; duration width
    mvhd_payload = (
        bytes([version]) + b"\x00\x00\x00"  # version+flags
        + (0).to_bytes(tw, "big") * 2        # ctime/mtime
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(tw, "big")
        + b"\x00" * 80
    )
    mvhd = (8 + len(mvhd_payload)).to_bytes(4, "big") + b"mvhd" + mvhd_payload
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    return ftyp_box + moov


def sniff_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append (media_format, channels, sample_rate, duration_ms, width,
    height) from container headers across all three modalities —
    PNG/JPEG dims, WAV stream params, MP4 duration. One Arrow pass,
    pure Python, payloads never shuffle."""
    schema = T.StructType(
        [f for f in df.schema.fields]
        + [
            T.StructField("media_format", T.StringType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
            T.StructField("hdr_width", T.IntegerType()),
            T.StructField("hdr_height", T.IntegerType()),
        ]
    )

    def sniff_one(raw) -> tuple:
        b = bytes(raw) if raw is not None else None
        if not b:
            return (None, None, None, None, None, None)
        img = sniff_header(b)
        if img[0] is not None:
            return (img[0], None, None, None, img[1], img[2])
        wav = parse_wav_header(b)
        if wav is not None:
            return ("wav", wav[0], wav[1], wav[2], None, None)
        mp4 = parse_mp4_header(b)
        if mp4 is not None:
            return ("mp4", None, None, mp4, None, None)
        return (None, None, None, None, None, None)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            sniffed = pdf[payload_col].apply(sniff_one)
            out = pdf.copy()
            out["media_format"] = sniffed.str[0]
            out["channels"] = sniffed.str[1].astype("Int32")
            out["sample_rate"] = sniffed.str[2].astype("Int32")
            out["duration_ms"] = sniffed.str[3].astype("Int64")
            out["hdr_width"] = sniffed.str[4].astype("Int32")
            out["hdr_height"] = sniffed.str[5].astype("Int32")
            yield out

    return df.mapInPandas(batches, schema)


# ------------------------------------------------------------- resize --
# The resize stage of an image-ingest pipeline. The Spark plumbing is
# fully real: header dims are parsed from the input payload
# (parse_png_header / parse_jpeg_header), the target box is exact
# integer arithmetic (longest side capped at max_side, aspect ratio
# preserved with floor division), and the emitted payload is a valid
# container of the target size whose header re-parses to exactly the
# computed box. With fake=False the PNG path is end-to-end REAL:
# decode_png inflates the pixels, resample_nearest picks them, and
# encode_png emits a CRC-correct PNG of the target box (JPEG pixels
# stay NULL — entropy decode needs libs this container lacks). With
# fake=True the output carries synthesized pixels in a genuine
# PNG/JPEG container (plumbing-only path).

RESIZE_SCHEMA = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("resized", T.BinaryType()),
    T.StructField("rs_format", T.StringType()),
    T.StructField("rs_width", T.IntegerType()),
    T.StructField("rs_height", T.IntegerType()),
])


def resize_box(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Integer-exact aspect-preserving target box: longest side capped
    at max_side, other side floor-scaled, never below 1. Pure int64 —
    reproducible by any SQL engine."""
    if max(w, h) <= max_side:
        return w, h
    if w >= h:
        return max_side, max(1, (h * max_side) // w)
    return max(1, (w * max_side) // h), max_side


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "p_partkey",
    max_side: int = 64,
    fake: bool = True,
) -> DataFrame:
    """(id, payload) -> (id, resized, rs_format, rs_width, rs_height).

    Non-image payloads (header sniff fails) pass through with NULL
    resized/format/dims — the audit-don't-drop discipline of the rest
    of the pipeline. One Arrow pass; payloads never shuffle.
    """
    def one(raw) -> tuple:
        b = bytes(raw) if raw is not None else b""
        if not fake:
            # REAL path: decode pixels via decode_image — PNG
            # (stdlib zlib codec, incl. palette), GIF (pure-Python
            # LZW), baseline TIFF (strip/PackBits) or baseline JPEG
            # (jpeg_codec.py) — nearest-neighbor resample, re-encode
            # a real PNG of the target box: every input format is
            # transcoded to a PNG thumbnail, the normalize-to-one-
            # format discipline of a real media pipeline.
            # Out-of-subset/corrupt payloads yield NULLs
            # (audit-don't-drop).
            try:
                d = decode_image(b)
            except ValueError:
                d = None
            if d is None:
                return None, None, None, None
            w, h, ch, px = d
            tw, th = resize_box(w, h, max_side)
            rs = resample_nearest(px, w, h, ch, tw, th)
            return encode_png(tw, th, rs, channels=ch), "png", tw, th
        wh = parse_png_header(b)
        if wh is not None:
            tw, th = resize_box(wh[0], wh[1], max_side)
            return make_png(tw, th), "png", tw, th
        wh = parse_jpeg_header(b)
        if wh is not None:
            tw, th = resize_box(wh[0], wh[1], max_side)
            return make_jpeg(tw, th), "jpeg", tw, th
        return None, None, None, None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [one(b) for b in pdf[payload_col]]
            yield pd.DataFrame({
                "p_partkey": pdf[id_col],
                "resized": [o[0] for o in out],
                "rs_format": [o[1] for o in out],
                "rs_width": pd.array([o[2] for o in out], dtype="Int32"),
                "rs_height": pd.array([o[3] for o in out], dtype="Int32"),
            })

    return df.mapInPandas(batches, RESIZE_SCHEMA)


def parse_wav_stream_info(b: bytes) -> tuple[int, int, int] | None:
    """(channels, sample_rate, n_samples) from RIFF/WAVE headers, or
    None. Same chunk walk as :func:`parse_wav_header`, but exposes the
    EXACT sample count (data_size // block_align) that frame/window
    planning needs — duration_ms floors away sub-millisecond samples."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = block_align = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = int.from_bytes(b[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            channels = int.from_bytes(b[i + 10:i + 12], "little")
            rate = int.from_bytes(b[i + 12:i + 16], "little")
            block_align = int.from_bytes(b[i + 20:i + 22], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    if channels is None or rate is None or not block_align or data_size is None:
        return None
    return (channels, rate, data_size // block_align)


def wav_frame_plan(df: DataFrame, window: int, hop: int, payload_col: str = "payload") -> DataFrame:
    """STFT/feature-frame planning over WAV payloads: parse the stream
    info in one Arrow pass, then compute frame counts with EXACT
    integer column arithmetic JVM-side.

    Appends (channels, sample_rate, n_samples, n_frames,
    n_frames_padded): n_frames is the strict count of full windows
    ((n - window) div hop + 1, 0 when n < window); n_frames_padded is
    the pad-to-cover count (ceil(n / hop)). Non-WAV / unparseable
    payloads yield NULLs. Scale: payloads never shuffle; the
    arithmetic stays in whole-stage codegen."""
    schema = T.StructType(
        [f for f in df.schema.fields]
        + [
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            info = pdf[payload_col].apply(
                lambda raw: parse_wav_stream_info(bytes(raw)) if raw is not None else None
            )
            out = pdf.copy()
            out["channels"] = info.apply(lambda t: t[0] if t else None).astype("Int32")
            out["sample_rate"] = info.apply(lambda t: t[1] if t else None).astype("Int32")
            out["n_samples"] = info.apply(lambda t: t[2] if t else None).astype("Int64")
            yield out

    parsed = df.mapInPandas(batches, schema)
    n = F.col("n_samples")
    return parsed.withColumn(
        "n_frames",
        F.when(n.isNull(), None)
        .when(n < window, F.lit(0).cast("long"))
        .otherwise(F.expr(f"(n_samples - {window}) div {hop} + 1")),
    ).withColumn(
        "n_frames_padded",
        F.when(n.isNull(), None).otherwise(
            F.expr(f"(n_samples + {hop} - 1) div {hop}")
        ),
    )


# ------------------------------------------------------ real PNG codec --
# De-stubbed pixel decode (round-5): a complete 8-bit PNG codec on
# nothing but stdlib zlib + numpy — no PIL. Covers color types
# 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), all five scanline
# filters (None/Sub/Up/Average/Paeth), non-interlaced. The encoder
# emits real CRC-correct chunks and can filter each scanline
# differently, so round-trip tests exercise every decode branch.
#
# Scale shape: the codec runs inside Arrow-batched mapInPandas — the
# per-image cost is the codec's own, the Spark side never shuffles
# payloads, and outputs are small typed columns. The per-byte
# un-filter loop is pure Python per SCANLINE with numpy row math
# where the filter allows (None/Up are fully vectorized; Sub/Avg/
# Paeth carry a left-neighbor recurrence that is sequential by
# definition).

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib as _z

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + _z.crc32(ctype + data).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 pass grid: (x_start, y_start, x_step, y_step). Each pass is an
# independent filtered sub-image (prev-line state resets per pass);
# passes whose sub-image is empty for the given dimensions contribute
# zero bytes to the stream, per spec.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _filter_image(
    pixels: bytes, width: int, height: int, channels: int,
    filter_type: int | None, sample_bytes: int = 1,
) -> bytearray:
    """Forward scanline-filter pass over one (sub-)image: each output
    line is a filter-type byte plus the filtered samples. ``None``
    cycles y % 5 so one image exercises every branch. Per spec the
    filters are BYTEWISE with a left-neighbor offset of
    bpp = channels * sample_bytes — passing sample_bytes=2 is the
    complete 16-bit-depth filter (round-7)."""
    bpp = channels * sample_bytes
    stride = width * bpp
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        line = pixels[y * stride:(y + 1) * stride]
        ft = (y % 5) if filter_type is None else filter_type
        raw.append(ft)
        if ft == 0:
            raw += line
        elif ft == 1:
            raw += bytes(
                (line[i] - (line[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif ft == 2:
            raw += bytes((line[i] - prev[i]) & 0xFF for i in range(stride))
        elif ft == 3:
            raw += bytes(
                (line[i] - ((line[i - bpp] if i >= bpp else 0) + prev[i]) // 2) & 0xFF
                for i in range(stride)
            )
        elif ft == 4:
            raw += bytes(
                (line[i] - _paeth(
                    line[i - bpp] if i >= bpp else 0,
                    prev[i],
                    prev[i - bpp] if i >= bpp else 0,
                )) & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"bad filter type {ft}")
        prev = line
    return raw


def _unfilter_image(
    raw: bytes, width: int, height: int, channels: int,
    sample_bytes: int = 1,
) -> bytearray:
    """Inverse of :func:`_filter_image` over one (sub-)image: per
    spec, filters reconstruct against OUTPUT bytes of the previous
    line of the SAME pass, with the same bpp left-offset."""
    bpp = channels * sample_bytes
    stride = width * bpp
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel stream length mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 0:
            pass
        elif ft == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y * stride:(y + 1) * stride] = line
        prev = bytes(line)
    return out


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    filter_type: int | None = 0,
    palette: bytes | None = None,
    interlace: bool = False,
    bit_depth: int = 8,
    trans: bytes | None = None,
) -> bytes:
    """Real PNG from raw pixel bytes (row-major, interleaved).
    ``bit_depth`` 8 (default), 16 — 16-bit samples are BIG-ENDIAN
    per spec, and the scanline filters run bytewise with the wider
    bpp offset (round-7) — or 1/2/4 (round-8): sub-byte samples
    arrive UNPACKED (one byte per pixel, values < 2^depth, channels
    must be 1), are packed MSB-first per scanline with zero-padded
    row tails, and the filters run over the PACKED bytes with bpp=1
    per spec; composes with ``palette`` (and palette ``trans``) when
    the entry count fits the depth. Byte-wide palette requires
    depth 8.

    ``filter_type`` fixes one filter for every scanline; None cycles
    y % 5 so a single image exercises every decoder branch. The
    output opens in any compliant viewer — signature, IHDR, one
    zlib IDAT, CRCs on every chunk.

    With ``palette`` (concatenated RGB triples, <= 256 entries) the
    image is written as color type 3: ``pixels`` are 1-byte palette
    indices (``channels`` must be 1) and a PLTE chunk follows IHDR —
    the scanline filters apply to the index bytes exactly as they
    would to grayscale samples (round-7, palette-PNG support).

    With ``interlace`` (round-7, Adam7) the stream is the
    concatenation of the 7 filtered pass sub-images (filter state
    resets per pass; empty passes emit nothing). Composes with
    ``palette`` — passes are extracted from the index plane.

    With ``trans`` (round-8, tRNS transparency — PNG spec 11.3.2.1):
    a per-palette-entry alpha table, at most one byte per PLTE entry;
    entries beyond the table are fully opaque per spec. Requires
    ``palette`` — the gray/truecolor single-transparent-color forms
    are out of subset and rejected here and in the decoder.
    """
    import numpy as np
    import zlib as _z

    if bit_depth in (1, 2, 4):
        # Round-8: sub-byte depths (spec: legal only for color types 0
        # and 3). ``pixels`` arrive UNPACKED (one sample byte per
        # pixel, values < 2^depth) and are packed MSB-first per
        # scanline, partial trailing byte zero-padded; the filters
        # then run bytewise over the PACKED bytes with bpp=1 per spec.
        # Round-9: composes with Adam7 — each pass repacks ITS OWN
        # rows to its own packed stride (pass-row tails re-pad).
        if channels != 1:
            raise ValueError("sub-byte depth requires 1 sample per pixel")
        if len(pixels) != width * height:
            raise ValueError(
                f"need {width * height} unpacked sample bytes, "
                f"got {len(pixels)}"
            )
        max_v = (1 << bit_depth) - 1
        if palette is not None:
            if len(palette) % 3 != 0 or not 3 <= len(palette) <= 768:
                raise ValueError(f"bad PLTE length {len(palette)}")
            if len(palette) // 3 > (1 << bit_depth):
                raise ValueError(
                    f"{len(palette) // 3} palette entries do not fit "
                    f"depth {bit_depth}"
                )
            color_type = 3
        else:
            color_type = 0
        if trans is not None:
            if palette is None:
                raise ValueError(
                    "trans requires a palette (gray/truecolor tRNS is "
                    "out of subset)"
                )
            if not 1 <= len(trans) <= len(palette) // 3:
                raise ValueError(
                    f"bad tRNS length {len(trans)} for "
                    f"{len(palette) // 3}-entry palette"
                )
        a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
        if int(a.max(initial=0)) > max_v:
            raise ValueError(
                f"sample {int(a.max())} does not fit depth {bit_depth}"
            )

        def pack_rows(arr) -> tuple[bytes, int]:
            # MSB-first packing: explode each sample to its bits, pad
            # the row tail to a byte boundary, repack
            ph, pw = arr.shape
            bits = (
                (arr[:, :, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
            ).reshape(ph, pw * bit_depth).astype(np.uint8)
            pstride = (pw * bit_depth + 7) // 8
            pad = pstride * 8 - pw * bit_depth
            if pad:
                bits = np.pad(bits, ((0, 0), (0, pad)))
            return np.packbits(bits, axis=1).tobytes(), pstride

        if interlace:
            raw = bytearray()
            for xs, ys, xstep, ystep in _ADAM7:
                sub = a[ys::ystep, xs::xstep]
                ph, pw = sub.shape
                if ph == 0 or pw == 0:
                    continue
                packed_b, pstride = pack_rows(sub)
                raw += _filter_image(
                    packed_b, pstride, ph, 1, filter_type, 1)
        else:
            packed_b, packed_stride = pack_rows(a)
            raw = _filter_image(
                packed_b, packed_stride, height, 1, filter_type, 1
            )
        ihdr = (
            width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + bytes([bit_depth, color_type, 0, 0, int(interlace)])
        )
        chunks = [_png_chunk(b"IHDR", ihdr)]
        if palette is not None:
            chunks.append(_png_chunk(b"PLTE", palette))
        if trans is not None:
            chunks.append(_png_chunk(b"tRNS", trans))
        chunks.append(_png_chunk(b"IDAT", _z.compress(bytes(raw))))
        chunks.append(_png_chunk(b"IEND", b""))
        return _PNG_SIG + b"".join(chunks)

    if bit_depth not in (8, 16):
        raise ValueError(f"bit_depth must be 1, 2, 4, 8 or 16, got {bit_depth}")
    sb = bit_depth // 8
    if palette is not None:
        if bit_depth != 8:
            raise ValueError("palette PNG requires bit depth 8")
        if channels != 1:
            raise ValueError("palette PNG requires 1 index byte per pixel")
        if len(palette) % 3 != 0 or not 3 <= len(palette) <= 768:
            raise ValueError(f"bad PLTE length {len(palette)}")
        color_type = 3
    else:
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if trans is not None:
        if palette is None:
            raise ValueError(
                "trans requires a palette (gray/truecolor tRNS is out "
                "of subset)"
            )
        if not 1 <= len(trans) <= len(palette) // 3:
            raise ValueError(
                f"bad tRNS length {len(trans)} for "
                f"{len(palette) // 3}-entry palette"
            )
    stride = width * channels * sb
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    ihdr = (
        width.to_bytes(4, "big")
        + height.to_bytes(4, "big")
        + bytes([bit_depth, color_type, 0, 0, int(interlace)])
    )
    if interlace:
        img = np.frombuffer(pixels, dtype=np.uint8).reshape(
            height, width, channels * sb
        )
        raw = bytearray()
        for xs, ys, xstep, ystep in _ADAM7:
            sub = img[ys::ystep, xs::xstep]
            ph, pw = sub.shape[0], sub.shape[1]
            if ph == 0 or pw == 0:
                continue
            raw += _filter_image(
                sub.tobytes(), pw, ph, channels, filter_type, sb
            )
    else:
        raw = _filter_image(
            pixels, width, height, channels, filter_type, sb
        )
    chunks = [_png_chunk(b"IHDR", ihdr)]
    if palette is not None:
        chunks.append(_png_chunk(b"PLTE", palette))
    if trans is not None:
        chunks.append(_png_chunk(b"tRNS", trans))
    chunks.append(_png_chunk(b"IDAT", _z.compress(bytes(raw))))
    chunks.append(_png_chunk(b"IEND", b""))
    return _PNG_SIG + b"".join(chunks)


def decode_png(b: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, channels, raw 8-bit pixel bytes) or None.
    16-bit streams raise, pointing at :func:`decode_png16`.

    Full inverse of the filter pass: IDAT chunks are concatenated,
    zlib-inflated, and each scanline un-filtered against the
    reconstructed previous line (per spec, filters apply to OUTPUT
    bytes). Palette images (color type 3, round-7) un-filter their
    index bytes like grayscale, then expand through PLTE to RGB —
    the returned channels is 3, sharing the GIF decoder's
    palette-expansion contract. Adam7 interlaced images (round-7)
    un-filter each of the 7 pass sub-images independently and
    scatter them onto the output grid by the pass origin/step —
    composing with palette expansion. Palette images with a tRNS
    alpha table (round-8) expand to RGBA (returned channels = 4,
    entries beyond the table opaque per spec). Sub-byte depths 1/2/4
    (round-8, color types 0/3 only per spec) un-filter the PACKED
    scanlines (bpp=1), unpack MSB-first, and either scale grayscale
    samples to 8-bit by the exact integer 255/(2^d-1) or expand
    through PLTE. Returns None for non-PNGs; raises on PNGs the
    8-bit subset doesn't cover (16-bit, gray/truecolor tRNS,
    sub-byte Adam7) — loud, not silent, per the audit-don't-drop
    discipline.
    """
    return _decode_png_impl(b, want_depth=8)


def decode_png16(b: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, channels, BIG-ENDIAN u16 sample bytes) or
    None — the 16-bit-depth face of :func:`decode_png` (round-7):
    same chunk walk, CRC discipline, Adam7 support; the filters run
    bytewise with the 2-byte-per-sample bpp offset per spec. 8-bit
    streams raise (callers pick the variant off IHDR); palette +
    16-bit is illegal PNG and rejected."""
    return _decode_png_impl(b, want_depth=16)


def _decode_png_impl(
    b: bytes, want_depth: int
) -> tuple[int, int, int, bytes] | None:
    import zlib as _z

    sb = want_depth // 8
    if len(b) < 8 or not b.startswith(_PNG_SIG):
        return None
    pos, width = 8, None
    height = channels = 0
    paletted = interlaced = False
    sub_depth = 0  # 1/2/4 when the stream is sub-byte depth (round-8)
    palette: bytes | None = None
    trans: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        ctype = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        # CRC check on every chunk: without it a flipped byte in the
        # zlib stream decodes to silently-wrong pixels; with it, any
        # corruption fails loudly (the single-byte-flip property test
        # pins this: corrupt input can never return altered pixels).
        stored_crc = b[pos + 8 + ln:pos + 12 + ln]
        if len(data) < ln or len(stored_crc) < 4:
            raise ValueError("truncated PNG chunk")
        if _z.crc32(ctype + data) != int.from_bytes(stored_crc, "big"):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, _, _, interlace = data[8:13]
            if want_depth == 8 and bit_depth in (1, 2, 4):
                # round-8: sub-byte depths, legal for color types 0/3
                # only (spec table 11.1); round-9: composes with
                # Adam7 (per-pass packed strides + bit repacking)
                if color_type not in (0, 3):
                    raise ValueError(
                        f"illegal PNG: bit_depth={bit_depth} with "
                        f"color_type={color_type}"
                    )
                if interlace not in (0, 1):
                    raise ValueError(f"bad PNG interlace {interlace}")
                sub_depth = bit_depth
            elif (
                bit_depth != want_depth
                or interlace not in (0, 1)
                or (color_type != 3 and color_type not in _PNG_CHANNELS)
                or (color_type == 3 and want_depth == 16)
            ):
                raise ValueError(
                    f"unsupported PNG: bit_depth={bit_depth} "
                    f"color_type={color_type} interlace={interlace} "
                    f"(this decoder wants depth {want_depth})"
                )
            paletted = color_type == 3
            interlaced = interlace == 1
            channels = 1 if paletted else _PNG_CHANNELS[color_type]
        elif ctype == b"PLTE":
            if ln % 3 != 0 or not 3 <= ln <= 768:
                raise ValueError(f"bad PLTE length {ln}")
            palette = bytes(data)
        elif ctype == b"tRNS":
            # round-8: palette-alpha table (spec 11.3.2.1). The
            # gray/truecolor forms (a single 16-bit transparent color)
            # stay out of subset — loud, not silent.
            if not paletted:
                raise ValueError(
                    "unsupported PNG: tRNS on color type 0/2 "
                    "(single-transparent-color form)"
                )
            trans = bytes(data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if width is None or not idat:
        return None
    try:
        raw = _z.decompress(bytes(idat))
    except _z.error as e:  # corrupt stream -> loud, typed failure
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    if sub_depth:
        import numpy as np

        weights = (1 << np.arange(sub_depth - 1, -1, -1)).astype(np.uint8)

        def unpack_pass(data: bytes, pw: int, ph: int):
            # un-filter over the PACKED bytes (bpp=1 per spec), then
            # unpack MSB-first and drop the row-tail padding bits
            pstride = (pw * sub_depth + 7) // 8
            packed = _unfilter_image(data, pstride, ph, 1, 1)
            a = np.frombuffer(bytes(packed), dtype=np.uint8).reshape(
                ph, pstride
            )
            bits = np.unpackbits(a, axis=1)[:, : pw * sub_depth]
            return (
                bits.reshape(ph, pw, sub_depth) * weights
            ).sum(axis=2).astype(np.uint8)

        if interlaced:
            # round-9: sub-byte Adam7 — every pass repacks its own
            # rows, so each pass has its OWN packed stride
            samples = np.zeros((height, width), dtype=np.uint8)
            off = 0
            for xs, ys, xstep, ystep in _ADAM7:
                pw = (width - xs + xstep - 1) // xstep
                ph = (height - ys + ystep - 1) // ystep
                if pw == 0 or ph == 0:
                    continue
                pstride = (pw * sub_depth + 7) // 8
                sz = (pstride + 1) * ph
                samples[ys::ystep, xs::xstep] = unpack_pass(
                    raw[off:off + sz], pw, ph)
                off += sz
            if off != len(raw):
                raise ValueError("PNG pixel stream length mismatch")
        else:
            samples = unpack_pass(bytes(raw), width, height)
        if not paletted:
            # exact linear scaling to 8-bit: 255/(2^d-1) is an integer
            samples = samples * np.uint8(255 // ((1 << sub_depth) - 1))
        out = bytearray(samples.tobytes())
    elif interlaced:
        import numpy as np

        img = np.zeros((height, width, channels * sb), dtype=np.uint8)
        off = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (width - xs + xstep - 1) // xstep
            ph = (height - ys + ystep - 1) // ystep
            if pw == 0 or ph == 0:
                continue
            sz = (pw * channels * sb + 1) * ph
            sub = _unfilter_image(raw[off:off + sz], pw, ph, channels, sb)
            off += sz
            img[ys::ystep, xs::xstep] = np.frombuffer(
                bytes(sub), dtype=np.uint8
            ).reshape(ph, pw, channels * sb)
        if off != len(raw):
            raise ValueError("PNG pixel stream length mismatch")
        out = bytearray(img.tobytes())
    else:
        out = _unfilter_image(raw, width, height, channels, sb)
    if paletted:
        import numpy as np

        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        idx = np.frombuffer(bytes(out), dtype=np.uint8)
        n_entries = len(palette) // 3
        if int(idx.max(initial=0)) >= n_entries:
            raise ValueError(
                f"palette index {int(idx.max())} >= {n_entries} entries"
            )
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(n_entries, 3)
        if trans is not None:
            if len(trans) > n_entries:
                raise ValueError(
                    f"tRNS length {len(trans)} > {n_entries} PLTE entries"
                )
            # entries beyond the table are fully opaque per spec
            alpha = np.full(n_entries, 255, dtype=np.uint8)
            alpha[: len(trans)] = np.frombuffer(trans, dtype=np.uint8)
            rgba = np.concatenate([pal[idx], alpha[idx][:, None]], axis=1)
            return width, height, 4, rgba.tobytes()
        return width, height, 3, pal[idx].tobytes()
    return width, height, channels, bytes(out)


def resample_nearest(
    pixels: bytes, w: int, h: int, channels: int, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample on raw pixel bytes — numpy fancy
    indexing, no per-pixel Python. Source coordinate for target x is
    floor(x * w / tw) (top-left convention, exact integers)."""
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8).reshape(h, w, channels)
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return a[np.ix_(ys, xs)].tobytes()


DECODE_SCHEMA = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("px_width", T.IntegerType()),
    T.StructField("px_height", T.IntegerType()),
    T.StructField("px_channels", T.IntegerType()),
    T.StructField("pixel_sha1", T.StringType()),
])


def decode_image_batch(
    df: DataFrame, payload_col: str = "payload", id_col: str = "p_partkey"
) -> DataFrame:
    """REAL pixel decode over a binary column: PNG payloads inflate
    through the stdlib-zlib codec (all filter types), GIF payloads
    through the pure-Python LZW decoder (palette-expanded to RGB),
    baseline JPEGs through the Huffman+IDCT codec (jpeg_codec.py);
    the output row carries the decoded geometry and a sha1 over the
    pixel bytes so any downstream can verify the decode bit-for-bit.
    Other formats and corrupt/out-of-subset payloads (bad CRC,
    16-bit PNG, truncated LZW —
    signalled by ValueError) yield NULLs (audit-don't-drop); Adam7
    interlaced PNGs decode for real since round 7. One Arrow pass,
    no shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for raw in pdf[payload_col]:
                try:
                    d = decode_image(bytes(raw)) if raw is not None else None
                except ValueError:
                    d = None
                if d is None:
                    rows.append((None, None, None, None))
                else:
                    w, h, c, px = d
                    rows.append((w, h, c, hashlib.sha1(px).hexdigest()))
            yield pd.DataFrame({
                "p_partkey": pdf[id_col],
                "px_width": pd.array([r[0] for r in rows], dtype="Int32"),
                "px_height": pd.array([r[1] for r in rows], dtype="Int32"),
                "px_channels": pd.array([r[2] for r in rows], dtype="Int32"),
                "pixel_sha1": [r[3] for r in rows],
            })

    return df.mapInPandas(batches, DECODE_SCHEMA)


# ------------------------------------------------------ real GIF codec --
# Second pixel-real image format (round-6): GIF's LZW is pure integer
# bit-twiddling — no entropy-codec library needed — so a complete
# 8-bit palette decoder fits in stdlib. Covers GIF87a/GIF89a,
# global AND local color tables, variable-width LZW (9..12-bit code
# growth, clear/end codes, the cScSc self-reference case), 89a
# extension blocks (skipped per spec), and expands palette indices to
# interleaved RGB — the same (width, height, channels, pixels) return
# contract as decode_png, so every downstream consumer is
# format-agnostic. Interlaced images and truncated streams raise
# ValueError (outside the supported subset), mirroring the PNG
# codec's loud-subset discipline; callers that must not fail map
# ValueError to NULL rows (decode_image_batch). Animated GIFs decode
# their FIRST frame (the still-image semantics every thumbnailer
# uses). The encoder emits spec-valid streams with a periodic-clear
# LZW writer and can target either table kind, so round-trip tests
# drive every decoder branch.


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """GIF LZW: LSB-first bit stream, dynamic code width, 12-bit cap."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(clear))
        table.extend((b"", b""))  # clear + end placeholders
        return min_code_size + 1

    width = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset()
                prev = None
                continue
            if code == end:
                if len(out) != n_pixels:
                    raise ValueError(
                        f"LZW ended with {len(out)} of {n_pixels} pixels"
                    )
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the cScSc case
            else:
                raise ValueError(f"bad LZW code {code}")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
            prev = entry
            if len(out) > n_pixels:
                raise ValueError("LZW produced more pixels than the image holds")
    raise ValueError("LZW stream ended without an end code")


def decode_gif(b: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, 3, interleaved RGB bytes) for the first image
    in a GIF stream, or None for non-GIF payloads. 4-pass interlaced
    images (round-8) de-interlace via pure row reordering. Raises
    ValueError on missing color tables and malformed / truncated
    streams — same subset discipline as :func:`decode_png`."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = b[10]
    i = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = b[i:i + n]
        if len(gct) < n:
            raise ValueError("truncated global color table")
        i += n
    while i < len(b):
        block = b[i]
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image descriptor")
        if block == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        if i + 10 > len(b):
            raise ValueError("truncated image descriptor")
        w = int.from_bytes(b[i + 5:i + 7], "little")
        h = int.from_bytes(b[i + 7:i + 9], "little")
        ipacked = b[i + 9]
        i += 10
        gif_interlaced = bool(ipacked & 0x40)
        table = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            table = b[i:i + n]
            if len(table) < n:
                raise ValueError("truncated local color table")
            i += n
        if table is None:
            raise ValueError("image has neither local nor global color table")
        if i >= len(b):
            raise ValueError("missing LZW minimum code size")
        min_code = b[i]
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad LZW minimum code size {min_code}")
        i += 1
        lzw = bytearray()
        while i < len(b) and b[i] != 0:
            n = b[i]
            lzw += b[i + 1:i + 1 + n]
            if len(b) < i + 1 + n:
                raise ValueError("truncated LZW sub-block")
            i += 1 + n
        if i >= len(b):
            raise ValueError("unterminated LZW data")
        idx = _lzw_decode(min_code, bytes(lzw), w * h)
        if gif_interlaced:
            # round-8: GIF89a 4-pass interlace is pure row reordering —
            # the LZW stream carries rows in pass order (0,8,16.. then
            # 4,12.. then 2,6.. then 1,3,5..); scatter them back
            deint = bytearray(w * h)
            for src, dst in enumerate(_gif_interlace_rows(h)):
                deint[dst * w:(dst + 1) * w] = idx[src * w:(src + 1) * w]
            idx = bytes(deint)
        n_colors = len(table) // 3
        px = bytearray(w * h * 3)
        for j, ix in enumerate(idx):
            if ix >= n_colors:
                raise ValueError(f"palette index {ix} >= table size {n_colors}")
            px[3 * j:3 * j + 3] = table[3 * ix:3 * ix + 3]
        return w, h, 3, bytes(px)
    raise ValueError("GIF stream ended before trailer")


def _gif_interlace_rows(h: int) -> list[int]:
    """Real row for each transmitted row of a 4-pass interlaced GIF
    (spec Appendix E): pass starts/steps (0,8) (4,8) (2,4) (1,2)."""
    return (
        list(range(0, h, 8)) + list(range(4, h, 8))
        + list(range(2, h, 4)) + list(range(1, h, 2))
    )


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Periodic-clear LZW writer: literals only, a CLEAR before the
    code width would have to grow — spec-valid output at a fixed
    min_code_size+1 bits/code, and decoders must honor every clear."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    span = (1 << width) - (clear + 2)  # literals emittable per clear
    out = bytearray()
    acc = nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for j, ix in enumerate(indices):
        if j and j % span == 0:
            put(clear)
        put(ix)
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    local_table: bool = False,
    animated_89a: bool = True,
    interlace: bool = False,
) -> bytes:
    """Real GIF from palette indices + an RGB palette (3*2^k bytes,
    k in 1..8). ``local_table`` moves the palette into the image
    descriptor (exercising the decoder's LCT branch);
    ``animated_89a`` prepends a Graphic Control Extension so the
    stream also drives the extension-skip path; ``interlace``
    (round-8) transmits rows in 4-pass order with the descriptor's
    interlace flag set."""
    n_colors = len(palette) // 3
    if len(palette) != 3 * n_colors or n_colors & (n_colors - 1) or not 2 <= n_colors <= 256:
        raise ValueError(f"palette must be 3*2^k bytes (k in 1..8), got {len(palette)}")
    if len(indices) != width * height:
        raise ValueError(f"need {width * height} indices, got {len(indices)}")
    if max(indices, default=0) >= n_colors:
        raise ValueError("palette index out of range")
    size_field = n_colors.bit_length() - 2  # 2^(field+1) = n_colors
    min_code = max(2, (n_colors - 1).bit_length())
    out = bytearray(b"GIF89a" if animated_89a else b"GIF87a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([
        (0x80 | size_field) if not local_table else 0x00, 0, 0,
    ])
    if not local_table:
        out += palette
    if animated_89a:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, no transparency
        out += b"\x21\xfe\x05spark\x00"             # comment extension
    out += b"\x2c" + bytes(4)  # image at (0,0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    ipacked = (0x80 | size_field) if local_table else 0x00
    if interlace:
        ipacked |= 0x40
        reordered = bytearray()
        for y in _gif_interlace_rows(height):
            reordered += indices[y * width:(y + 1) * width]
        indices = bytes(reordered)
    out += bytes([ipacked])
    if local_table:
        out += palette
    out.append(min_code)
    lzw = _lzw_encode(min_code, indices)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_animated_gif(
    width: int,
    height: int,
    frames: list[tuple[bytes, int]],
    palette: bytes,
    loop: bool = True,
) -> bytes:
    """Real multi-frame GIF89a: NETSCAPE looping application
    extension (when ``loop``), then per frame a Graphic Control
    Extension carrying the delay (centiseconds) + full-canvas image
    descriptor + LZW data. ``frames`` is [(indices, delay_cs), ...]
    over one global color table — the structure every animated
    thumbnail/sticker uses (round-7; still-image decode_gif reads
    frame 1 of these streams, per its documented first-frame
    semantics)."""
    n_colors = len(palette) // 3
    if len(palette) != 3 * n_colors or n_colors & (n_colors - 1) \
            or not 2 <= n_colors <= 256:
        raise ValueError(
            f"palette must be 3*2^k bytes (k in 1..8), got {len(palette)}"
        )
    if not frames:
        raise ValueError("need at least one frame")
    size_field = n_colors.bit_length() - 2
    min_code = max(2, (n_colors - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | size_field, 0, 0])
    out += palette
    if loop:  # NETSCAPE2.0 infinite-loop application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for indices, delay_cs in frames:
        if len(indices) != width * height:
            raise ValueError(
                f"need {width * height} indices, got {len(indices)}"
            )
        if max(indices, default=0) >= n_colors:
            raise ValueError("palette index out of range")
        if not 0 <= delay_cs <= 0xFFFF:
            raise ValueError(f"delay {delay_cs} out of range")
        out += b"\x21\xf9\x04\x00" + delay_cs.to_bytes(2, "little") + b"\x00\x00"
        out += b"\x2c" + bytes(4)
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out += b"\x00"
        out.append(min_code)
        lzw = _lzw_encode(min_code, indices)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def gif_frame_census(b: bytes) -> tuple[int, int, int, int] | None:
    """(width, height, n_frames, total_delay_cs) for a GIF stream, or
    None for non-GIFs. A pure block WALK — image data sub-blocks are
    skipped by their length prefixes, never LZW-decoded — so the cost
    is O(stream bytes) with no decompression: the header-level
    metadata pass a video/animation catalog runs over billions of
    payloads before deciding what to decode. Counts image descriptors
    and sums Graphic Control Extension delays (a GCE applies to the
    following image; per spec at most one per image). Truncated
    streams raise ValueError (loud subset)."""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        return None
    width = int.from_bytes(b[6:8], "little")
    height = int.from_bytes(b[8:10], "little")
    flags = b[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0
    total_delay = 0

    def _skip_subblocks(p: int) -> int:
        while True:
            if p >= len(b):
                raise ValueError("truncated GIF sub-blocks")
            n = b[p]
            p += 1 + n
            if n == 0:
                return p

    while True:
        if pos >= len(b):
            raise ValueError("GIF missing trailer")
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(b):
                raise ValueError("truncated GIF extension")
            label = b[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                if pos + 6 > len(b) or b[pos] != 4:
                    raise ValueError("bad GCE block")
                total_delay += int.from_bytes(b[pos + 2:pos + 4], "little")
            pos = _skip_subblocks(pos)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(b):
                raise ValueError("truncated image descriptor")
            lflags = b[pos + 8]
            pos += 9
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            if pos >= len(b):
                raise ValueError("truncated image data")
            pos += 1  # LZW min code size
            pos = _skip_subblocks(pos)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return width, height, n_frames, total_delay


def decode_image(b: bytes) -> tuple[int, int, int, bytes] | None:
    """Format-dispatching pixel decode: PNG, GIF, TIFF, JPEG or WebP
    lossless payloads return (width, height, channels, raw bytes);
    other formats None. All decoders raise ValueError on
    corrupt/out-of-subset streams (loud subset)."""
    d = decode_png(b)
    if d is not None:
        return d
    d = decode_gif(b)
    if d is not None:
        return d
    d = decode_tiff(b)
    if d is not None:
        return d
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        from .vp8l_codec import decode_vp8l

        return decode_vp8l(b)
    from .jpeg_codec import decode_jpeg

    return decode_jpeg(b)


# ---------------------------------------------------- real PCM decode --
# Audio SAMPLE decode (round-6): 16-bit PCM needs no codec library —
# the WAV data chunk IS the samples. decode_wav_samples walks the
# RIFF chunks (same parse as the header sniffers), slices the data
# chunk and returns the int16 sample matrix; wav_sample_stats
# computes exact integer audio features (energy, peak, zero
# crossings) inside one Arrow pass. Compressed formats (non-PCM
# format tags, non-16-bit) raise ValueError — loud subset, like the
# image codecs.


def make_wav_pcm(
    channels: int, sample_rate: int, samples: "np.ndarray"
) -> bytes:
    """Real 16-bit PCM WAV: header + interleaved little-endian
    samples. ``samples`` is (n, channels) int16."""
    import numpy as np

    n = samples.shape[0]
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    data = samples.astype("<i2").tobytes()
    body = (
        b"WAVE" + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + body


def decode_wav_samples(b: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """(channels, sample_rate, samples[(n, channels)] int16) for a
    16-bit PCM WAV, or None for non-WAV payloads. Raises ValueError
    on non-PCM format tags, non-16-bit sample widths, and data chunks
    shorter than declared (loud subset)."""
    import numpy as np

    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    channels = rate = block_align = bits = fmt_tag = None
    data = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = int.from_bytes(b[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 24 <= len(b):
            fmt_tag = int.from_bytes(b[i + 8:i + 10], "little")
            channels = int.from_bytes(b[i + 10:i + 12], "little")
            rate = int.from_bytes(b[i + 12:i + 16], "little")
            block_align = int.from_bytes(b[i + 20:i + 22], "little")
            bits = int.from_bytes(b[i + 22:i + 24], "little")
        elif cid == b"data":
            data = b[i + 8:i + 8 + size]
            if len(data) < size:
                raise ValueError("WAV data chunk shorter than declared")
        i += 8 + size + (size & 1)
    if channels is None or rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if fmt_tag != 1:
        raise ValueError(f"unsupported WAV format tag {fmt_tag} (PCM only)")
    if bits != 16 or block_align != channels * 2:
        raise ValueError(f"unsupported WAV sample layout ({bits}-bit)")
    n = len(data) // block_align
    a = np.frombuffer(data[:n * block_align], dtype="<i2").reshape(n, channels)
    return channels, rate, a


WAV_STATS_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("sum_abs", T.LongType()),
    T.StructField("sum_sq", T.LongType()),
    T.StructField("peak", T.IntegerType()),
    T.StructField("zero_crossings", T.LongType()),
])


def wav_sample_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """REAL PCM feature extraction over a binary column: exact integer
    energy (sum |x|, sum x^2), peak amplitude and zero-crossing count
    over channel-0 samples. Undecodable payloads keep their row with
    NULLs (audit-don't-drop). One Arrow pass, no payload shuffle."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, raw in zip(pdf[id_col], pdf[payload_col]):
                try:
                    d = decode_wav_samples(bytes(raw)) if raw is not None else None
                except ValueError:
                    d = None
                if d is None:
                    rows.append((int(mid), None, None, None, None, None, None, None))
                    continue
                ch, rate, a = d
                x = a[:, 0].astype(np.int64)
                zc = int(((x[:-1] < 0) != (x[1:] < 0)).sum()) if len(x) > 1 else 0
                rows.append((
                    int(mid), ch, rate, int(a.shape[0]),
                    int(np.abs(x).sum()), int((x * x).sum()),
                    int(np.abs(x).max()) if len(x) else 0, zc,
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "channels", "sample_rate", "n_samples",
                "sum_abs", "sum_sq", "peak", "zero_crossings",
            ])

    return df.mapInPandas(batches, WAV_STATS_SCHEMA)


# ---------------------------------------------------- real TIFF codec --
# Fourth pixel-real image format (round-6): baseline TIFF 6.0 strips
# are either raw bytes or PackBits RLE — both pure byte-twiddling.
# Covers 8-bit grayscale (BlackIsZero / WhiteIsZero) and RGB, both
# byte orders, multi-strip layouts, out-of-line value arrays
# (SHORT/LONG), and Compression 1 (none) + 32773 (PackBits).
# LZW/JPEG-in-TIFF, palettes, tiles and non-8-bit depths raise
# ValueError (loud subset). Same (w, h, channels, bytes) contract as
# the PNG/GIF/JPEG decoders.


def packbits_decode(data: bytes, expect: int) -> bytes:
    """PackBits RLE per TIFF 6.0: n in 0..127 copies n+1 literals,
    n in 129..255 repeats the next byte 257-n times, 128 is a noop."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i:i + n + 1]
            if len(data) < i + n + 1:
                raise ValueError("truncated PackBits literal run")
            i += n + 1
        elif n > 128:
            if i >= len(data):
                raise ValueError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    if len(out) != expect:
        raise ValueError(f"PackBits produced {len(out)} of {expect} bytes")
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Simple PackBits writer: runs of >= 3 equal bytes become repeat
    packets, everything else literal packets (spec-valid, decoder
    must handle both)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def _tiff_read_values(b, endian, typ, count, val_field) -> list[int]:
    size = 2 if typ == 3 else 4
    total = size * count
    if total <= 4:
        raw = val_field[:total]
    else:
        off = int.from_bytes(val_field, endian)
        raw = b[off:off + total]
        if len(raw) < total:
            raise ValueError("TIFF value array out of bounds")
    return [
        int.from_bytes(raw[i * size:(i + 1) * size], endian)
        for i in range(count)
    ]


def tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF 6.0 LZW (Compression 5): MSB-first bit order, fixed
    256=Clear / 257=EOI, 12-bit cap, and the spec's EarlyChange —
    code width grows one code EARLIER than GIF's rule (when the next
    assigned code would be 2^w - 1). Raises on truncation, codes out
    of range, and output-length mismatch."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.extend((b"", b""))  # clear + eoi placeholders
        return 9

    width = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                width = reset()
                prev = None
                continue
            if code == EOI:
                if len(out) != expect:
                    raise ValueError(
                        f"TIFF LZW ended with {len(out)} of {expect} bytes"
                    )
                return bytes(out)
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the cScSc case
            else:
                raise ValueError(f"bad TIFF LZW code {code}")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            # EarlyChange=1, the convention real writers ship (libtiff,
            # Adobe): the decoder's table lags the encoder's dictionary
            # by one entry at equal stream positions, so it must widen
            # at 2^w - 2 — one earlier than a literal reading of the
            # TIFF 6.0 prose suggests (the spec's famous off-by-one).
            # Verified by round-trip against the mirrored encoder rule
            # (encoder widens when its next free code reaches 2^w - 1).
            if len(table) == (1 << width) - 2 and width < 12:
                width += 1
            prev = entry
            if len(out) > expect:
                raise ValueError("TIFF LZW produced too many bytes")
    raise ValueError("TIFF LZW stream ended without EOI")


def tiff_lzw_encode(data: bytes) -> bytes:
    """Real compressing TIFF-LZW writer (dictionary-based, not
    literals-only): MSB-first packing, EarlyChange width growth
    mirroring :func:`tiff_lzw_decode`, Clear emitted before the
    dictionary would overflow 12 bits."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(256)}, 258, 9

    dict_, next_code, width = fresh()
    put(CLEAR, width)
    cur = b""
    for bv in data:
        nxt = cur + bytes([bv])
        if nxt in dict_:
            cur = nxt
            continue
        put(dict_[cur], width)
        dict_[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1  # EarlyChange, mirrored
        if next_code == 4094:
            put(CLEAR, width)
            dict_, next_code, width = fresh()
        cur = bytes([bv])
    if cur:
        put(dict_[cur], width)
        # stream-end width sync: the decoder appends a table entry for
        # the FINAL symbol too (the encoder has no matching add — there
        # is no next byte), so its table reaches next_code and may
        # cross the EarlyChange boundary right before reading EOI;
        # mirror that or a boundary-straddling stream ends with EOI
        # written one bit narrower than the decoder reads it (found by
        # the hypothesis round-trip property at alphabet=250, n=255).
        if next_code == (1 << width) - 2 and width < 12:
            width += 1
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(b: bytes) -> tuple[int, int, int, bytes] | None:
    """(width, height, channels, raw 8-bit pixel bytes) for a
    baseline strip TIFF, or None for non-TIFF payloads. Raises
    ValueError on unsupported compression/photometric/depth and
    malformed structures."""
    if len(b) < 8:
        return None
    if b[:4] == b"II*\x00":
        endian = "little"
    elif b[:4] == b"MM\x00*":
        endian = "big"
    else:
        return None
    ifd = int.from_bytes(b[4:8], endian)
    if ifd + 2 > len(b):
        raise ValueError("TIFF IFD offset out of bounds")
    n = int.from_bytes(b[ifd:ifd + 2], endian)
    tags: dict[int, list[int]] = {}
    for k in range(n):
        e = ifd + 2 + 12 * k
        if e + 12 > len(b):
            raise ValueError("TIFF IFD entry out of bounds")
        tag = int.from_bytes(b[e:e + 2], endian)
        typ = int.from_bytes(b[e + 2:e + 4], endian)
        count = int.from_bytes(b[e + 4:e + 8], endian)
        if typ in (3, 4):
            tags[tag] = _tiff_read_values(b, endian, typ, count, b[e + 8:e + 12])
    try:
        w, h = tags[256][0], tags[257][0]
        offsets, counts = tags[273], tags[279]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from None
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8])
    comp = tags.get(259, [1])[0]
    photo = tags.get(262, [1])[0]
    rows_per_strip = tags.get(278, [h])[0]
    if any(x != 8 for x in bits) or spp not in (1, 3):
        raise ValueError(f"unsupported TIFF depth {bits}x{spp}")
    if comp not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    predictor = tags.get(317, [1])[0]
    if comp == 5 and predictor not in (1, 2):
        raise ValueError(
            f"unsupported TIFF LZW predictor {predictor}")
    if comp != 5 and predictor != 1:
        raise ValueError(
            f"TIFF predictor {predictor} outside LZW is out of subset")
    if photo not in (0, 1, 2):
        raise ValueError(f"unsupported TIFF photometric {photo}")
    if len(offsets) != len(counts):
        raise ValueError("TIFF strip offset/count mismatch")
    out = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = b[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError("TIFF strip out of bounds")
        rows = min(rows_per_strip, h - si * rows_per_strip)
        expect = rows * w * spp
        if comp == 32773:
            out += packbits_decode(raw, expect)
        elif comp == 5:
            out += tiff_lzw_decode(raw, expect)
        else:
            if len(raw) != expect:
                raise ValueError("TIFF strip size mismatch")
            out += raw
    if len(out) != h * w * spp:
        raise ValueError(f"TIFF strips produced {len(out)} of {h * w * spp} bytes")
    if predictor == 2:
        # horizontal differencing (the standard LZW companion): each
        # row stores per-channel deltas; undo cumulatively per row.
        # Rows never span strips, so strip boundaries need no care.
        stride = w * spp
        for y in range(h):
            base = y * stride
            for i in range(base + spp, base + stride):
                out[i] = (out[i] + out[i - spp]) & 0xFF
    if photo == 0:  # WhiteIsZero: invert to BlackIsZero convention
        out = bytearray(255 - v for v in out)
    return w, h, spp, bytes(out)


def encode_tiff_pixels(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    endian: str = "little",
    packbits: bool = False,
    rows_per_strip: int | None = None,
    lzw: bool = False,
    predictor2: bool = False,
) -> bytes:
    """Real strip TIFF from raw 8-bit pixels — gray or RGB, either
    byte order, optional PackBits or LZW (round-8, Compression 5,
    EarlyChange) compression, horizontal-differencing predictor
    (round-9, tag 317 = 2, LZW only — the standard pairing) and
    multi-strip layout. Exists so round-trip tests and gate fixtures
    drive every decoder branch."""
    if packbits and lzw:
        raise ValueError("pick one compression")
    if predictor2 and not lzw:
        raise ValueError("predictor2 pairs with LZW")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if channels not in (1, 3):
        raise ValueError("gray or RGB only")
    if predictor2:
        diffed = bytearray(pixels)
        stride = width * channels
        for y in range(height):
            base = y * stride
            # difference right-to-left so each delta uses ORIGINALs
            for i in range(base + stride - 1, base + channels - 1, -1):
                diffed[i] = (diffed[i] - diffed[i - channels]) & 0xFF
        pixels = bytes(diffed)
    e = endian
    rps = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rps):
        rows = min(rps, height - y0)
        raw = pixels[y0 * width * channels:(y0 + rows) * width * channels]
        strips.append(
            packbits_encode(raw) if packbits
            else tiff_lzw_encode(raw) if lzw else raw)

    def u(v: int, nb: int) -> bytes:
        return v.to_bytes(nb, e)

    sig = b"II*\x00" if e == "little" else b"MM\x00*"
    entries = []  # (tag, typ, count, values)
    entries.append((256, 3, 1, [width]))
    entries.append((257, 3, 1, [height]))
    entries.append((258, 3, channels, [8] * channels))
    entries.append((259, 3, 1, [32773 if packbits else 5 if lzw else 1]))
    entries.append((262, 3, 1, [2 if channels == 3 else 1]))
    entries.append((273, 4, len(strips), None))  # offsets patched below
    entries.append((277, 3, 1, [channels]))
    entries.append((278, 3, 1, [rps]))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    if predictor2:
        entries.append((317, 3, 1, [2]))
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # out-of-line arrays land right after the IFD
    extra = bytearray()
    extra_base = ifd_off + ifd_size
    rendered = []
    strip_area = extra_base  # patched after extra is known

    def render(tag, typ, count, values, val_bytes=None):
        size = 2 if typ == 3 else 4
        total = size * count
        if val_bytes is None:
            val_bytes = b"".join(u(v, size) for v in values)
        if total <= 4:
            field = val_bytes + b"\x00" * (4 - total)
        else:
            field = u(extra_base + len(extra), 4)
            extra.extend(val_bytes)
        return u(tag, 2) + u(typ, 2) + u(count, 4) + field

    # first pass to size extra (strip offsets need the final layout):
    # render everything except strip offsets, then compute them
    pre = []
    for tag, typ, count, values in entries:
        if tag == 273:
            pre.append(None)
            if 4 * len(strips) > 4:
                extra.extend(b"\x00" * 4 * len(strips))  # placeholder
            continue
        pre.append(render(tag, typ, count, values))
    strip_area = extra_base + len(extra)
    offsets = []
    pos = strip_area
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    # now patch the offsets entry (and its placeholder in extra)
    if 4 * len(strips) <= 4:
        off_entry = u(273, 2) + u(4, 2) + u(len(strips), 4) + (
            b"".join(u(v, 4) for v in offsets) + b"\x00" * (4 - 4 * len(strips))
        )
    else:
        # rebuild the out-of-line area deterministically with the real
        # offsets in 273's slot (entry order fixes each array's home)
        raw_off = b"".join(u(v, 4) for v in offsets)
        extra2 = bytearray()
        extra_pos = {}
        for tag, typ, count, values in entries:
            size = 2 if typ == 3 else 4
            total = size * count
            if total > 4:
                extra_pos[tag] = extra_base + len(extra2)
                if tag == 273:
                    extra2.extend(raw_off)
                else:
                    extra2.extend(b"".join(u(v, size) for v in values))
        extra = extra2
        off_entry = (
            u(273, 2) + u(4, 2) + u(len(strips), 4) + u(extra_pos[273], 4)
        )
        # re-render every entry against the recomputed extra layout
        pre = []
        for tag, typ, count, values in entries:
            if tag == 273:
                pre.append(None)
                continue
            size = 2 if typ == 3 else 4
            total = size * count
            if total <= 4:
                field = b"".join(u(v, size) for v in values)
                field += b"\x00" * (4 - total)
            else:
                field = u(extra_pos[tag], 4)
            pre.append(u(tag, 2) + u(typ, 2) + u(count, 4) + field)
    out = bytearray(sig + u(ifd_off, 4))
    out += u(len(entries), 2)
    for i, (tag, _, _, _) in enumerate(entries):
        out += off_entry if tag == 273 else pre[i]
    out += u(0, 4)  # next-IFD pointer
    out += extra
    for s in strips:
        out += s
    return bytes(out)
