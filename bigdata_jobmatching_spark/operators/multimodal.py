"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step itself is STUBBED (the image/audio libraries are not
in this container): `decode_image_batch` raises NotImplementedError
unless `fake=True`, in which case a deterministic fake decoder
produces stable feature rows so the Spark-side plumbing — schema,
batch shape, partitioning — is real and testable.

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


def extract_features(df: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """media rows -> feature rows via mapInPandas (Arrow batches).

    With `fake=False` this is where a real decode (PIL/librosa/ffmpeg)
    would run per batch; those libs are absent here, so it raises.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/librosa/ffmpeg — not in this container; "
            "use fake=True for the deterministic plumbing path"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"].apply(lambda b: bytes(b) if b is not None else b"")
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "payload_bytes": payloads.str.len().astype("int64"),
                "payload_sha1": payloads.apply(lambda b: hashlib.sha1(b).hexdigest()),
                "feature": payloads.apply(lambda b: _fake_feature(b, dim)),
            })

    return df.mapInPandas(batches, FEATURE_SCHEMA)


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
