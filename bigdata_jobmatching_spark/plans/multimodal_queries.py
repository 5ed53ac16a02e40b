"""Multimodal gate query: real container-header metadata extraction.

Payloads are synthesized per-row from p_partkey (PNG for even keys,
JPEG for odd) in one mapInPandas stage, then the REAL header sniffer
(operators/multimodal.py: pure-Python IHDR / SOFn parsing, no codec
libs) extracts (format, width, height) in a second. The DuckDB oracle
recomputes the planted dims arithmetically — if the byte-level
synthesis or the parser drifts, the hash fails.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators import multimodal as MM
from ..sources.io import fan_out, load_table
from .catalog import QuerySpec, register

_PAYLOAD_SCHEMA = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def _synth(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        keys = pdf["p_partkey"]
        yield pd.DataFrame({
            "p_partkey": keys,
            "payload": [
                MM.make_png(int(k) % 512 + 1, int(k) % 256 + 16)
                if k % 2 == 0
                else MM.make_jpeg(int(k) % 512 + 1, int(k) % 256 + 16)
                for k in keys
            ],
        })


def _header_dims(spark: SparkSession, sf: str) -> DataFrame:
    p = fan_out(load_table(spark, sf, "part")).select("p_partkey")
    media = p.mapInPandas(_synth, _PAYLOAD_SCHEMA)
    return MM.sniff_image_dims(media).select(
        "p_partkey", "hdr_format", "hdr_width", "hdr_height"
    )


_HEADER_SQL = """
SELECT p_partkey,
  CASE WHEN p_partkey % 2 = 0 THEN 'png' ELSE 'jpeg' END AS hdr_format,
  CAST(p_partkey % 512 + 1 AS INT) AS hdr_width,
  CAST(p_partkey % 256 + 16 AS INT) AS hdr_height
FROM part
"""

register(QuerySpec(
    "image_header_dims", _header_dims, _HEADER_SQL,
    "PNG IHDR / JPEG SOFn header sniff over binary payloads "
    "(mapInPandas, pure Python, no codec libs)",
    ("multimodal",),
))
