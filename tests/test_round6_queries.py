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
