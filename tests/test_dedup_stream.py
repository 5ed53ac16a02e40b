"""Continuous-ingest near-dup filtering: new docs are checked against
the accepted-corpus band index AND against batch siblings; survivors
extend the index for future batches."""

from __future__ import annotations

import json
from pathlib import Path

from bigdata_jobmatching_spark.streaming.dedup_stream import (
    band_keys,
    start_streaming_dedup,
)

_BASE = "the quick brown fox jumps over the lazy dog again and again " * 4


def _doc(doc_id: int, text: str) -> dict:
    return {"doc_id": doc_id, "text": text}


def _write(d: Path, rows: list[dict], name: str) -> None:
    d.mkdir(parents=True, exist_ok=True)
    with open(d / name, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _distinct_text(seed: int) -> str:
    return " ".join(f"w{seed}x{i} token{i * seed + 7}" for i in range(40))


def test_streaming_dedup_against_corpus_index(spark, tmp_path):
    src = tmp_path / "in"
    args = dict(
        id_col="doc_id",
        text_col="text",
        index_path=str(tmp_path / "index"),
        clean_path=str(tmp_path / "clean"),
        checkpoint_path=str(tmp_path / "ckpt"),
    )
    stream_df = lambda: spark.readStream.schema("doc_id long, text string").json(  # noqa: E731
        str(src)
    )

    # batch 1: doc 1 and its near-copy doc 2 (one word changed), plus
    # distinct doc 3 -> within-batch collision keeps the LOWEST id.
    _write(src, [
        _doc(1, _BASE),
        _doc(2, _BASE.replace("lazy", "sleepy", 1)),
        _doc(3, _distinct_text(5)),
    ], "b1.json")
    q = start_streaming_dedup(stream_df(), **args)
    q.awaitTermination(120)
    clean = spark.read.parquet(args["clean_path"])
    assert {r.doc_id for r in clean.collect()} == {1, 3}

    # batch 2: doc 4 near-dups the ACCEPTED doc 1 (corpus collision),
    # doc 5 near-dups the REJECTED doc 2 (same story - collides with
    # doc 1's index entries), doc 6 is new.
    _write(src, [
        _doc(4, _BASE.replace("dog", "cat", 1)),
        _doc(5, _BASE.replace("lazy", "sleepy", 1)),
        _doc(6, _distinct_text(11)),
    ], "b2.json")
    q2 = start_streaming_dedup(stream_df(), **args)
    q2.awaitTermination(120)
    clean = spark.read.parquet(args["clean_path"])
    assert {r.doc_id for r in clean.collect()} == {1, 3, 6}

    # the index holds band keys for exactly the accepted docs, laid
    # out as band= partitions for scan pruning
    idx = spark.read.parquet(args["index_path"])
    assert {r.doc_id for r in idx.select("doc_id").distinct().collect()} == {1, 3, 6}
    parts = {p.name for p in Path(args["index_path"]).iterdir() if p.is_dir()}
    assert any(p.startswith("band=") for p in parts)

    # restart with the same checkpoint and no new files: nothing lands
    q3 = start_streaming_dedup(stream_df(), **args)
    q3.awaitTermination(120)
    assert spark.read.parquet(args["clean_path"]).count() == 3


def test_band_keys_match_batch_family(spark):
    # streaming band keys must be byte-identical to the batch LSH
    # family so batch-built indexes serve streaming dedup directly
    from pyspark.sql import functions as F

    from bigdata_jobmatching_spark.functions import similarity as S

    df = spark.createDataFrame([(7, _BASE)], "doc_id long, text string")
    got = {r.band for r in band_keys(df, "doc_id", "text").collect()}
    sig = df.select(
        S.minhash_signature(S.word_ngrams(F.col("text"), 3), 32).alias("sig")
    )
    want = set(
        sig.select(F.explode(S.minhash_bands(F.col("sig"), 8, 4)).alias("b"))
        .toPandas()["b"]
    )
    assert got == want and len(got) == 8
