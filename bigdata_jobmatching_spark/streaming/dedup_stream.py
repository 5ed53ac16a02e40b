"""Continuous-ingest near-duplicate filtering against a persisted
signature index — the streaming face of ``operators/dedup.py``'s
MinHash-LSH.

The batch dedup families assume the whole corpus is present; a
training-data pipeline that ingests continuously needs the other
shape: does THIS new document duplicate anything already accepted?
(The reference's ingest loop has the analogous per-offer "seen
before?" discipline in its streaming job — consume_jobs.py's
landing+dedup chain — at exact-match grain; this operator is the
near-dup generalisation.)

Per micro-batch:

1. compute banded MinHash keys for the incoming documents;
2. semi-join those keys against the on-disk band index (an
   append-only parquet directory partitioned by band id) to find
   incoming docs that collide with the accepted corpus — collision
   at band grain is the LSH candidate test, the same recall contract
   as ``minhash_lsh_pairs``;
3. also drop within-batch band collisions (keep the lowest doc_id of
   each colliding group, deterministically);
4. append the survivors to the clean sink and their band keys to the
   index.

Exactly-once: the checkpoint replays an epoch identically after a
crash, and a replayed epoch re-lands the same rows (append of the
same doc_ids — downstream exact dedup on doc_id makes the sink
idempotent, mirroring ``stream_offers_to_lake``'s contract).

Scale: the per-batch work is one equi-join of (batch keys) against
band partitions of the index — Spark prunes the index scan to the
band ids present in the batch, and the join's build side is the
micro-batch (small), so index growth costs IO proportional to the
touched bands only, never a full-index shuffle. At 100 TB the index
would live bucketed on (band, key); the partition layout here is the
same pruning story one level up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from ..functions import similarity as S
from ..sources.io import fan_out

NUM_HASHES = 32
NUM_BANDS = 8


def band_keys(docs: DataFrame, id_col: str, text_col: str,
              shingle_n: int = 3) -> DataFrame:
    """(id, band) MinHash band keys of a document frame — the exact
    signature family of ``minhash_lsh_pairs`` (same shingles, same
    LCG permutations), so batch and streaming dedup agree on what
    collides. Docs too short to shingle get no keys (never collide)."""
    rows = NUM_HASHES // NUM_BANDS
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        S.word_ngrams(F.col(text_col), shingle_n).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sig = sh.withColumn("sig", S.minhash_signature(F.col("shingles"), NUM_HASHES))
    return sig.select(
        "doc_id",
        F.explode(S.minhash_bands(F.col("sig"), NUM_BANDS, rows)).alias("band"),
    )


def _filter_batch(
    batch: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    clean_path: str,
) -> None:
    spark = batch.sparkSession
    keys = fan_out(band_keys(batch, id_col, text_col)).localCheckpoint()

    # 1. collisions with the accepted corpus: prune the index scan to
    # this batch's bands (partition column), then semi-join.
    try:
        idx = spark.read.parquet(index_path).select("band")
    except AnalysisException:
        idx = None  # first batch: index not created yet
    if idx is not None:
        corpus_hits = (
            keys.join(idx, "band", "left_semi").select("doc_id").distinct()
        )
    else:
        corpus_hits = keys.select("doc_id").limit(0)

    # 2. within-batch collisions: for each band shared by 2+ batch
    # docs, every doc except the lowest id is a duplicate. (A batch
    # doc colliding with BOTH the corpus and a batch sibling is
    # dropped either way.)
    w_min = F.min("doc_id").over(Window.partitionBy("band"))
    batch_hits = (
        keys.withColumn("__keep", w_min)
        .filter(F.col("doc_id") != F.col("__keep"))
        .select("doc_id")
        .distinct()
    )

    dup_ids = corpus_hits.union(batch_hits).distinct()
    survivors = batch.join(
        dup_ids.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    ).localCheckpoint()

    survivors.write.mode("append").parquet(clean_path)
    band_keys(survivors, id_col, text_col).write.mode("append").partitionBy(
        "band"
    ).parquet(index_path)


def start_streaming_dedup(
    docs_stream: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    clean_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run the continuous near-dup filter over a streaming document
    frame. Returns the started query; awaitTermination is the
    caller's choice."""

    def process(batch: DataFrame, epoch_id: int) -> None:
        _filter_batch(batch, id_col, text_col, index_path, clean_path)

    writer = (
        docs_stream.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
