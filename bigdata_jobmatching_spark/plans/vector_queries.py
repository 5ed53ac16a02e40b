"""Vector workload over ``embeddings``: similarity search + vector
aggregation — the ANN surface of a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..operators import similarity_search as ANN
from ..sources.io import load_table
from .catalog import QuerySpec, register


# --- ann_cosine_topk: exact brute-force top-k (broadcast queries) ---------

def _ann_exact(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return ANN.brute_force_topk(
        e, queries, "vec_id", "embedding", k=10, score_decimals=6
    ).withColumn("rnk", F.col("rnk").cast("int"))


_ANN_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_cosine_similarity(q.qe::DOUBLE[], c.embedding::DOUBLE[]) AS s
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, round(s, 6) AS score, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 10
"""

register(QuerySpec(
    "ann_cosine_topk", _ann_exact, _ANN_SQL,
    "brute-force cosine top-k per query (broadcast query set, native vector math)",
    ("vector", "ann", "bench"),
))


# --- ann_lsh_topk: random-hyperplane LSH approximate top-k (no oracle) ----

def _ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return (
        ANN.lsh_ann_topk(e, queries, "vec_id", "embedding", dim=64, k=10, tables=4, bits=8)
        .withColumn("score", F.round("score", 6))
        .withColumn("rnk", F.col("rnk").cast("int"))
    )


register(QuerySpec(
    "ann_lsh_topk", _ann_lsh, None,
    "LSH-bucketed approximate top-k (scale path; approximate => no SQL twin)",
    ("vector", "ann", "lsh"),
))


# --- embedding_centroids: per-label element-wise mean (first 4 dims) ------

_DIMS = 4
_DEC = "decimal(18,9)"


def _centroids(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    aggs = [F.count(F.lit(1)).alias("n_vectors")]
    for i in range(_DIMS):
        # float -> double FIRST: Spark's float->decimal cast rounds via
        # the float's shortest string repr (~9 sig digits), which would
        # diverge from DuckDB's exact binary expansion.
        aggs.append(
            (F.sum(F.col("embedding")[i].cast("double").cast(_DEC)).cast("double") / F.count(F.lit(1)))
            .alias(f"dim{i}_mean")
        )
    return e.groupBy("label").agg(*aggs)


_CENTROID_DIMS_SQL = ",\n  ".join(
    f"CAST(SUM(CAST(CAST(embedding[{i + 1}] AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS dim{i}_mean"
    for i in range(_DIMS)
)
_CENTROID_SQL = f"""
SELECT label, COUNT(*) AS n_vectors,
  {_CENTROID_DIMS_SQL}
FROM embeddings GROUP BY label
"""

register(QuerySpec(
    "embedding_centroids", _centroids, _CENTROID_SQL,
    "per-label element-wise centroid (exact decimal aggregation of float dims)",
    ("vector", "agg"),
))


# --- embedding_norm_stats: per-vector L2 norm + banding -------------------

def _norms(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    return e.select(
        "vec_id",
        F.round(S.l2_norm(F.col("embedding")), 6).alias("l2_norm"),
    )


_NORMS_SQL = """
SELECT vec_id,
  round(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS l2_norm
FROM embeddings
"""

register(QuerySpec(
    "embedding_norm_stats", _norms, _NORMS_SQL,
    "per-vector L2 norm via higher-order aggregate (JVM-side vector math)",
    ("vector", "projection"),
))
