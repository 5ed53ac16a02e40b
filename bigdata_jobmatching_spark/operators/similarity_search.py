"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set
against the (huge) corpus, score natively with zip_with/aggregate,
take top-k per query via window. The corpus is never shuffled: the
scan streams through a broadcast-nested-loop with only k×Q rows kept
per partition, which is the right 100 TB plan when Q is small.

Scale path: LSH-bucketed ANN — random-hyperplane signatures put
near vectors in shared buckets; scoring happens only within buckets
(equi-join on bucket key). Recall is tunable via tables×bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..sources.io import fan_out

# Deterministic pseudo-random hyperplanes from one LCG rational
# family: component h[t][b][d] = LCG(t,b,d)/2^31 - 0.5. Dyadic
# rationals are exactly representable as doubles in every engine, so
# the same planes (and therefore the same bucket keys) can be
# reproduced in an external SQL oracle — the property the
# `ann_lsh_exact` gate query relies on. One family everywhere: the
# operator, the exact twin, and the oracle all call this.

_LCG_M = 2_147_483_648  # 2^31

# Hard plane-literal budget for the codegen LSH path: 4*8*256 leaves
# headroom over the verified dim=64 gate shape while refusing widths
# (dim≈512+) where plan analysis time exceeds the query itself.
MAX_PLANE_LITERALS = 8_192


def lcg_planes(tables: int, bits: int, dim: int) -> list[list[list[float]]]:
    """``tables x bits`` hyperplanes of ``dim`` components in
    [-0.5, 0.5), derived from a linear congruential generator seeded
    by (table, bit, dim-index). No RNG state, stable across runs and
    engines."""
    return [
        [
            [
                (((t * 1000003 + b * 7919 + i) * 1103515245 + 12345) % _LCG_M) / _LCG_M - 0.5
                for i in range(dim)
            ]
            for b in range(bits)
        ]
        for t in range(tables)
    ]


def _hyperplane_sig(vec: Column, planes: list[list[float]], table: int) -> Column:
    """<bits>-bit random-hyperplane signature of a vector as a string
    key. The sign is taken on the 6dp-rounded projection so a
    last-bit double difference between engines can never flip a
    bucket bit."""
    bit_vals = []
    for plane in planes:
        lit = F.array(*[F.lit(p) for p in plane])
        proj = F.aggregate(
            F.zip_with(vec, lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bit_vals.append(F.when(F.round(proj, 6) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(F.lit(f"t{table}:"), *bit_vals)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    score_decimals: int | None = None,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, score) with deterministic
    tie-break on neighbor id. Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", S.cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )
    if score_decimals is not None:
        out = out.withColumn("score", F.round("score", score_decimals))
    return out


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    score_decimals: int | None = None,
    max_queries: int = 10_000,
) -> DataFrame:
    """Arrow/numpy variant of brute_force_topk: the query matrix is
    collected (small, broadcast via closure), and each corpus Arrow
    batch is scored with one BLAS matmul inside mapInPandas.

    This is the documented exception to "stay JVM-side": dense
    float matmul is exactly what BLAS does 10-50x faster than a
    per-element expression tree, and the Arrow batch transfer
    amortizes the Python boundary. Per-batch partial top-k keeps the
    shuffle at k rows per (query, batch).

    The contract is a SMALL query set (it rides to every executor in
    the task closure); ``max_queries`` makes a misuse fail loudly
    instead of silently OOMing the driver — the collect itself is
    limit-bounded, so even a 100 TB "queries" DataFrame cannot pull
    more than ``max_queries + 1`` rows.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"brute_force_topk_arrow query set exceeds max_queries="
            f"{max_queries}; broadcast-joining that many query vectors "
            "through a closure would flood executors — use the LSH/IVF "
            "path or raise max_queries deliberately"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    q_norm[q_norm == 0] = 1.0

    def score_batches(it):
        for pdf in it:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            c = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c, axis=1)
            c_norm[c_norm == 0] = 1.0
            sims = (c @ q_mat.T) / np.outer(c_norm, q_norm)  # (batch, nq)
            frames = []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                mask = ids != qid
                cand_ids, cand_scores = ids[mask], col[mask]
                if len(cand_ids) > k:
                    top = np.argpartition(-cand_scores, k)[:k]
                    cand_ids, cand_scores = cand_ids[top], cand_scores[top]
                frames.append(pd.DataFrame({
                    "query_id": qid, "neighbor_id": cand_ids, "score": cand_scores,
                }))
            yield pd.concat(frames, ignore_index=True)

    partial = fan_out(corpus.select(id_col, vec_col)).mapInPandas(
        score_batches, "query_id long, neighbor_id long, score double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    out = (
        partial.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )
    if score_decimals is not None:
        out = out.withColumn("score", F.round("score", score_decimals))
    return out


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    n_probe: int = 4,
    k: int = 10,
) -> DataFrame:
    """IVF (inverted-file) ANN: a KMeans coarse quantizer assigns each
    corpus vector to a cell; each query scores only its ``n_probe``
    nearest cells. The 100 TB shape: centroids broadcast (tiny),
    corpus partitioned by cell, scoring reads ~n_probe/n_cells of the
    data. Recall grows with n_probe (n_probe == n_cells is exact).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    dense = fan_out(corpus.select(id_col, vec_col)).withColumn(
        "__v", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(k=n_cells, seed=42, featuresCol="__v", predictionCol="cell")
    model = km.fit(dense)
    assigned = model.transform(dense).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "cell",
    )

    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    cent_df = queries.sparkSession.createDataFrame(centroids, "cell int, centroid array<double>")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    q_cells = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("cdist", S.cosine(F.col("q_vec"), F.col("centroid")))
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("cdist"), F.asc("cell"))
    probes = (
        q_cells.withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )

    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score", S.cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    tables: int = 4,
    bits: int = 8,
    score_decimals: int | None = None,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH.

    Each vector gets ``tables`` signatures; candidates = corpus rows
    sharing any signature with the query; exact cosine re-rank of
    candidates. At 100 TB the bucket join shuffles only keys+vectors,
    and bucket sizes (2^-bits of corpus per table) bound the scoring
    work.

    Hyperplanes come from the shared :func:`lcg_planes` rational
    family, so the full result (buckets, candidates, scores, ranks)
    is reproducible by an external SQL oracle. Plane literals cost
    ``tables*bits*dim`` plan nodes — fine to dim≈128; for very wide
    embeddings compute signatures in an Arrow batch instead. Above
    ``MAX_PLANE_LITERALS`` this raises instead of silently building a
    plan whose analysis/codegen time dwarfs the query.
    """
    n_literals = tables * bits * dim
    if n_literals > MAX_PLANE_LITERALS:
        raise ValueError(
            f"lsh_ann_topk would embed {n_literals} plane literals "
            f"(tables={tables} * bits={bits} * dim={dim}) > "
            f"{MAX_PLANE_LITERALS}: codegen cost dwarfs the query at this "
            "width. Use brute_force_topk_arrow (batch matmul) or lower "
            "tables/bits."
        )
    planes = lcg_planes(tables, bits, dim)

    def with_buckets(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        sigs = F.array(*[
            _hyperplane_sig(F.col(vec_col), planes[t], t) for t in range(tables)
        ])
        return fan_out(df.select(id_col, vec_col)).select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias(vec_alias),
            F.explode(sigs).alias("bucket"),
        )

    cb = with_buckets(corpus, "neighbor_id", "c_vec")
    qb = with_buckets(queries, "query_id", "q_vec")
    cand = (
        cb.join(qb, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", S.cosine(F.col("q_vec"), F.col("c_vec")))
    )
    if score_decimals is not None:
        # round BEFORE ranking: with the unique-id tie-break the
        # ordering is then exactly reproducible by an external oracle
        # even when two raw doubles differ in the last bit.
        cand = cand.withColumn("score", F.round("score", score_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def ivf_topk_fixed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    n_probe: int = 4,
    k: int = 10,
    score_decimals: int | None = None,
) -> DataFrame:
    """IVF ANN with PRECOMPUTED centroids (the production pattern:
    train the quantizer offline, assign online). Assignment is argmax
    cosine to centroid literals — computed per row in codegen, no ML
    model object — with the (6dp-rounded cosine, centroid id) pair as
    the order key so the assignment is engine-reproducible. With
    :func:`lcg_planes`-derived rational centroids the whole result is
    SQL-oracle-verifiable, unlike the KMeans path.

    Scale: identical to :func:`ivf_topk` — the corpus partitions by
    cell, each query reads ~n_probe/n_cells of it.
    """
    def cell_scores(vec: Column) -> list[Column]:
        out = []
        for ci, cent in enumerate(centroids):
            lit = F.array(*[F.lit(x) for x in cent])
            out.append(F.struct(
                F.round(S.cosine(vec, lit), 6).alias("cos"),
                # NEGATED id: array_max orders by (cos, id) and we want
                # the LOWEST cell id to win cosine ties
                F.lit(-ci).alias("negid"),
            ))
        return out

    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    best = F.array_max(F.array(*[s for s in cell_scores(vec_d)]))
    c = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("neighbor_id"),
        vec_d.alias("c_vec"),
        (-best.getField("negid")).cast("int").alias("cell"),
    )

    ranked = F.array_sort(
        F.array(*cell_scores(vec_d)),
        lambda a, b: F.when(a.getField("cos") > b.getField("cos"), -1)
        .when(a.getField("cos") < b.getField("cos"), 1)
        .otherwise(F.signum(b.getField("negid") - a.getField("negid")).cast("int")),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        vec_d.alias("q_vec"),
        F.explode(
            F.transform(F.slice(ranked, 1, n_probe), lambda s: (-s.getField("negid")).cast("int"))
        ).alias("cell"),
    )

    cand = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", S.cosine(F.col("q_vec"), F.col("c_vec")))
    )
    if score_decimals is not None:
        cand = cand.withColumn("score", F.round("score", score_decimals))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def lcg_centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Deterministic rational centroids from the shared LCG family."""
    return lcg_planes(1, n_cells, dim)[0]
