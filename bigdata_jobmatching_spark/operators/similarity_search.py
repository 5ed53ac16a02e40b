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


def _plane_signatures(vec: Column, planes_col: Column) -> Column:
    """Array of per-table ``'t<i>:<bits>'`` signature keys computed
    against a *column* of planes (``array<array<array<double>>>``),
    not literal expression trees: ``tables*bits*dim`` literal nodes
    made plan analysis/codegen dwarf the query itself (57 s at dim=64
    on 5k rows), while a 1-row broadcast carrying the same doubles
    keeps the plan O(1) and the arithmetic — sequential index-order
    multiply-add, identical IEEE values — unchanged, so bucket keys
    still match the SQL oracle bit-for-bit. The sign is taken on the
    6dp-rounded projection so a last-bit double difference between
    engines can never flip a bucket bit."""
    def one_bit(plane: Column) -> Column:
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        return F.when(F.round(proj, 6) >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.transform(
        planes_col,
        lambda tplanes, t: F.concat(
            F.lit("t"), t.cast("string"), F.lit(":"),
            F.array_join(F.transform(tplanes, one_bit), ""),
        ),
    )


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
    is reproducible by an external SQL oracle. The planes travel as a
    1-row broadcast (``array<array<array<double>>>``) rather than
    literal expression trees, so the plan stays O(1) nodes at any
    ``tables*bits*dim`` — wide embeddings (dim 512+) plan as fast as
    dim=64, and the signature arithmetic is byte-identical either way.
    """
    planes = lcg_planes(tables, bits, dim)
    planes_df = corpus.sparkSession.createDataFrame(
        [(planes,)], "planes array<array<array<double>>>"
    )

    def with_buckets(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        sigs = _plane_signatures(F.col(vec_col), F.col("planes"))
        return (
            fan_out(df.select(id_col, vec_col))
            .crossJoin(F.broadcast(planes_df))
            .select(
                F.col(id_col).alias(id_alias),
                F.col(vec_col).alias(vec_alias),
                F.explode(sigs).alias("bucket"),
            )
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
    cosine against a 1-row broadcast centroid table — no ML model
    object, no literal trees (``n_cells*dim`` literal nodes made plan
    analysis dominate; the broadcast carries the same doubles with an
    O(1) plan) — with the (6dp-rounded cosine, centroid id) pair as
    the order key so the assignment is engine-reproducible. With
    :func:`lcg_planes`-derived rational centroids the whole result is
    SQL-oracle-verifiable, unlike the KMeans path.

    Scale: identical to :func:`ivf_topk` — the corpus partitions by
    cell, each query reads ~n_probe/n_cells of it.
    """
    cents_df = corpus.sparkSession.createDataFrame(
        [(centroids,)], "cents array<array<double>>"
    )

    def cell_scores(vec: Column) -> Column:
        # NEGATED id: array_max orders by (cos, id) and we want the
        # LOWEST cell id to win cosine ties
        return F.transform(
            F.col("cents"),
            lambda cent, i: F.struct(
                F.round(S.cosine(vec, cent), 6).alias("cos"),
                (-i).alias("negid"),
            ),
        )

    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    best = F.array_max(cell_scores(vec_d))
    c = (
        fan_out(corpus.select(id_col, vec_col))
        .crossJoin(F.broadcast(cents_df))
        .select(
            F.col(id_col).alias("neighbor_id"),
            vec_d.alias("c_vec"),
            (-best.getField("negid")).cast("int").alias("cell"),
        )
    )

    ranked = F.array_sort(
        cell_scores(vec_d),
        lambda a, b: F.when(a.getField("cos") > b.getField("cos"), -1)
        .when(a.getField("cos") < b.getField("cos"), 1)
        .otherwise(F.signum(b.getField("negid") - a.getField("negid")).cast("int")),
    )
    q = queries.crossJoin(F.broadcast(cents_df)).select(
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


def _l2sq(a: Column, b: Column) -> Column:
    """Squared L2 distance as ONE sequential fold over the zipped
    diff (acc + d*d in index order) — the same op sequence DuckDB's
    list_dot_product(diff, diff) performs, so both engines produce
    the identical double."""
    diff = F.zip_with(a, b, lambda x, y: x.cast("double") - y.cast("double"))
    return F.aggregate(diff, F.lit(0.0), lambda acc, d: acc + d * d)


def brute_force_topk_l2(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    score_decimals: int | None = None,
) -> DataFrame:
    """Exact L2 (squared-distance) top-k — the metric twin of
    :func:`brute_force_topk`: broadcast query set, corpus never
    shuffles, nearest-first ordering with neighbor-id tie-break."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dist_sq", _l2sq(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist_sq"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "dist_sq", "rnk")
    )
    if score_decimals is not None:
        out = out.withColumn("dist_sq", F.round("dist_sq", score_decimals))
    return out


def lcg_codebooks(n_sub: int, n_codes: int, sub_dim: int) -> list[list[list[float]]]:
    """Product-quantization codebooks from the shared LCG rational
    family — [subspace][code][component], engine-exact doubles."""
    return lcg_planes(n_sub, n_codes, sub_dim)


def pq_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """Product-quantization code assignment: split each vector into
    ``len(codebooks)`` contiguous subvectors and snap each to its
    nearest codebook entry (squared L2, 6dp-rounded, lowest code id
    on ties via first-position argmin). Returns one row per
    (vector, subspace): (id, subspace, code, err).

    The codebooks ride a 1-row broadcast (same rationale as
    ivf_topk_fixed: literal trees of n_sub*n_codes*sub_dim nodes make
    analysis/codegen dominate). Assignment is a narrow projection —
    no shuffle at all; the downstream histogram groupBy touches
    (n_sub * n_codes) keys. With :func:`lcg_codebooks` rationals the
    whole assignment is SQL-oracle-reproducible.
    """
    n_sub = len(codebooks)
    sub_dim = len(codebooks[0][0])
    cb_df = corpus.sparkSession.createDataFrame(
        [(codebooks,)], "cb array<array<array<double>>>"
    )
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def one_sub(s: int) -> Column:
        sub = F.slice(vec_d, s * sub_dim + 1, sub_dim)
        dists = F.transform(
            F.col("cb").getItem(s),
            lambda c: F.round(_l2sq(sub, c), 6),
        )
        return F.struct(
            F.lit(s).alias("subspace"),
            (F.array_position(dists, F.array_min(dists)) - 1)
            .cast("int").alias("code"),
            F.array_min(dists).alias("err"),
        )

    cells = F.array(*[one_sub(s) for s in range(n_sub)])
    return (
        fan_out(corpus.select(id_col, vec_col))
        .crossJoin(F.broadcast(cb_df))
        .select(F.col(id_col), F.explode(cells).alias("pq"))
        .select(id_col, "pq.subspace", "pq.code", "pq.err")
    )


def ivf_assign(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
) -> DataFrame:
    """Cell assignment only — the index-build half of
    :func:`ivf_topk_fixed`, exposed for index-health audits:
    (id, cell, cos6) per vector, argmax 6dp-rounded cosine with
    lowest-cell-id tie-break, centroids on a 1-row broadcast. Narrow
    projection, no shuffle."""
    cents_df = corpus.sparkSession.createDataFrame(
        [(centroids,)], "cents array<array<double>>"
    )
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scores = F.transform(
        F.col("cents"),
        lambda cent, i: F.struct(
            F.round(S.cosine(vec_d, cent), 6).alias("cos"),
            (-i).alias("negid"),
        ),
    )
    best = F.array_max(scores)
    return (
        fan_out(corpus.select(id_col, vec_col))
        .crossJoin(F.broadcast(cents_df))
        .select(
            F.col(id_col),
            (-best.getField("negid")).cast("int").alias("cell"),
            best.getField("cos").alias("cos6"),
        )
    )


def hard_negatives_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 10,
    score_decimals: int | None = None,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the k most cosine-similar corpus vectors carrying a
    DIFFERENT label — the semantically-closest wrong answers that make
    the strongest training negatives (in-batch random negatives are
    mostly easy; retrieval-based hard negatives are the standard
    upgrade, cf. DPR/ANCE).

    "Different label" is null-safe (round-6 ADVICE): a NULL label
    counts as distinct from every non-NULL label, so NULL-labeled
    corpus rows remain eligible negatives for labeled queries and
    vice versa, instead of NULL-propagating out of the predicate.

    Same scale shape as :func:`brute_force_topk`: the query set is
    broadcast, the corpus streams through one narrow pass, the only
    shuffle is the per-query top-k window. Swap the corpus side onto
    the IVF/LSH candidate generators for the 100 TB path — the label
    filter composes with any candidate set.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    )
    c = fan_out(corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.col(label_col).alias("c_label"),
    ))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(~F.col("c_label").eqNullSafe(F.col("q_label")))
        .withColumn("score", S.cosine(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    out = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id",
            F.col("c_label").alias("neighbor_label"), "score", "rnk",
        )
    )
    if score_decimals is not None:
        out = out.withColumn("score", F.round("score", score_decimals))
    return out


def _quantized_long(df: DataFrame, id_col: str, vec_col: str,
                    id_alias: str, scale: int) -> DataFrame:
    """Long-form micro-quantized vectors: one (id, j, q) row per
    dimension, q = floor(x * scale) — exact integers end-to-end, so
    every dot product downstream is reproducible in an external SQL
    oracle (same convention as operators/dedup's semantic family)."""
    return df.select(
        F.col(id_col).alias(id_alias),
        F.posexplode(F.col(vec_col)),
    ).select(
        id_alias,
        F.col("pos").alias("j"),
        F.floor(F.col("col").cast("double") * scale).cast("long").alias("q"),
    )


def mmr_rerank_topk(
    vecs: DataFrame,
    probes: DataFrame,
    id_col: str,
    vec_col: str,
    pool: int = 20,
    k: int = 5,
    lam: tuple[int, int] = (7, 3),
    scale: int = 1_000_000,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k, exact and
    deterministic: per probe, take the ``pool`` highest-relevance
    candidates (integer dot products of micro-quantized vectors,
    ties to the smaller id), then greedily select ``k`` of them with
    the MMR rule — round r picks argmax of

        lam[0] * rel(cand)  -  lam[1] * max_{s in selected} sim(cand, s)

    (``lam = (7, 3)`` is the classic lambda = 0.7 scaled into
    integers; round 1 has no selected set, so it picks pure argmax
    relevance). Ties always break to the smaller candidate id, so
    the whole greedy trajectory is a pure function of the data —
    every score is an exact int64 and a SQL oracle replays the
    selection round by round.

    Returns ``(query_id, rnk, neighbor_id, rel, score)``.

    Scale shape: relevance is a broadcast-probe dot against the
    corpus (corpus never shuffles); the quadratic part — pairwise
    sims — is CONFINED to the pool (pool^2 per probe, a constant),
    and the k greedy rounds iterate over pool-sized frames with an
    eager cut per round so the plan cannot re-derive the chain. At
    10^9 candidates the same plan holds: pool bounds the rerank
    exactly the way real retrieval stacks bound their cross-encoder
    stage."""
    F_ = F
    lam_rel, lam_div = lam
    c = _quantized_long(vecs, id_col, vec_col, "vec_id_", scale)
    p = (
        _quantized_long(probes, id_col, vec_col, "query_id", scale)
        .withColumnRenamed("q", "pq")
    )
    rel = (
        c.join(F_.broadcast(p), "j")
        .filter(F_.col("vec_id_") != F_.col("query_id"))
        .groupBy("query_id", "vec_id_")
        .agg(F_.sum(F_.col("q") * F_.col("pq")).alias("rel"))
    )
    wp = Window.partitionBy("query_id").orderBy(
        F_.desc("rel"), F_.asc("vec_id_"))
    pool_df = (
        rel.withColumn("prn", F_.row_number().over(wp))
        .filter(F_.col("prn") <= pool).drop("prn")
        .localCheckpoint(eager=True)
    )
    pl = pool_df.select("query_id", "vec_id_").join(c, "vec_id_")
    a = pl.select("query_id", F_.col("vec_id_").alias("a"), "j",
                  F_.col("q").alias("qa"))
    b = pl.select("query_id", F_.col("vec_id_").alias("b"), "j",
                  F_.col("q").alias("qb"))
    sims = (
        a.join(b, ["query_id", "j"])
        # a < b, not a != b: the quantized dot is symmetric, so one
        # row per unordered pair carries the full information —
        # mmr_greedy mirrors orientations internally (halves the
        # pair fan-out, the sims exchange and the Arrow transfer)
        .filter(F_.col("a") < F_.col("b"))
        .groupBy("query_id", "a", "b")
        .agg(F_.sum(F_.col("qa") * F_.col("qb")).alias("sim"))
        .localCheckpoint(eager=True)
    )
    return mmr_greedy(pool_df, sims, k, lam).select(
        "query_id", "rnk", F_.col("vec_id_").alias("neighbor_id"),
        "rel", "score")


def mmr_greedy(
    pool_df: DataFrame,
    sims: DataFrame,
    k: int = 5,
    lam: tuple[int, int] = (7, 3),
) -> DataFrame:
    """The MMR greedy selection itself, decoupled from WHERE relevance
    and similarity come from: ``pool_df`` is ``(query_id, vec_id_,
    rel)`` (integer relevance, already pool-capped) and ``sims`` is
    ``(query_id, a, b, sim)`` with SYMMETRIC similarity, one row per
    unordered pool pair (a < b) or per ordered pair (a != b) — both
    are accepted; the greedy mirrors each row into both orientations
    (r15: callers ship a < b only, halving the sims join, exchange
    and Arrow volume) — round r picks per query the argmax of
    ``lam[0]*rel - lam[1]*max(sim to selected)``, ties to the smaller
    ``vec_id_``.

    Extracted (round 11) so embedding-dot rerank
    (:func:`mmr_rerank_topk`) and set-overlap rerank over matching
    scores (candidate_recs_diversified — the reference's declared
    'Top 20 offres-CVs' dashboard, diversified) share one greedy
    loop. Queries whose pool is smaller than ``k`` simply stop
    early (no padded rows). All scores must be exact int64 so a SQL
    oracle can replay the trajectory round by round.

    Execution shape: the pool is a CONSTANT (<= ~20 rows per query)
    by construction, so the whole k-round trajectory for one query
    is a few hundred integer ops — per-query cost must stay at that
    grain. Both relational formulations failed it, measured at sf0.1
    on candidate_recs_diversified's ~4,500 query groups: k DataFrame
    rounds with an eager-checkpoint barrier each spent ~5 s on k
    sequential global jobs, and a cogrouped applyInPandas spent
    ~8 s on one pandas-frame-construction per GROUP. This shape —
    pack each query's pool and sims into list columns (two groupBy
    shuffles), then ONE Arrow mapInPandas whose batches carry
    thousands of queries — runs the same greedy loop in plain
    python ints at ~1 s. collect_list order is nondeterministic but
    the greedy argmax with explicit (score, min-id) tie-breaks is
    order-independent, which the partition-order determinism sweep
    re-verifies. Values are bit-identical to the relational
    formulation — the SQL oracles (chained greedy CTEs) check that
    externally. At 10^9 queries this is one shuffle of pool-sized
    rows and a linear scan; no driver-side loop anywhere.

    Returns ``(query_id, vec_id_, rel, score, rnk)``."""
    from collections.abc import Iterator

    import pandas as pd

    F_ = F
    lam_rel, lam_div = lam
    # ONE exchange, not two + a sort-merge join: tag-union the pool and
    # sims rows and collect both lists in a single groupBy —
    # collect_list skips nulls, so each side's rows land only in its
    # own list. Equivalence to the old two-groupBy + left-join shape:
    # sims query_ids are a subset of pool query_ids by construction in
    # every caller (sims rows are pool self-join pairs), and a query
    # with no sims rows gets an EMPTY sitems list here where the left
    # join gave NULL — greedy_all treats both as "no sims". Plan
    # effect (r14): Exchange x2 + Sort x2 + SortMergeJoin -> 1 Exchange.
    p_type = pool_df.select(
        F_.struct("vec_id_", "rel").alias("p")).schema[0].dataType
    s_type = sims.select(
        F_.struct("a", "b", "sim").alias("s")).schema[0].dataType
    # Arrow-boundary shape (r15): ship parallel PRIMITIVE arrays, not
    # lists of structs — the struct form crossed into pandas as one
    # python dict per element (~10 pool + ~90 sims dicts per query),
    # which dominated the stage; field extraction over the collected
    # struct lists is a JVM-side transform and the arrays land in
    # pandas as flat int64 buffers. Order correspondence is preserved
    # because all fields extract from the SAME collected list.
    packed = (
        pool_df.select(
            "query_id",
            F_.struct("vec_id_", "rel").alias("p"),
            F_.lit(None).cast(s_type).alias("s"))
        .unionByName(sims.select(
            "query_id",
            F_.lit(None).cast(p_type).alias("p"),
            F_.struct("a", "b", "sim").alias("s")))
        .groupBy("query_id")
        .agg(F_.collect_list("p").alias("pitems"),
             F_.collect_list("s").alias("sitems"))
        .select(
            "query_id",
            F_.col("pitems.vec_id_").alias("p_ids"),
            F_.col("pitems.rel").alias("p_rels"),
            F_.col("sitems.a").alias("s_as"),
            F_.col("sitems.b").alias("s_bs"),
            F_.col("sitems.sim").alias("s_sims"),
        )
    )

    def greedy_all(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[tuple[int, int, int, int, int]] = []
            for qid, p_ids, p_rels, s_as, s_bs, s_sims in zip(
                    pdf["query_id"], pdf["p_ids"], pdf["p_rels"],
                    pdf["s_as"], pdf["s_bs"], pdf["s_sims"]):
                qid = int(qid)
                rel = {int(i): int(r) for i, r in zip(p_ids, p_rels)}
                sim: dict[tuple[int, int], int] = {}
                if s_as is not None:
                    # similarity is symmetric in every caller; rows may
                    # arrive unordered (one per pair) — mirror both
                    # orientations so the (cand, selected) lookup below
                    # is orientation-free. Ordered inputs (both rows
                    # present) write the same value twice — idempotent.
                    for x, y, s in zip(s_as, s_bs, s_sims):
                        x, y, s = int(x), int(y), int(s)
                        sim[(x, y)] = s
                        sim[(y, x)] = s
                remaining = set(rel)
                selected: list[int] = []
                for rnk in range(1, k + 1):
                    best = None  # ((score, -id), id, score): min-id ties
                    for cand in remaining:
                        if not selected:
                            score = rel[cand] * lam_rel
                        else:
                            pairs = [sim[(cand, s)] for s in selected
                                     if (cand, s) in sim]
                            if not pairs:
                                # mirror the relational formulation: a
                                # candidate with no sims row to any
                                # selected member joins away this round
                                continue
                            score = (rel[cand] * lam_rel
                                     - max(pairs) * lam_div)
                        key = (score, -cand)
                        if best is None or key > best[0]:
                            best = (key, cand, score)
                    if best is None:
                        break
                    _, pick, score = best
                    remaining.discard(pick)
                    selected.append(pick)
                    out.append((qid, pick, rel[pick], score, rnk))
            yield pd.DataFrame(
                out, columns=["query_id", "vec_id_", "rel", "score", "rnk"])

    return packed.mapInPandas(
        greedy_all,
        "query_id long, vec_id_ long, rel long, score long, rnk int")
