"""Vector workload over ``embeddings``: similarity search + vector
aggregation — the ANN surface of a training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import similarity as S
from ..operators import similarity_search as ANN
from ..sources.io import load_table
from .catalog import QuerySpec, ratio6, ratio6_sql, register


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


# --- ann_lsh_topk: random-hyperplane LSH approximate top-k ----------------
# The operator's hyperplanes come from the shared LCG rational family
# (similarity_search.lcg_planes), so buckets, candidate sets, scores
# and ranks are all reproducible in SQL — the query is fully
# value-verified despite being an approximate algorithm.

_LSH_TABLES, _LSH_BITS, _LSH_DIM, _LSH_K = 4, 8, 64, 10


def _ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return ANN.lsh_ann_topk(
        e, queries, "vec_id", "embedding",
        dim=_LSH_DIM, k=_LSH_K, tables=_LSH_TABLES, bits=_LSH_BITS,
        score_decimals=6,
    ).withColumn("rnk", F.col("rnk").cast("int"))


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
    ("vector", "agg", "bench"),
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


# --- ann_lsh_exact: LSH ANN with deterministic hyperplanes, oracled -------
# A lighter-parameter twin of ann_lsh_topk built directly from column
# expressions (no operator indirection), sharing the same LCG
# rational plane family: bucket keys, candidate sets, scores and
# ranks are all hash-compared. 2 tables x 6 sign bits over 64 dims;
# sign taken on the 6dp-rounded dot so a last-bit double difference
# can never flip a bucket.

_LSHX_TABLES, _LSHX_BITS, _LSHX_DIM, _LSHX_K = 2, 6, 64, 10


def _lshx_planes() -> list[list[list[float]]]:
    return ANN.lcg_planes(_LSHX_TABLES, _LSHX_BITS, _LSHX_DIM)


def _lshx_keys_spark(vec) -> F.Column:
    planes = _lshx_planes()

    def dot_lit(plane: list[float]) -> F.Column:
        lit = F.array(*[F.lit(p) for p in plane])
        return F.aggregate(
            F.zip_with(vec, lit, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )

    cells = []
    for t in range(_LSHX_TABLES):
        bits = [
            F.when(F.round(dot_lit(planes[t][b]), 6) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for b in range(_LSHX_BITS)
        ]
        cells.append(F.struct(F.lit(t).alias("t"), F.concat(*bits).alias("k")))
    return F.array(*cells)


def _ann_lsh_exact(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings").select(
        "vec_id", F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("e")
    )
    keys = e.select(
        "vec_id", F.explode(_lshx_keys_spark(F.col("e"))).alias("bk")
    ).select("vec_id", "bk.t", "bk.k")
    q = keys.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), "t", "k"
    )
    cand = (
        q.join(keys.select(F.col("vec_id").alias("neighbor_id"), "t", "k"), ["t", "k"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    from pyspark.sql import Window

    scored = (
        cand.join(e.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe")), "query_id")
        .join(e.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("ce")), "neighbor_id")
        .withColumn("score", F.round(S.cosine(F.col("qe"), F.col("ce")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= _LSHX_K)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def _lsh_oracle_sql(tables: int, bits: int, dim: int, k: int) -> str:
    """SQL twin of the LCG-plane LSH ANN for any (tables, bits, dim,
    k): reproduces bucket keys bit-for-bit (rounded-dot signs over
    the shared rational planes), then candidates, scores and ranks."""
    planes = ANN.lcg_planes(tables, bits, dim)

    def key_sql(t: int) -> str:
        bit_cases = " || ".join(
            "CASE WHEN round(list_dot_product(e, ["
            + ", ".join(repr(p) for p in planes[t][b])
            + "]), 6) >= 0 THEN '1' ELSE '0' END"
            for b in range(bits)
        )
        return f"SELECT vec_id, e, {t} AS t, {bit_cases} AS k FROM v"

    keys_union = "\nUNION ALL\n".join(key_sql(t) for t in range(tables))
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
keys AS (
{keys_union}
),
q AS (SELECT vec_id AS query_id, t, k FROM keys WHERE vec_id % 50 = 0),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id
  FROM q JOIN keys c ON q.t = c.t AND q.k = c.k AND c.vec_id != q.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    round(list_cosine_similarity(qa.e, ca.e), 6) AS score
  FROM cand
  JOIN v qa ON qa.vec_id = cand.query_id
  JOIN v ca ON ca.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


register(QuerySpec(
    "ann_lsh_topk", _ann_lsh,
    _lsh_oracle_sql(_LSH_TABLES, _LSH_BITS, _LSH_DIM, _LSH_K),
    "LSH-bucketed approximate top-k via the operator path — hyperplanes "
    "from the shared LCG rational family, so the approximate result is "
    "itself fully value-verified",
    ("vector", "ann", "lsh", "bench"),
))

register(QuerySpec(
    "ann_lsh_exact", _ann_lsh_exact,
    _lsh_oracle_sql(_LSHX_TABLES, _LSHX_BITS, _LSHX_DIM, _LSHX_K),
    "LSH ANN with deterministic LCG hyperplanes — buckets, candidates, "
    "scores and ranks all value-verified (expression-level twin of the "
    "operator path)",
    ("vector", "ann", "lsh"),
))


# --- embedding_dim_stats: per-dimension moments over the whole corpus -----
# posexplode -> one shuffle keyed on the 64 dimension ids; sums are
# exact decimals (the centroid discipline extended to second moments)
# and mean/std are assembled in double at the end, so both engines
# agree bit-for-bit. The 100 TB shape: map-side partial aggregation
# reduces every partition to <=64 rows before the exchange.

def _dim_stats(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.io import fan_out

    e = fan_out(load_table(spark, sf, "embeddings"))
    d = e.select(F.posexplode("embedding").alias("dim", "v"))
    x = F.col("v").cast("double").cast("decimal(18,9)")
    m = d.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum((x * x).cast("decimal(38,18)")).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    mean = sx / n
    var = sxx / n - (sx / n) * (sx / n)
    return m.select(
        "dim",
        F.col("n"),
        F.round(mean, 6).alias("dim_mean"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 6).alias("dim_std"),
    )


_DIM_STATS_SQL = """
WITH flat AS (
  SELECT unnest(generate_series(0, len(embedding) - 1)) AS dim,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
),
m AS (
  SELECT dim, COUNT(*) AS n,
    SUM(CAST(v AS DECIMAL(18,9))) AS sx,
    SUM(CAST(CAST(v AS DECIMAL(18,9)) * CAST(v AS DECIMAL(18,9)) AS DECIMAL(38,18))) AS sxx
  FROM flat GROUP BY dim
)
SELECT dim, n,
  round(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 6) AS dim_mean,
  round(sqrt(greatest(
    CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)),
    0.0)), 6) AS dim_std
FROM m
"""

register(QuerySpec(
    "embedding_dim_stats", _dim_stats, _DIM_STATS_SQL,
    "per-dimension mean/std of the embedding corpus via posexplode + "
    "exact-decimal moments (feature-normalization statistics)",
    ("vector", "agg"),
))


# --- ann_ivf_topk: fixed-centroid IVF, fully value-verified ---------------
# The KMeans IVF path can't be oracled (trained state); this variant
# uses precomputed LCG-rational centroids — the production
# offline-trained-quantizer pattern — so cell assignment, probe sets,
# scores and ranks are all reproducible in SQL.

_IVF_CELLS, _IVF_PROBE, _IVF_DIM, _IVF_K = 8, 2, 64, 10


def _ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return ANN.ivf_topk_fixed(
        e, queries, "vec_id", "embedding",
        centroids=ANN.lcg_centroids(_IVF_CELLS, _IVF_DIM),
        n_probe=_IVF_PROBE, k=_IVF_K, score_decimals=6,
    ).withColumn("rnk", F.col("rnk").cast("int"))


def _ivf_oracle_sql(n_cells: int, n_probe: int, dim: int, k: int) -> str:
    cents = ANN.lcg_centroids(n_cells, dim)
    values = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(x) for x in c) + "])"
        for i, c in enumerate(cents)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent(cell, c) AS (VALUES {values}),
scores AS (
  SELECT vec_id, cell, round(list_cosine_similarity(e, c), 6) AS cos
  FROM v CROSS JOIN cent
),
ranked AS (
  SELECT vec_id, cell,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
  FROM scores
),
assign AS (SELECT vec_id AS neighbor_id, cell FROM ranked WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cell FROM ranked
  WHERE rn <= {n_probe} AND vec_id % 50 = 0
),
cand AS (
  SELECT DISTINCT probes.query_id, assign.neighbor_id
  FROM probes JOIN assign USING (cell)
  WHERE assign.neighbor_id != probes.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    round(list_cosine_similarity(qa.e, ca.e), 6) AS score
  FROM cand
  JOIN v qa ON qa.vec_id = cand.query_id
  JOIN v ca ON ca.vec_id = cand.neighbor_id
)
SELECT query_id, neighbor_id, score, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= {k}
"""


register(QuerySpec(
    "ann_ivf_topk", _ann_ivf,
    _ivf_oracle_sql(_IVF_CELLS, _IVF_PROBE, _IVF_DIM, _IVF_K),
    "fixed-centroid IVF ANN (offline-quantizer pattern): cell "
    "assignment, probes, scores and ranks all value-verified",
    ("vector", "ann", "ivf"),
))


# --- ann_recall_audit: measured recall@k of the approximate ANN paths -----
# The question every ANN deployment must answer before trading exact
# search for buckets: what fraction of the TRUE top-k does each
# approximate path return? Composes three already-value-verified
# queries — brute-force cosine top-k (ground truth), LSH top-k
# (4 tables x 8 bits) and fixed-centroid IVF top-k (8 cells, 2
# probes), all over the same query set and k — and counts per-query
# overlap. Ranking note (r7 ADVICE correction): every side ranks on
# the RAW double cosine (rounding to 6dp happens only on output),
# matching the DuckDB oracles' ORDER BY raw s. That is engine-stable
# here because both engines compute the score as the same left-to-
# right IEEE-754 fold over the same parquet-read doubles — scores are
# bit-identical, so raw comparison is exact; decimal ROUNDING is
# itself the engine-fragile op (Spark rounds the exact decimal
# expansion, DuckDB rounds after an inexact x1e6 multiply — the
# ratio6 rationale), so it is deliberately kept OUT of the ordering
# path. The brute/LSH/IVF component queries have hash-verified this
# premise since round 3: their gate rows hash the scores themselves,
# so any fold divergence would redden those rows before it could
# silently flip a rank here. Neighbor-id tie-breaks keep exact-tie
# ordering deterministic. At 100 TB the
# shape is unchanged: the approximate paths never do all-pairs work,
# the truth side is a k-bounded broadcast-query pass you run on a
# SAMPLE of queries (here the query set already is the 1-in-50
# sample), and the hit joins move only (query_id, neighbor_id) pairs
# bounded by k per query.

def _ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    exact = ANN.brute_force_topk(
        e, queries, "vec_id", "embedding", k=10, score_decimals=6
    ).select("query_id", "neighbor_id")
    lsh = ANN.lsh_ann_topk(
        e, queries, "vec_id", "embedding",
        dim=_LSH_DIM, k=_LSH_K, tables=_LSH_TABLES, bits=_LSH_BITS,
        score_decimals=6,
    ).select("query_id", "neighbor_id")
    ivf = ANN.ivf_topk_fixed(
        e, queries, "vec_id", "embedding",
        centroids=ANN.lcg_centroids(_IVF_CELLS, _IVF_DIM),
        n_probe=_IVF_PROBE, k=_IVF_K, score_decimals=6,
    ).select("query_id", "neighbor_id")

    # Every post-ANN relation is k-bounded (n_queries * k rows), and
    # all sides are duplicate-free on (query_id, neighbor_id): two
    # broadcast left joins flag each true neighbor as found-by-LSH /
    # found-by-IVF (no fanout), and ONE aggregation produces counts
    # and hits — the composition adds a single shuffle beyond the
    # three pipelines' own.
    flagged = (
        exact
        .join(F.broadcast(lsh.withColumn("inl", F.lit(1))),
              ["query_id", "neighbor_id"], "left")
        .join(F.broadcast(ivf.withColumn("ini", F.lit(1))),
              ["query_id", "neighbor_id"], "left")
    )
    j = flagged.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum(F.coalesce("inl", F.lit(0))).cast("long").alias("lsh_hits"),
        F.sum(F.coalesce("ini", F.lit(0))).cast("long").alias("ivf_hits"),
    )
    return j.select(
        "query_id", "n_exact", "lsh_hits", "ivf_hits",
        ratio6("lsh_hits", "n_exact").alias("lsh_recall"),
        ratio6("ivf_hits", "n_exact").alias("ivf_recall"),
    )


_ANN_RECALL_SQL = f"""
WITH exact_raw AS ({_ANN_SQL}),
exact AS (SELECT query_id, neighbor_id FROM exact_raw),
lsh_raw AS ({_lsh_oracle_sql(_LSH_TABLES, _LSH_BITS, _LSH_DIM, _LSH_K)}),
ivf_raw AS ({_ivf_oracle_sql(_IVF_CELLS, _IVF_PROBE, _IVF_DIM, _IVF_K)}),
base AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY 1),
hl AS (
  SELECT x.query_id, COUNT(*) AS lh FROM exact x
  JOIN lsh_raw l ON x.query_id = l.query_id AND x.neighbor_id = l.neighbor_id
  GROUP BY 1
),
hi AS (
  SELECT x.query_id, COUNT(*) AS ih FROM exact x
  JOIN ivf_raw i ON x.query_id = i.query_id AND x.neighbor_id = i.neighbor_id
  GROUP BY 1
)
SELECT b.query_id, b.n_exact,
  CAST(COALESCE(hl.lh, 0) AS BIGINT) AS lsh_hits,
  CAST(COALESCE(hi.ih, 0) AS BIGINT) AS ivf_hits,
  {ratio6_sql('COALESCE(hl.lh, 0)', 'b.n_exact')} AS lsh_recall,
  {ratio6_sql('COALESCE(hi.ih, 0)', 'b.n_exact')} AS ivf_recall
FROM base b
LEFT JOIN hl ON b.query_id = hl.query_id
LEFT JOIN hi ON b.query_id = hi.query_id
"""

register(QuerySpec(
    "ann_recall_audit", _ann_recall, _ANN_RECALL_SQL,
    "measured recall@k of the LSH and fixed-centroid-IVF ANN paths vs "
    "brute-force cosine ground truth (per-query hit counts, exact-"
    "integer recall ratios — the accuracy/cost dial every ANN "
    "deployment tunes)",
    ("vector", "ann", "audit"),
))


# --- ann_cosine_range: threshold range search (broadcast queries) ---------
# The range-query sibling of ann_cosine_topk: ALL corpus vectors with
# rounded cosine above a threshold per query (radius search — the
# shape dedup-by-embedding and retrieval filtering use). The corpus
# never shuffles (broadcast query set, narrow scan). The threshold
# 0.200001 sits strictly between 6-dp grid points so the comparison
# can never land on a rounding boundary.

def _ann_range(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("score", F.round(S.cosine(F.col("qe"), F.col("embedding")), 6))
        .filter(F.col("score") >= 0.200001)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "score")
    )


_ANN_RANGE_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 97 = 0)
SELECT q.query_id, c.vec_id AS neighbor_id,
  round(list_cosine_similarity(q.qe::DOUBLE[], c.embedding::DOUBLE[]), 6) AS score
FROM embeddings c CROSS JOIN q
WHERE c.vec_id != q.query_id
  AND round(list_cosine_similarity(q.qe::DOUBLE[], c.embedding::DOUBLE[]), 6) >= 0.200001
"""

register(QuerySpec(
    "ann_cosine_range", _ann_range, _ANN_RANGE_SQL,
    "cosine range search: every neighbor above the threshold per "
    "query (broadcast query set, corpus never shuffles)",
    ("vector", "ann"),
))


# --- embedding_quantization_stats: int8 quantization error audit ----------
# The vector-compression pre-check a 100 TB embedding store needs:
# per-dimension symmetric int8 scale (max|x|/127) and the mean
# floor-quantization reconstruction error. Error sums are quantized
# to integer nano-units BEFORE aggregation (sum of raw doubles is
# partition-order dependent); every double step (max, /, floor, *)
# is a single correctly-rounded IEEE op, identical on both engines.
# The 64-row scale table is broadcast — the corpus never shuffles.

def _quant_stats(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    el = e.select(F.posexplode("embedding").alias("pos", "xf")).select(
        (F.col("pos") + 1).alias("dim"), F.col("xf").cast("double").alias("x")
    )
    sc = el.groupBy("dim").agg(
        (F.max(F.abs(F.col("x"))) / 127).alias("scale"),
        F.count(F.lit(1)).alias("n"),
    )
    err = (
        el.join(F.broadcast(sc), "dim")
        .filter(F.col("scale") > 0)
        .withColumn(
            "eu",
            F.expr(
                "CAST(floor((x - floor(x / scale) * scale) * 1000000000) AS BIGINT)"
            ),
        )
    )
    return (
        err.groupBy("dim", "scale", "n")
        .agg(F.sum("eu").alias("s"))
        .withColumn("mae_nano", F.col("s").cast("double") / F.col("n"))
        .select("dim", "scale", "n", "mae_nano")
    )


_QUANT_SQL = """
WITH el AS (
  SELECT unnest(range(1, len(embedding) + 1)) AS dim,
    CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
sc AS (
  SELECT dim, MAX(abs(x)) / 127 AS scale, COUNT(*) AS n FROM el GROUP BY dim
),
err AS (
  SELECT e.dim, s.scale, s.n,
    CAST(floor((e.x - floor(e.x / s.scale) * s.scale) * 1000000000) AS BIGINT) AS eu
  FROM el e JOIN sc s ON e.dim = s.dim
  WHERE s.scale > 0
)
SELECT dim, scale, n, CAST(SUM(eu) AS DOUBLE) / n AS mae_nano
FROM err GROUP BY dim, scale, n
"""

register(QuerySpec(
    "embedding_quantization_stats", _quant_stats, _QUANT_SQL,
    "per-dimension int8 quantization scales + exact-integer mean "
    "reconstruction error (vector-compression audit)",
    ("vector", "agg", "bench"),
))


# --- ann_l2_topk: exact L2 nearest neighbors (metric twin) ----------------
# Same broadcast-query / corpus-never-shuffles plan as ann_cosine_topk
# with squared-L2 ordering — squared distance avoids the sqrt (same
# ordering, one less float op to diverge on). The fold is the
# sequential diff-square sum both engines execute identically.

def _ann_l2(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return ANN.brute_force_topk_l2(
        e, queries, "vec_id", "embedding", k=10, score_decimals=6
    ).withColumn("rnk", F.col("rnk").cast("int"))


_ANN_L2_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id % 50 = 0),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
    list_dot_product(
      list_transform(list_zip(q.qe, c.embedding::DOUBLE[]), p -> p[1] - p[2]),
      list_transform(list_zip(q.qe, c.embedding::DOUBLE[]), p -> p[1] - p[2])
    ) AS d
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, round(d, 6) AS dist_sq, CAST(rnk AS INT) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY d ASC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 10
"""

register(QuerySpec(
    "ann_l2_topk", _ann_l2, _ANN_L2_SQL,
    "brute-force squared-L2 top-k per query (broadcast query set, "
    "nearest-first with id tie-break)",
    ("vector", "ann"),
))


# --- embedding_pq_codes: product-quantization code histogram --------------
# The vector-compression staple: 64-dim vectors split into 4
# subspaces of 16 dims, each snapped to the nearest of 16 LCG-
# rational codebook entries. The query reports the per-(subspace,
# code) population and the summed 6dp quantization error in exact
# integer micro-units — codebook balance + distortion in one result,
# fully value-verified because assignment is engine-reproducible.

_PQ_SUB, _PQ_CODES, _PQ_SUBDIM = 4, 16, 16
_PQ_CODEBOOKS = ANN.lcg_codebooks(_PQ_SUB, _PQ_CODES, _PQ_SUBDIM)


def _pq_codes(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    assigned = ANN.pq_assign(e, "vec_id", "embedding", _PQ_CODEBOOKS)
    return (
        assigned.groupBy("subspace", "code")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(
                F.expr("CAST(floor(err * 1000000 + 0.5) AS BIGINT)")
            ).alias("err6_sum"),
        )
    )


def _pq_sql() -> str:
    cb = (
        "["
        + ", ".join(
            "[" + ", ".join(
                "[" + ", ".join(repr(x) for x in code) + "]"
                for code in sub
            ) + "]"
            for sub in _PQ_CODEBOOKS
        )
        + "]"
    )
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
subv AS (
  SELECT vec_id, s.s AS subspace,
    e[s.s * {_PQ_SUBDIM} + 1 : s.s * {_PQ_SUBDIM} + {_PQ_SUBDIM}] AS v
  FROM base, (SELECT unnest([0, 1, 2, 3]) AS s) s
),
dists AS (
  SELECT vec_id, subspace,
    list_transform(({cb})[subspace + 1], c ->
      round(list_dot_product(
        list_transform(list_zip(v, c), p -> p[1] - p[2]),
        list_transform(list_zip(v, c), p -> p[1] - p[2])), 6)) AS ds
  FROM subv
),
sel AS (
  SELECT vec_id, subspace,
    CAST(list_position(ds, list_min(ds)) - 1 AS INT) AS code,
    list_min(ds) AS err
  FROM dists
)
SELECT subspace, code, COUNT(*) AS n_vectors,
  CAST(SUM(CAST(floor(err * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS err6_sum
FROM sel GROUP BY 1, 2
"""


register(QuerySpec(
    "embedding_pq_codes", _pq_codes, _pq_sql(),
    "product-quantization assignment histogram + exact-integer "
    "distortion per (subspace, code) (16x4 LCG-rational codebooks, "
    "broadcast codebook, shuffle-free assignment)",
    ("vector", "quantization", "bench"),
))


# --- embedding_ivf_balance: index-health audit of the IVF quantizer -------
# Cell population + mean centroid affinity per cell — the check that
# tells you whether the inverted index is balanced BEFORE you build
# it over 100 TB (one hot cell = one hot partition at query time).
# Assignment reuses the engine-reproducible fixed-centroid argmax;
# affinities aggregate as exact micro-unit integers.

def _ivf_balance(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    assigned = ANN.ivf_assign(
        e, "vec_id", "embedding", ANN.lcg_centroids(_IVF_CELLS, _IVF_DIM)
    )
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(
                F.expr("CAST(floor(cos6 * 1000000 + 0.5) AS BIGINT)")
            ).alias("cos6_sum"),
        )
    )


def _ivf_balance_sql() -> str:
    cents = ANN.lcg_centroids(_IVF_CELLS, _IVF_DIM)
    values = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(x) for x in c) + "])"
        for i, c in enumerate(cents)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cent(cell, c) AS (VALUES {values}),
scores AS (
  SELECT vec_id, cell, round(list_cosine_similarity(e, c), 6) AS cos
  FROM v CROSS JOIN cent
),
assign AS (
  SELECT vec_id, cell, cos FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
    FROM scores
  ) WHERE rn = 1
)
SELECT cell, COUNT(*) AS n_vectors,
  CAST(SUM(CAST(floor(cos * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS cos6_sum
FROM assign GROUP BY cell
"""


register(QuerySpec(
    "embedding_ivf_balance", _ivf_balance, _ivf_balance_sql(),
    "IVF index-health audit: per-cell population and exact-integer "
    "mean-affinity sums over the fixed-centroid assignment",
    ("vector", "ivf", "audit"),
))


# --- embedding_cross_moments: exact E[x_i * x_j] matrix -------------------
# The covariance/PCA-whitening input: upper-triangle cross moments of
# the first _XM_DIMS dimensions. Each row fans out to D*(D+1)/2
# (i, j>=i) pairs via posexplode + an index-offset slice, products go
# through the same decimal(18,9)->decimal(38,18) discipline as
# embedding_dim_stats, and the final matrix is <=136 rows after a
# map-side-combinable aggregate. At 100 TB the fanout is bounded by
# slicing to the dims of interest, not the native width; the pair key
# space (136) keeps the exchange trivial. Together with
# embedding_dim_stats' means this is the full covariance estimate.

_XM_DIMS = 16


def _cross_moments(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.io import fan_out

    e = fan_out(load_table(spark, sf, "embeddings"))
    head = F.slice("embedding", 1, _XM_DIMS)
    d1 = e.select(F.posexplode(head).alias("i0", "vi"), head.alias("h"))
    # pairs (i, j >= i): slice the tail starting at this i
    d2 = d1.select(
        "i0", "vi",
        F.posexplode(F.expr(f"slice(h, i0 + 1, {_XM_DIMS})")).alias("j_off", "vj"),
    )
    # floor-quantize to integer micro-units BEFORE multiplying: the
    # double->decimal cast rounds half-up-on-shortest-string in Spark
    # vs half-even-on-binary in DuckDB (measured 1-ulp divergence);
    # floor(v * 1e6) is a single correctly-rounded multiply + an exact
    # floor, identical everywhere, and the integer products sum
    # exactly in DECIMAL(38,0)
    qi = F.floor(F.col("vi").cast("double") * 1000000).cast("long")
    qj = F.floor(F.col("vj").cast("double") * 1000000).cast("long")
    return (
        d2.groupBy(
            F.col("i0").alias("i"),
            (F.col("i0") + F.col("j_off")).alias("j"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((qi * qj).cast("decimal(38,0)")).cast("double")
            .alias("sxy_micro2"),
        )
    )


_XM_SQL = f"""
WITH a AS (
  SELECT vec_id, unnest(generate_series(0, {_XM_DIMS - 1})) AS i,
         unnest(embedding[1:{_XM_DIMS}]::DOUBLE[]) AS vi
  FROM embeddings
),
b AS (
  SELECT vec_id, unnest(generate_series(0, {_XM_DIMS - 1})) AS j,
         unnest(embedding[1:{_XM_DIMS}]::DOUBLE[]) AS vj
  FROM embeddings
)
SELECT a.i, b.j, COUNT(*) AS n,
  CAST(SUM(CAST(CAST(floor(a.vi * 1000000) AS BIGINT) * CAST(floor(b.vj * 1000000) AS BIGINT) AS DECIMAL(38,0))) AS DOUBLE) AS sxy_micro2
FROM a JOIN b ON a.vec_id = b.vec_id AND b.j >= a.i
GROUP BY 1, 2
"""

register(QuerySpec(
    "embedding_cross_moments", _cross_moments, _XM_SQL,
    f"exact upper-triangle cross-moment matrix of the first {_XM_DIMS} "
    "embedding dims (covariance/PCA input; bounded posexplode fanout)",
    ("vector", "agg"),
))


# --- label_centroid_similarity: class-separation audit --------------------
# Cosine similarity between per-label centroids — the quick "are my
# classes separable / which collapse together" check before training
# a probe. Exactness chain: per-(label, dim) mean = double(exact
# decimal sum)/n (one correctly-rounded division), floored to integer
# micro-units; pairwise dots/norms are exact int64 sums over dims;
# the final cosine is dot / (sqrt(na)*sqrt(nb)) — the identical
# composition of single correctly-rounded IEEE ops on identical
# integers in both engines. Scale: centroids are a (labels x dims)
# table — the heavy reduce is the same one-shuffle posexplode agg as
# embedding_dim_stats; everything after is broadcast-sized.

def _label_centroid_sim(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.io import fan_out

    e = fan_out(load_table(spark, sf, "embeddings"))
    d = e.select("label", F.posexplode("embedding").alias("dim", "v"))
    x = F.col("v").cast("double").cast("decimal(18,9)")
    cent = (
        d.groupBy("label", "dim")
        .agg(F.sum(x).alias("sx"), F.count(F.lit(1)).alias("n"))
        .select(
            "label", "dim",
            F.floor(F.col("sx").cast("double") / F.col("n") * 1000000)
            .cast("long").alias("mu"),
        )
    )
    a = cent.select(F.col("label").alias("la"), "dim", F.col("mu").alias("ma"))
    b = cent.select(F.col("label").alias("lb"), "dim", F.col("mu").alias("mb"))
    pairs = (
        a.join(b, "dim")
        .filter(F.col("la") <= F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(F.col("ma") * F.col("mb")).alias("dot"),
            F.sum(F.col("ma") * F.col("ma")).alias("na2"),
            F.sum(F.col("mb") * F.col("mb")).alias("nb2"),
        )
    )
    return pairs.select(
        "la", "lb",
        (F.col("dot").cast("double")
         / (F.sqrt(F.col("na2").cast("double"))
            * F.sqrt(F.col("nb2").cast("double")))).alias("cosine"),
    )


_LABEL_SIM_SQL = """
WITH flat AS (
  SELECT label, unnest(generate_series(0, len(embedding) - 1)) AS dim,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings
),
cent AS (
  SELECT label, dim,
    CAST(floor(CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) * 1000000) AS BIGINT) AS mu
  FROM flat GROUP BY 1, 2
),
pairs AS (
  SELECT a.label AS la, b.label AS lb,
    SUM(a.mu * b.mu) AS dot, SUM(a.mu * a.mu) AS na2, SUM(b.mu * b.mu) AS nb2
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label <= b.label
  GROUP BY 1, 2
)
SELECT la, lb, CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))) AS cosine
FROM pairs
"""

register(QuerySpec(
    "label_centroid_similarity", _label_centroid_sim, _LABEL_SIM_SQL,
    "cosine similarity matrix between per-label centroids "
    "(class-separation audit; micro-unit integer dots, single-IEEE-op "
    "cosine assembly)",
    ("vector", "agg", "join"),
))


# --- ann_hard_negatives: retrieval-based hard-negative mining -------------
# The contrastive-training data op (DPR/ANCE-style): per query, the
# most similar vectors with a DIFFERENT label. Same broadcast-query
# brute-force shape as ann_cosine_topk (the value-exact baseline the
# LSH/IVF candidate paths are audited against) plus the label
# exclusion, so the oracle is the cosine SQL with a label predicate.

def _hard_negs(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    return ANN.hard_negatives_topk(
        e, queries, "vec_id", "embedding", "label", k=5, score_decimals=6
    ).withColumn("rnk", F.col("rnk").cast("int"))


_HARD_NEG_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, label AS ql
  FROM embeddings WHERE vec_id % 50 = 0
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
    list_cosine_similarity(q.qe::DOUBLE[], c.embedding::DOUBLE[]) AS s
  FROM embeddings c CROSS JOIN q
  WHERE c.label IS DISTINCT FROM q.ql
)
SELECT query_id, neighbor_id, neighbor_label, round(s, 6) AS score,
       CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY s DESC, neighbor_id ASC) AS rnk
  FROM scored
) WHERE rnk <= 5
"""

register(QuerySpec(
    "ann_hard_negatives", _hard_negs, _HARD_NEG_SQL,
    "hard-negative mining: per-query top-5 most-similar vectors with "
    "a different label (contrastive-training negatives; broadcast "
    "query set, label filter composes with any candidate generator)",
    ("vector", "ann", "ml"),
))


# --- embedding_truncation_audit: Matryoshka retained-energy profile -------
# How much vector energy survives truncating embeddings to their
# first 4/8/16 dims (MRL-style dimension reduction: serve a prefix,
# keep most of the geometry)? Per-component x^2 is floored to exact
# nano-units BEFORE summation (the established derived-float
# convention), so group sums are order-independent integers and the
# retained-energy ratios go through ratio6 — no float accumulation
# anywhere.

_TRUNC_DIMS = (4, 8, 16)


def _trunc_audit(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    sq_nano = lambda c: F.floor(  # noqa: E731
        c.cast("double") * c.cast("double") * F.lit(1_000_000_000.0)
    ).cast("long")
    pref = {
        d: F.aggregate(
            F.slice(F.col("embedding"), 1, d),
            F.lit(0).cast("long"),
            lambda acc, x: acc + sq_nano(x),
        )
        for d in _TRUNC_DIMS
    }
    full = F.aggregate(
        F.col("embedding"), F.lit(0).cast("long"),
        lambda acc, x: acc + sq_nano(x),
    )
    per_vec = e.select(
        "label", full.alias("full_nano"),
        *[pref[d].alias(f"pref{d}_nano") for d in _TRUNC_DIMS],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum("full_nano").cast("long").alias("full_energy_nano"),
    ]
    for d in _TRUNC_DIMS:
        aggs.append(F.sum(f"pref{d}_nano").cast("long").alias(f"pref{d}_nano"))
    g = per_vec.groupBy("label").agg(*aggs)
    # ratio6 needs num * 2e6 inside int64, i.e. every energy sum below
    # ~4.6e12 nano-units per label (prefix sums are bounded by the full
    # sum, so one guard covers all four ratios). sf0.1 max label energy
    # is ~2.2e11 -> ~21x headroom; DuckDB would error loudly on BIGINT
    # overflow but non-ANSI Spark would wrap silently, so raise here
    # instead (round-6 ADVICE). assert_true yields NULL when the bound
    # holds; coalesce forwards the unchanged value — same output, loud
    # ceiling.
    guarded_full = F.coalesce(
        F.assert_true(
            F.col("full_energy_nano") < F.lit(4_600_000_000_000),
            F.lit("embedding_truncation_audit: label energy exceeds "
                  "ratio6 int64 headroom — rescale to micro-units"),
        ).cast("long"),
        F.col("full_energy_nano"),
    ).alias("full_energy_nano")
    return g.select(
        "label", "n_vectors", guarded_full,
        *[F.col(f"pref{d}_nano") for d in _TRUNC_DIMS],
        *[ratio6(f"pref{d}_nano", "full_energy_nano").alias(f"retained{d}")
          for d in _TRUNC_DIMS],
    )


_TRUNC_PREFS = ",\n  ".join(
    f"CAST(SUM(list_sum(list_transform(embedding[1:{d}], "
    f"x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)))) AS BIGINT)"
    f" AS pref{d}_nano"
    for d in _TRUNC_DIMS
)
_TRUNC_RATIOS = ",\n  ".join(
    ratio6_sql(f"pref{d}_nano", "full_energy_nano") + f" AS retained{d}"
    for d in _TRUNC_DIMS
)
_TRUNC_SQL = f"""
WITH g AS (
  SELECT label,
    CAST(count(*) AS BIGINT) AS n_vectors,
    CAST(SUM(list_sum(list_transform(embedding,
      x -> CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000000.0) AS BIGINT)))) AS BIGINT)
      AS full_energy_nano,
    {_TRUNC_PREFS}
  FROM embeddings GROUP BY label
)
SELECT label, n_vectors, full_energy_nano,
  pref4_nano, pref8_nano, pref16_nano,
  {_TRUNC_RATIOS}
FROM g
"""

register(QuerySpec(
    "embedding_truncation_audit", _trunc_audit, _TRUNC_SQL,
    "Matryoshka truncation audit: retained squared-norm energy of "
    "4/8/16-dim embedding prefixes per label (exact nano-unit "
    "integers, ratio6 shares)",
    ("vector", "agg"),
))


# --- embedding_kmeans_exact: bit-exact distributed Lloyd (round-7) --------
# Distributed k-means whose every step is INTEGER arithmetic, so two
# engines reproduce it bit-for-bit — the cross-engine-provable core
# of embedding-space curriculum/clustering pipelines. Floats never
# survive the first step: coordinates quantize to micro-units
# (floor(x * 1e6), one exact IEEE multiply + floor, identical on
# both engines), then shift by +2^22 so every value is non-negative
# and Spark's truncating `div` equals DuckDB's flooring `//` on the
# centroid-update means (shift cancels in all distances). Assignment
# uses the portable argmin encoding min(dist*K + cid) — strict
# lexicographic (distance, cluster-id) tie-break, no min_by/struct
# ordering semantics to trust. Seeds = vec_ids 0..K-1; empty
# clusters keep their previous centroid (COALESCE on a left join).
#
# Scale: per iteration one broadcast join of the K*64-row centroid
# table against the long-form corpus + two aggregations keyed on
# (vec_id) / (cid, j) — map-side combinable, no corpus self-join,
# centroids never leave the cluster (no driver collect between
# rounds). int64 headroom: dist <= 64 * (2*2^20)^2 ~ 2.8e14, inertia
# <= n_vec * dist — fine to ~30k vecs per the int64 ceiling; at
# corpus scale inertia would aggregate per partition into DECIMAL.

_KM_K = 4
_KM_ITERS = 2
_KM_SCALE = 1_000_000
_KM_OFFSET = 4_194_304  # 2^22 > max |x| * 1e6 for |x| < 4.19


def _km_qv(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    return e.select(
        "vec_id", F.posexplode("embedding").alias("j", "x")
    ).select(
        "vec_id", "j",
        (F.floor(F.col("x").cast("double") * _KM_SCALE).cast("long")
         + _KM_OFFSET).alias("q"),
    )


def _km_assign(qv: DataFrame, cent: DataFrame) -> DataFrame:
    d = F.col("q") - F.col("c")
    return (
        qv.join(F.broadcast(cent), "j")
        .groupBy("vec_id", "cid")
        .agg(F.sum(d * d).alias("dist"))
        .groupBy("vec_id")
        .agg(F.min(F.col("dist") * _KM_K + F.col("cid")).alias("amin"))
    )


def _embedding_kmeans(spark: SparkSession, sf: str) -> DataFrame:
    qv = _km_qv(spark, sf).localCheckpoint(eager=False)
    cent = qv.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").cast("int").alias("cid"), "j", F.col("q").alias("c")
    )
    for _ in range(_KM_ITERS):
        assign = _km_assign(qv, cent).select(
            "vec_id", (F.col("amin") % _KM_K).cast("int").alias("cid")
        )
        upd = (
            qv.join(assign, "vec_id")
            .groupBy("cid", "j")
            .agg(F.expr("sum(q) div count(1)").alias("c_new"))
        )
        cent = (
            cent.withColumnRenamed("c", "c_old")
            .join(upd, ["cid", "j"], "left")
            .select(
                "cid", "j", F.coalesce("c_new", "c_old").alias("c")
            )
            .localCheckpoint(eager=False)
        )
    final = _km_assign(qv, cent).select(
        "vec_id",
        (F.col("amin") % _KM_K).cast("int").alias("cluster_id"),
        F.expr(f"amin div {_KM_K}").alias("dist"),
    )
    profile = final.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("dist").cast("long").alias("inertia"),
    )
    cent01 = cent.filter(F.col("j") < 2).groupBy("cid").agg(
        (F.max(F.when(F.col("j") == 0, F.col("c"))) - _KM_OFFSET)
        .cast("long").alias("c_dim0"),
        (F.max(F.when(F.col("j") == 1, F.col("c"))) - _KM_OFFSET)
        .cast("long").alias("c_dim1"),
    )
    return profile.join(
        cent01, profile["cluster_id"] == cent01["cid"]
    ).select("cluster_id", "n_members", "inertia", "c_dim0", "c_dim1")


def _km_assign_sql(qv: str, cent: str, out: str) -> str:
    return f"""
{out} AS MATERIALIZED (
  SELECT vec_id, MIN(dist * {_KM_K} + cid) AS amin FROM (
    SELECT q.vec_id, c.cid, SUM((q.q - c.c) * (q.q - c.c)) AS dist
    FROM {qv} q JOIN {cent} c ON q.j = c.j GROUP BY 1, 2
  ) GROUP BY vec_id
)"""


def _km_update_sql(qv: str, assign: str, prev: str, out: str) -> str:
    return f"""
{out} AS MATERIALIZED (
  SELECT p.cid, p.j, COALESCE(u.cn, p.c) AS c
  FROM {prev} p LEFT JOIN (
    SELECT CAST(a.amin % {_KM_K} AS INT) AS cid, q.j,
           SUM(q.q) // COUNT(*) AS cn
    FROM {qv} q JOIN {assign} a ON q.vec_id = a.vec_id GROUP BY 1, 2
  ) u ON p.cid = u.cid AND p.j = u.j
)"""


_KMEANS_SQL = (
    f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id, j,
    CAST(floor(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT) + {_KM_OFFSET} AS q
  FROM (
    SELECT vec_id,
      unnest(generate_series(0, len(embedding) - 1)) AS j,
      unnest(embedding::DOUBLE[]) AS x
    FROM embeddings
  )
),
c0 AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS cid, j, q AS c FROM qv WHERE vec_id < {_KM_K}
),"""
    + ",".join(
        _km_assign_sql("qv", f"c{i}", f"a{i}")
        + ","
        + _km_update_sql("qv", f"a{i}", f"c{i}", f"c{i + 1}")
        for i in range(_KM_ITERS)
    )
    + f""",
afin AS (
  SELECT vec_id, CAST(amin % {_KM_K} AS INT) AS cluster_id,
         amin // {_KM_K} AS dist
  FROM ({_km_assign_sql("qv", f"c{_KM_ITERS}", "x").split("AS MATERIALIZED ")[1]})
),
profile AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(dist) AS BIGINT) AS inertia
  FROM afin GROUP BY 1
)
SELECT p.cluster_id, p.n_members, p.inertia,
  CAST(MAX(CASE WHEN c.j = 0 THEN c.c END) - {_KM_OFFSET} AS BIGINT) AS c_dim0,
  CAST(MAX(CASE WHEN c.j = 1 THEN c.c END) - {_KM_OFFSET} AS BIGINT) AS c_dim1
FROM profile p JOIN c{_KM_ITERS} c ON p.cluster_id = c.cid
GROUP BY 1, 2, 3
"""
)

register(QuerySpec(
    "embedding_kmeans_exact", _embedding_kmeans, _KMEANS_SQL,
    f"bit-exact distributed k-means ({_KM_ITERS} Lloyd iterations, "
    f"k={_KM_K}): micro-unit integer coordinates, portable "
    "argmin(dist*K+cid) encoding, non-negative shift so truncating "
    "and flooring integer division agree — cluster profile + first "
    "centroid coords fully value-oracled",
    ("vector", "iterative", "ml", "bench"),
))


# --- mmr_diversified_topk: MMR diversity rerank (round-10) ------------------
# The retrieval-diversity operator a training-data selection stack
# runs between recall and consumption: per probe, the pool of 20
# highest-relevance candidates is greedily reranked with the classic
# maximal-marginal-relevance rule (lambda = 0.7 as the integer pair
# 7/3), so near-duplicate candidates cannot crowd the final k — the
# per-query complement of the corpus-level max-cover selection
# already in the registry. Everything is exact int64 (micro-
# quantized dots, integer lambda weights, min-id tie-breaks), so the
# DuckDB oracle replays the greedy trajectory round by round as five
# chained CTEs; a single flipped comparison anywhere in the greedy
# loop flips the gate hash.
#
# Scale shape: relevance = broadcast-probe dot (corpus never
# shuffles); the quadratic sim matrix is confined to pool^2 = 400
# rows per probe (a constant); the k greedy rounds run over
# pool-sized frames with an eager cut per round. At 10^9 candidates
# the identical plan holds — pool bounds the rerank the way real
# stacks bound their cross-encoder stage.

_MMR_POOL = 20
_MMR_K = 5
_MMR_LAM = (7, 3)
_MMR_SCALE = 1_000_000


def _mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    e = load_table(spark, sf, "embeddings")
    # FIXED probe panel (10 probes at every tier): MMR is a per-query
    # rerank, so the probe set is workload-sized, not corpus-sized —
    # a %-only filter would grow probes with the corpus and turn the
    # exact relevance stage quadratic (measured 18.3x on the sf0.1->1
    # step before this pin; 1.8x after). Corpus-recall growth is the
    # ANN family's domain (ann_lsh_topk's bucketed path).
    probes = e.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 500))
    return ANN.mmr_rerank_topk(
        e, probes, "vec_id", "embedding",
        pool=_MMR_POOL, k=_MMR_K, lam=_MMR_LAM, scale=_MMR_SCALE,
    )


def _mmr_sql() -> str:
    lam_rel, lam_div = _MMR_LAM
    head = f"""
WITH qv AS MATERIALIZED (
  SELECT vec_id, j, CAST(floor(CAST(x AS DOUBLE) * {_MMR_SCALE}) AS BIGINT) AS q
  FROM (
    SELECT vec_id,
      unnest(generate_series(0, len(embedding) - 1)) AS j,
      unnest(embedding::DOUBLE[]) AS x
    FROM embeddings
  )
),
rel AS MATERIALIZED (
  SELECT p.vec_id AS query_id, c.vec_id, CAST(SUM(c.q * p.q) AS BIGINT) AS rel
  FROM qv c JOIN qv p USING (j)
  WHERE p.vec_id % 50 = 0 AND p.vec_id < 500 AND c.vec_id != p.vec_id
  GROUP BY 1, 2
),
pool AS MATERIALIZED (
  SELECT query_id, vec_id, rel FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
    FROM rel
  ) WHERE rn <= {_MMR_POOL}
),
sims AS MATERIALIZED (
  SELECT pa.query_id, pa.vec_id AS a, pb.vec_id AS b,
    CAST(SUM(ca.q * cb.q) AS BIGINT) AS sim
  FROM pool pa
  JOIN pool pb ON pb.query_id = pa.query_id AND pb.vec_id != pa.vec_id
  JOIN qv ca ON ca.vec_id = pa.vec_id
  JOIN qv cb ON cb.vec_id = pb.vec_id AND cb.j = ca.j
  GROUP BY 1, 2, 3
),
sel1 AS (
  SELECT query_id, vec_id, rel, CAST(rel * {lam_rel} AS BIGINT) AS score, 1 AS rnk FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
    FROM pool
  ) WHERE rn = 1
)"""
    blocks = [head]
    for r in range(2, _MMR_K + 1):
        prev = " UNION ALL ".join(
            f"SELECT query_id, vec_id FROM sel{i}" for i in range(1, r))
        blocks.append(f""",
selu{r} AS (SELECT * FROM ({prev})),
cand{r} AS (
  SELECT p.query_id, p.vec_id, p.rel,
    CAST(p.rel * {lam_rel} - MAX(s.sim) * {lam_div} AS BIGINT) AS score
  FROM pool p
  JOIN sims s ON s.query_id = p.query_id AND s.a = p.vec_id
  JOIN selu{r} su ON su.query_id = s.query_id AND su.vec_id = s.b
  LEFT JOIN selu{r} ex
    ON ex.query_id = p.query_id AND ex.vec_id = p.vec_id
  WHERE ex.vec_id IS NULL
  GROUP BY 1, 2, 3
),
sel{r} AS (
  SELECT query_id, vec_id, rel, score, {r} AS rnk FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, vec_id) AS rn
    FROM cand{r}
  ) WHERE rn = 1
)""")
    union = " UNION ALL ".join(
        f"SELECT * FROM sel{i}" for i in range(1, _MMR_K + 1))
    blocks.append(f"""
SELECT query_id, CAST(rnk AS INT) AS rnk, vec_id AS neighbor_id,
  rel, score
FROM ({union})""")
    return "".join(blocks)


register(QuerySpec(
    "mmr_diversified_topk", _mmr_rerank, _mmr_sql(),
    "maximal-marginal-relevance diversified top-k: broadcast-probe "
    "integer-dot relevance -> pool-confined pairwise sims -> k greedy "
    "MMR rounds (lambda=0.7 as exact 7/3 integers, min-id ties) — "
    "the retrieval-diversity rerank, oracle replays the greedy "
    "trajectory as chained CTEs",
    ("vector", "ann", "window", "join"),
))
