"""Iterative graph analytics over the co-purchase graph: PageRank.

The remaining graph capability after triangles/degrees/components
(relational_extra2.py, operators/graph.py): an iterative power-method
algorithm whose per-iteration plan is a join + an aggregation. The
exact-int64 formulation (operators/graph.pagerank_exact) makes a
fixed-iteration run fully DuckDB-oracled — the oracle unrolls the
same five iterations as chained CTEs with identical integer
arithmetic, so ranks match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank_exact
from .catalog import QuerySpec, register
from .relational_extra2 import copurchase_pairs

_PR_ITER = 5
_PR_SCALE = 10**12
_PR_DAMP = 85
_PR_TOPN = 20


def _pagerank(spark: SparkSession, sf: str) -> DataFrame:
    pairs = copurchase_pairs(spark, sf)
    ranks = pagerank_exact(
        pairs, "pa", "pb",
        iterations=_PR_ITER, scale=_PR_SCALE, damping_pct=_PR_DAMP,
    )
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(_PR_TOPN)
        .select("node", "rank")
    )


def _pr_iteration_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS (
  SELECT b.node, b.degree, b.tele,
         b.tele + ({_PR_DAMP} * COALESCE(i.inflow, 0)) // 100 AS rank
  FROM (SELECT node, degree, tele FROM {prev}) b
  LEFT JOIN (
    SELECT s.b AS node, CAST(SUM(c.contrib) AS BIGINT) AS inflow
    FROM sym s
    JOIN (SELECT node, rank // degree AS contrib FROM {prev}) c
      ON s.a = c.node
    GROUP BY s.b
  ) i ON b.node = i.node
)"""


_PAGERANK_SQL = (
    f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 20 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS (SELECT pa AS a, pb AS b FROM e UNION ALL SELECT pb, pa FROM e),
deg AS (SELECT a AS node, COUNT(*) AS degree FROM sym GROUP BY a),
nn AS (SELECT COUNT(*) AS n_nodes FROM deg),
r0 AS (
  SELECT d.node, d.degree,
         ({_PR_SCALE} // nn.n_nodes) AS rank,
         (({100 - _PR_DAMP} * ({_PR_SCALE} // nn.n_nodes)) // 100) AS tele
  FROM deg d, nn
),"""
    + ",".join(
        _pr_iteration_sql(f"r{i}", f"r{i + 1}") for i in range(_PR_ITER)
    )
    + f"""
SELECT node, CAST(rank AS BIGINT) AS rank FROM r{_PR_ITER}
ORDER BY rank DESC, node ASC LIMIT {_PR_TOPN}
"""
)

register(QuerySpec(
    "copurchase_pagerank", _pagerank, _PAGERANK_SQL,
    f"{_PR_ITER}-iteration exact-int64 PageRank over the co-purchase "
    "graph, top-20 parts by rank (iterative join+agg per step, "
    "edge/degree tables materialized once)",
    ("graph", "iterative", "bench"),
))


# --- copurchase_clustering: local clustering coefficients -----------------
# Per-node local clustering coefficient over the co-purchase graph:
# cc(v) = 2 * tri(v) / (deg(v) * (deg(v) - 1)) for deg >= 2 — the
# classic transitivity measure (triangle enumeration reused from
# operators/graph.triangles_per_node, degree-2+ nodes only so the
# denominator is always positive). Triangle credit and degree are pure
# integers; the coefficient goes through ratio6. At scale the cost is
# the same wedge join as the triangle count (degeneracy-order split is
# the lever for celebrity nodes); the coefficient itself adds one
# broadcast-sized join on the node id.

def _clustering(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import degrees, triangles_per_node
    from .catalog import ratio6

    pairs = copurchase_pairs(spark, sf)
    deg = degrees(pairs, "pa", "pb").filter(F.col("degree") >= 2)
    tpn = triangles_per_node(pairs, "pa", "pb")
    j = deg.join(tpn, "node", "left").select(
        "node", "degree",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
    )
    return j.select(
        "node", "degree", "n_tri",
        ratio6("2 * n_tri", "degree * (CAST(degree AS BIGINT) - 1)")
        .alias("clustering"),
    )


def _build_clustering_sql() -> str:
    from .catalog import ratio6_sql

    cc = ratio6_sql("2 * COALESCE(t.n_tri, 0)", "d.degree * (d.degree - 1)")
    return f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 20 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, COUNT(*) AS degree
  FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node
),
tri AS (
  SELECT w.x, w.y, w.z
  FROM (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e1.b = e2.a) w
  JOIN e c ON c.a = w.x AND c.b = w.z
),
tpn AS (
  SELECT node, COUNT(*) AS n_tri
  FROM (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri)
  GROUP BY node
)
SELECT d.node, d.degree, CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_tri,
  {cc} AS clustering
FROM deg d LEFT JOIN tpn t ON d.node = t.node
WHERE d.degree >= 2
"""


register(QuerySpec(
    "copurchase_clustering", _clustering, _build_clustering_sql(),
    "local clustering coefficient per node over the co-purchase graph "
    "(exact triangle credit / degree pairs, ratio6 division)",
    ("graph", "join", "agg", "bench"),
))


# --- copurchase_kcore: iterative k-core decomposition ---------------------
# The 3-core of the co-purchase graph: peel degree<3 nodes to
# fixpoint. The Spark side (operators/graph.kcore) peels until STABLE
# and raises if not converged within _KCORE_UNROLL; the oracle unrolls
# exactly _KCORE_UNROLL peels as chained CTEs — identical by the
# fixpoint argument (extra peels are identity once stable), so the
# early-stopping distributed loop is value-proven against the fixed
# unroll.

_KCORE_K = 3
_KCORE_UNROLL = 8


def _kcore_q(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import kcore

    pairs = copurchase_pairs(spark, sf)
    return kcore(pairs, "pa", "pb", k=_KCORE_K, max_iter=_KCORE_UNROLL)


def _peel_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS MATERIALIZED (
  SELECT u, v FROM {prev}
  WHERE u IN (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= {_KCORE_K})
    AND v IN (SELECT u FROM {prev} GROUP BY u HAVING COUNT(*) >= {_KCORE_K})
)"""


_KCORE_SQL = (
    """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 20 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
s0 AS MATERIALIZED (SELECT pa AS u, pb AS v FROM e UNION ALL SELECT pb, pa FROM e),"""
    + ",".join(_peel_sql(f"s{i}", f"s{i + 1}") for i in range(_KCORE_UNROLL))
    + f"""
SELECT u AS node, COUNT(*) AS core_degree FROM s{_KCORE_UNROLL} GROUP BY u
"""
)

register(QuerySpec(
    "copurchase_kcore", _kcore_q, _KCORE_SQL,
    f"iterative {_KCORE_K}-core decomposition (peel-to-fixpoint, "
    "early-stopping loop value-proven against a fixed CTE unroll)",
    ("graph", "iterative"),
))


# --- copurchase_als_latent_recs: MLlib ALS recommender --------------------
# Latent-factor top-5 per order over the implicit purchase matrix —
# the model-based complement to the exact item-item Jaccard recs
# (copurchase_jaccard_recs). Seeded/iterative float factorization has
# no cross-engine oracle (rows-only); the invariants (output grain,
# in-user score ordering, held-out hit-rate above zero, seed
# reproducibility) live in tests/test_round4_queries.py.

def _als_recs(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.recommend import als_recommendations, purchase_matrix
    from ..sources.io import load_table

    m = purchase_matrix(load_table(spark, sf, "lineitem"))
    return als_recommendations(m, k=5, max_iter=5).select(
        "user", "rec_rank", "item"
    )


register(QuerySpec(
    "copurchase_als_latent_recs", _als_recs, None,
    "implicit-feedback ALS top-5 recommendations per order (MLlib "
    "latent factors; rows-only — invariant+holdout tested)",
    ("graph", "ml", "iterative"),
))


# --- als_preference_matrix: the ALS input construction, oracled -----------
# VERDICT r5 #2c: the seeded float factorization stays rows-only, but
# everything UPSTREAM of it is exact arithmetic — the implicit
# purchase matrix (user=sampled order, item=part, strength=total
# quantity) plus the implicit-feedback confidence weighting
# c = 1 + alpha*strength that ALS(implicitPrefs=True, alpha=10)
# applies internally (Hu/Koren/Volinsky 2008, eq. 3). Oracling this
# pins the entire deterministic half of copurchase_als_latent_recs;
# strength is integer-valued (sum of integral quantities) so both the
# FLOAT strength and the DOUBLE confidence are exact on both engines.

_ALS_ALPHA = 10.0


def _als_matrix(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.recommend import purchase_matrix
    from ..sources.io import load_table

    m = purchase_matrix(load_table(spark, sf, "lineitem"))
    return m.select(
        "user", "item", "strength",
        (F.lit(1.0) + F.lit(_ALS_ALPHA) * F.col("strength").cast("double"))
        .alias("confidence"),
    )


_ALS_MATRIX_SQL = f"""
SELECT CAST(l_orderkey AS INT) AS "user",
  CAST(l_partkey AS INT) AS item,
  CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS FLOAT) AS strength,
  1.0 + {_ALS_ALPHA} * CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE)
    AS confidence
FROM lineitem WHERE l_orderkey % 20 = 0
GROUP BY 1, 2
"""

register(QuerySpec(
    "als_preference_matrix", _als_matrix, _ALS_MATRIX_SQL,
    "implicit-feedback preference/confidence matrix feeding the ALS "
    "recommender (user x item strength + 1+alpha*strength confidence) "
    "— the exact-arithmetic half of copurchase_als_latent_recs, "
    "value-oracled",
    ("graph", "ml", "agg"),
))


# --- supplier_chain_rollup: recursive CTE hierarchy traversal -------------
# The WITH RECURSIVE surface (Spark 4 recursive CTEs), value-proven
# cross-engine: suppliers form a synthetic management tree
# (parent = s_suppkey div 10, root 0 terminal), and the recursion
# walks each supplier's ancestor chain accumulating exact
# account-balance cents. Depth is bounded by log10(max key), so the
# recursion is O(log n) joins — the plan shape a hierarchy rollup
# should have at any scale. Each leaf has exactly ONE path to the
# root, so the accumulation order is deterministic and the cents sums
# are exact integers on both engines.

def _chain_rollup(spark: SparkSession, sf: str) -> DataFrame:
    from ..sources.io import load_table

    load_table(spark, sf, "supplier").createOrReplaceTempView("chain_supplier")
    return spark.sql("""
      WITH RECURSIVE chain AS (
        SELECT s_suppkey AS leaf, s_suppkey AS node,
               CAST(round(s_acctbal * 100) AS BIGINT) AS cents,
               0 AS hops
        FROM chain_supplier
        UNION ALL
        SELECT c.leaf, p.s_suppkey,
               c.cents + CAST(round(p.s_acctbal * 100) AS BIGINT),
               c.hops + 1
        FROM chain c JOIN chain_supplier p
          ON c.node > 0 AND p.s_suppkey = c.node div 10
      )
      SELECT leaf,
             CAST(max(hops) AS INT) AS depth,
             CAST(count(*) AS BIGINT) AS chain_len,
             CAST(max_by(cents, hops) AS BIGINT) AS chain_cents
      FROM chain GROUP BY leaf
    """)


_CHAIN_SQL = """
WITH RECURSIVE chain AS (
  SELECT s_suppkey AS leaf, s_suppkey AS node,
         CAST(round(s_acctbal * 100) AS BIGINT) AS cents,
         0 AS hops
  FROM supplier
  UNION ALL
  SELECT c.leaf, p.s_suppkey,
         c.cents + CAST(round(p.s_acctbal * 100) AS BIGINT),
         c.hops + 1
  FROM chain c JOIN supplier p
    ON c.node > 0 AND p.s_suppkey = c.node // 10
)
SELECT leaf,
       CAST(max(hops) AS INT) AS depth,
       CAST(count(*) AS BIGINT) AS chain_len,
       CAST(max_by(cents, hops) AS BIGINT) AS chain_cents
FROM chain GROUP BY leaf
"""

register(QuerySpec(
    "supplier_chain_rollup", _chain_rollup, _CHAIN_SQL,
    "recursive-CTE ancestor-chain rollup over a synthetic supplier "
    "hierarchy (Spark 4 WITH RECURSIVE; exact cents accumulation, "
    "O(log n) recursion depth)",
    ("relational", "iterative", "recursive"),
))


# --- copurchase_label_propagation: k-round min-label communities ----------
# Synchronous min-label propagation (round-7): after exactly k rounds
# a node's label is the smallest node id within its k-hop ball — a
# closed form the oracle can compute by unrolling k propagation CTEs
# with identical MIN arithmetic, making the iterative distributed
# loop fully value-checkable (connected_components' doubling shortcut
# converges faster but its round count is data-dependent, which is
# why ITS gate row aggregates at fixpoint instead). Communities here
# are "parts within 3 co-purchase hops of a common cheap anchor" —
# the neighborhood-blocking grain a recommender would precompute.

_LP_ROUNDS = 3


def _label_prop(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.graph import min_label_propagation

    pairs = copurchase_pairs(spark, sf)
    return min_label_propagation(pairs, "pa", "pb", rounds=_LP_ROUNDS)


def _lp_iteration_sql(prev: str, cur: str) -> str:
    return f"""
{cur} AS MATERIALIZED (
  SELECT node, MIN(label) AS label FROM (
    SELECT node, label FROM {prev}
    UNION ALL
    SELECT s.a AS node, l.label FROM sym s JOIN {prev} l ON s.b = l.node
  ) GROUP BY node
)"""


_LP_SQL = (
    """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 20 = 0),
e AS (
  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
sym AS MATERIALIZED (SELECT pa AS a, pb AS b FROM e UNION ALL SELECT pb, pa FROM e),
l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM sym),"""
    + ",".join(
        _lp_iteration_sql(f"l{i}", f"l{i + 1}") for i in range(_LP_ROUNDS)
    )
    + f"""
SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
FROM l{_LP_ROUNDS}
"""
)

register(QuerySpec(
    "copurchase_label_propagation", _label_prop, _LP_SQL,
    f"{_LP_ROUNDS}-round synchronous min-label propagation over the "
    "co-purchase graph (label = min id in the k-hop ball; join+min "
    "per round, oracle unrolls identical CTEs)",
    ("graph", "iterative"),
))
