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
    SELECT s.b AS node, SUM(c.contrib) AS inflow
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
SELECT node, rank FROM r{_PR_ITER}
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
