"""Connected components over duplicate-pair edges.

The dedup grouping problem (SURVEY §7.5 hard-part #1): duplicate
pairs form chains (A~B, B~C without A~C when similarity is
borderline), and keep-best must treat the whole chain as ONE group.
A single min-neighbor step mislabels chains (C would group under B
while B groups under A), so we iterate min-label propagation to a
fixpoint — the standard label-propagation CC algorithm.

Scale: each iteration is one self-join + groupBy min (two shuffles on
node id); iterations needed = graph diameter, which for dedup blocks
is small (near-cliques: 1-2; pathological chains: log-n with the
shortcut step). Lineage is truncated with localCheckpoint so plans
stay bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def _union_find_components(rows) -> dict:
    """Driver-side union-find (path halving + union by size) over a
    bounded edge list; component label = min node id, matching the
    distributed path's contract exactly."""
    parent: dict = {}
    size: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = parent[r]
        return r

    for a, b in rows:
        for v in (a, b):
            if v not in parent:
                parent[v] = v
                size[v] = 1
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]
    # min node id per root -> label every node with its root's min
    root_min: dict = {}
    for v in parent:
        r = find(v)
        m = root_min.get(r)
        root_min[r] = v if m is None or v < m else m
    return {v: root_min[find(v)] for v in parent}


def connected_components(
    edges: DataFrame,
    src: str = "m",
    dst: str = "n",
    max_iter: int = 20,
    small_graph_max_edges: int = 1_000_000,
) -> DataFrame:
    """Label propagation to fixpoint. ``edges`` holds undirected pairs
    (any orientation). Returns (node, component) where component is
    the minimum node id reachable; only nodes appearing in edges are
    returned (isolated nodes are the caller's passthrough).

    Small-graph fast path (round-9: the docs_dedup_cluster_sizes
    lean-bench mover): when the materialized edge set is at most
    ``small_graph_max_edges`` rows, components are computed with a
    driver-side union-find over ONE bounded collect (the documented
    exception class — same posture as the ANN operators' bounded
    query-side collect) instead of ~10 scheduler-bound stages per
    propagation round. The bound is checked on the ACTUAL count, the
    collect is at most ~16 bytes/edge (16 MB at the default cap), and
    the label contract (component = min reachable node id) is
    identical, property-tested against the distributed path. Above
    the threshold — the real 100 TB regime — the distributed
    iteration runs unchanged. Pass ``small_graph_max_edges=0`` to
    force the distributed path.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # materialize the (half) edge set ONCE: without this the whole
    # upstream pair-generation (blocking join + similarity filter)
    # re-executes inside every propagation iteration / the collect.
    half = e.localCheckpoint()
    if half.count() <= small_graph_max_edges:
        rows = half.collect()  # bounded by the count check just above
        labels = _union_find_components((r[0], r[1]) for r in rows)
        spark = edges.sparkSession
        # schema from the UNION of both endpoint columns: src and dst
        # may differ in width (int vs long) and component labels can
        # come from either side, so a src-only schema could mistype or
        # reject dst-sourced labels (round-9 advice fix) — the union
        # coerces to the common type, mirroring the distributed
        # path's sym union
        node_t = half.select(F.col("a").alias("node")).union(
            half.select(F.col("b"))).schema["node"].dataType
        out_schema = StructType([
            StructField("node", node_t), StructField("component", node_t),
        ])
        return spark.createDataFrame(
            list(labels.items()), schema=out_schema)
    sym = half.union(half.select(F.col("b").alias("a"), F.col("a").alias("b"))).localCheckpoint()
    # initial label: min(self, direct neighbors)
    labels = (
        sym.union(sym.select("a", F.col("a").alias("b")))
        .groupBy("a")
        .agg(F.min("b").alias("label"))
        .withColumnRenamed("a", "node")
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # propagate: my new label = min(my label, neighbors' labels)
        neigh = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
            .withColumnRenamed("a", "node")
        )
        prop = labels.join(neigh, "node", "left").select(
            "node",
            F.col("label").alias("old_label"),
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
        )
        # pointer-jumping shortcut: follow my label's own label, which
        # halves chain depth each round — convergence in O(log diameter)
        # instead of O(diameter), so long duplicate chains can't outrun
        # max_iter silently.
        parent = prop.select(F.col("node").alias("p_node"), F.col("label").alias("p_label"))
        new_labels = (
            prop.join(parent, prop.label == parent.p_node, "left")
            .select(
                "node",
                "old_label",
                F.least(F.col("label"), F.coalesce(F.col("p_label"), F.col("label"))).alias("label"),
            )
            # the convergence flag rides the SAME materialization — the
            # changed-check below is a scan of checkpointed data, not
            # another old-vs-new join job.
            .withColumn("changed", F.col("label") != F.col("old_label"))
            .localCheckpoint()
        )
        labels = new_labels.select("node", "label")
        if new_labels.filter(F.col("changed")).limit(1).count() == 0:
            break
    else:
        # never return silently-wrong component labels: unconverged
        # labels split one true component into several groups.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations"
        )
    return labels.select("node", F.col("label").alias("component"))


def degrees(edges: DataFrame, src: str = "m", dst: str = "n") -> DataFrame:
    """(node, degree) over an undirected edge set (each edge stored
    once, any orientation). One symmetric union + one shuffle."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    return sym.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("degree"))


def triangle_count(edges: DataFrame, src: str = "m", dst: str = "n") -> DataFrame:
    """Global triangle count over an undirected edge set.

    Edges are canonicalized to a < b, so each triangle a<b<c is found
    exactly once by the classic two-join enumeration: (a,b) joins
    (b,c) to form a wedge, closed by (a,c). Both joins are equi-joins
    Catalyst can shuffle-partition on the wedge midpoint/endpoints —
    the standard distributed formulation; degeneracy-order or
    high-degree-vertex splitting are the levers if a 100 TB graph has
    celebrity nodes.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(closing, ["x", "z"])
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank_exact(
    edges: DataFrame,
    src: str = "m",
    dst: str = "n",
    iterations: int = 5,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge set in EXACT
    int64 arithmetic, so an external SQL engine unrolling the same
    iterations reproduces every rank bit-for-bit (no float drift, no
    partition-order dependence — the catalog's determinism rules).

    Ranks live in integer units of ``1/scale``: r0 = scale div n;
    each iteration r' = tele + (damping_pct * sum_in(r div deg)) div 100
    with tele = ((100-damping_pct) * (scale div n)) div 100. Every op
    is integer division/multiplication/sum — identical on any engine.
    Bounds: damping_pct * total_rank <= 85 * scale ~ 8.5e13 << int64.

    Scale: per iteration = one equi-join (contrib flow along edges) +
    one groupBy sum — two shuffles on node id; the symmetric edge set
    and degree table are materialized once (lazy checkpoint) instead
    of re-deriving the upstream pair-generation every iteration.
    Iteration count is fixed (power-method truncation), not
    data-dependent, so the plan depth is bounded by construction.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=False)
    deg = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=False)
    )
    n = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    base = (
        deg.crossJoin(F.broadcast(n))
        .select(
            "node", "degree",
            F.expr(f"{scale} div n_nodes").alias("rank"),
            F.expr(
                f"({100 - damping_pct} * ({scale} div n_nodes)) div 100"
            ).alias("tele"),
        )
        .localCheckpoint(eager=False)
    )
    ranks = base
    for _ in range(iterations):
        contrib = ranks.select(
            F.col("node").alias("a"), F.expr("rank div degree").alias("contrib")
        )
        inflow = (
            sym.join(contrib, "a")
            .groupBy(F.col("b").alias("node"))
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            base.select("node", "degree", "tele")
            .join(inflow, "node", "left")
            .select(
                "node", "degree", "tele",
                (
                    F.col("tele")
                    + F.expr(f"({damping_pct} * coalesce(inflow, 0)) div 100")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "rank")


def triangles_per_node(edges: DataFrame, src: str = "m", dst: str = "n") -> DataFrame:
    """(node, n_tri): triangles incident to each node.

    Same canonical a<b<c two-join enumeration as
    :func:`triangle_count`; each triangle (x, y, z) then credits all
    three corners via a 3-wide inline explode (no extra shuffle beyond
    the final count). Nodes in no triangle are absent — callers join
    against the degree table and coalesce to 0.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y")
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = wedges.join(closing, ["x", "z"])
    corners = tri.select(
        F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
    )
    return corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))


def kcore(
    edges: DataFrame,
    src: str = "m",
    dst: str = "n",
    k: int = 3,
    max_iter: int = 8,
) -> DataFrame:
    """The k-core of an undirected graph: (node, core_degree) for the
    maximal subgraph where every node keeps degree >= k.

    Iterative peel: drop all nodes of degree < k, recompute degrees on
    the induced subgraph, repeat to fixpoint. Each iteration is one
    degree aggregate plus two semi-joins on the surviving node set —
    bounded shuffles on a monotonically SHRINKING edge set, with
    localCheckpoint truncating the growing lineage (same discipline as
    connected_components). Deterministic: the result is a set fixpoint
    independent of execution order.

    Raises on non-convergence within ``max_iter`` so a fixed-unroll
    oracle (the DuckDB twin chains ``max_iter`` peels as CTEs) is
    guaranteed to agree: once stable, extra peels are identity.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = sym.count()
    for _ in range(max_iter):
        keep = (
            sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("u")
        )
        nxt = (
            sym.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        if n_next == n_edges:
            return sym.groupBy(F.col("u").alias("node")).agg(
                F.count(F.lit(1)).alias("core_degree")
            )
        sym, n_edges = nxt, n_next
    raise RuntimeError(
        f"kcore(k={k}) did not converge in {max_iter} peels; raise max_iter "
        "(and widen the oracle unroll to match)"
    )


def min_label_propagation(
    edges: DataFrame,
    src: str = "m",
    dst: str = "n",
    rounds: int = 3,
) -> DataFrame:
    """(node, label) after ``rounds`` SYNCHRONOUS min-label steps:
    label_0(v) = v; label_{i+1}(v) = min(label_i(v), min over
    neighbors u of label_i(u)). After k rounds label(v) is exactly
    the minimum node id in v's k-hop ball — a closed form that makes
    the fixed-round run externally value-checkable (unlike
    propagate-to-convergence, whose round count is data-dependent;
    for full components see :func:`connected_components`, which adds
    the doubling shortcut).

    Scale: each round is one shuffle-join on the edge key + one
    min-aggregation on node — the same per-iteration shape as
    ``pagerank_exact``, state is one (node, label) row per node,
    lineage truncated per round.
    """
    from pyspark.sql import functions as F

    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        prop = sym.join(
            labels, sym["v"] == labels["node"]
        ).select(sym["u"].alias("node"), "label")
        labels = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels
