"""Physical-plan regression guards: the optimizations we rely on must
stay visible in the plans — filters pushed to the parquet scan,
column-pruned read schemas, dimension joins broadcast (never
sort-merge), partition-count fan-out on compute stages.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from bigdata_jobmatching_spark.plans.catalog import load_all

REGISTRY = load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].spark(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", plan)
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m and "l_comment" not in m.group(1)
    # only the 7 referenced columns are read
    assert len(m.group(1).split(",")) <= 7


def test_q5_all_dims_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_region_revenue")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q3_selective_filters_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_top_unshipped")
    assert re.search(r"PushedFilters: \[.*GreaterThan\(l_shipdate", plan)
    assert "TakeOrderedAndProject" in plan  # global top-k, not a full sort


def test_matching_broadcast_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "job_cv_matching")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_matching_offer_dim_not_force_broadcast(spark, sf_dir):
    # Only the CV dim carries an explicit broadcast hint; the offer dim
    # is left to AQE so an over-limit offer side degrades to a shuffle
    # join instead of killing the job at scale. Exactly ONE ResolvedHint
    # in the logical plan == no forced broadcast of o_dim.
    df = REGISTRY["job_cv_matching"].spark(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 1


def test_no_driver_collect_in_query_paths():
    # Driver-side .collect() in an operator/query path forces a
    # synchronous barrier + a second job; scalar thresholds must use
    # the broadcast-scalar crossJoin pattern instead. The single
    # allowed site is the ANN query-set broadcast (documented).
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "bigdata_jobmatching_spark"
    offenders = []
    for py in root.rglob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if ".collect()" in line.split("#")[0]:
                offenders.append((str(py.relative_to(root)), line.strip()))
    # allowed sites: the limit-bounded ANN query-set collect, the
    # state-inspection loop over a streaming query's operator METADATA
    # (bounded by plan size — a handful of operators — never by data),
    # and the connected-components small-graph union-find fast path
    # (gated on an actual count <= small_graph_max_edges, r9)
    assert sorted(offenders) == sorted([
        (
            "streaming/state_inspect.py",
            "for row in meta.collect():  # few operators per query, driver-side is fine",
        ),
        (
            "operators/similarity_search.py",
            "q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()",
        ),
        (
            "operators/graph.py",
            "rows = half.collect()  # bounded by the count check just above",
        ),
    ]), offenders


def test_keyword_catalog_is_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "keyword_catalog_tags")
    assert "BroadcastHashJoin" in plan


def test_warehouse_partition_pruning(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    from bigdata_jobmatching_spark.sources.io import load_table, write_stage

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    write_stage(ev, str(tmp_path / "t"), partition_by=("day",))
    pruned = spark.read.parquet(str(tmp_path / "t")).filter(F.col("day") == "2024-01-05")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[.*day", plan)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # Co-located fact-to-fact join: both sides bucketed on the join key
    # at write time -> the join plan contains NO Exchange. At 100 TB
    # this is the difference between reading co-located files and
    # re-shuffling the whole fact table on every join.
    from bigdata_jobmatching_spark.sources.io import load_table, write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    write_bucketed(
        orders, "b_orders", ("o_custkey",), 8,
        sort_cols=("o_custkey",), path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        cust, "b_customer", ("c_custkey",), 8,
        sort_cols=("c_custkey",), path=str(tmp_path / "b_customer"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            spark.table("b_orders")
            .join(spark.table("b_customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself must be exchange-free; the post-join groupBy
        # aggregates on a different key and may legitimately shuffle
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part
        assert "bucketed scan" in plan.lower() or "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_tfidf_vocab_broadcast_no_sortmerge(spark, sf_dir):
    # the vocabulary (df) side must broadcast; the (doc,term) fact is
    # never sort-merge joined
    plan = _plan(spark, sf_dir, "tfidf_top_terms")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_large_volume_customers_agg_broadcast(spark, sf_dir):
    # the HAVING aggregate (rare hot orders) broadcasts; orders and
    # customer never shuffle on a composite key
    plan = _plan(spark, sf_dir, "large_volume_customers")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_capped_matching_still_single_hint(spark, sf_dir):
    # the fractional-cap variant must keep the scale discipline: only
    # the CV dim is force-broadcast (plus the scalar total ride-along);
    # the offer dim stays AQE-decided
    df = REGISTRY["job_cv_matching_capped"].spark(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # broadcast hints: freq keep-set, scalar total, CV dim = 3; never
    # the offer dim (which would die at 100x)
    assert analyzed.count("ResolvedHint") == 3
    plan = _plan(spark, sf_dir, "job_cv_matching_capped")
    assert "SortMergeJoin" not in plan


def test_sequence_packing_window_partitioned(spark, sf_dir):
    # the packing cumsum must partition by source — a global
    # single-partition window would be a 100 TB deadlock
    plan = _plan(spark, sf_dir, "doc_sequence_packing")
    assert re.search(r"Window .*partitionBy.*source|Window \[.*source", plan), plan[:2000]


def test_retention_cohort_dim_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_retention_cohorts")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_ann_range_query_set_broadcast(spark, sf_dir):
    # range search must broadcast the query set: the corpus side never
    # shuffles (same invariant as ann_cosine_topk)
    plan = _plan(spark, sf_dir, "ann_cosine_range")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan.split("Broadcast")[0]


def test_containment_window_is_per_block(spark, sf_dir):
    # the top-5 ranking must partition by block — a global (empty
    # partition spec) window would single-thread 100 TB of pairs
    df = REGISTRY["docs_containment_pairs"].spark(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "windowspecdefinition(blk" in analyzed
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan


def test_path_counts_window_partitioned_by_user(spark, sf_dir):
    # sessionization windows partition by user_id, never global
    df = REGISTRY["event_path_counts"].spark(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "windowspecdefinition(user_id" in analyzed


def test_hourly_anomalies_two_narrow_aggs(spark, sf_dir):
    # the z-score plan is two hash aggregations + one equi-join on the
    # (type, hr) profile — no window, no crossJoin
    plan = _plan(spark, sf_dir, "events_hourly_anomalies")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "HashAggregate" in plan


def test_chunk_spans_no_shuffle(spark, sf_dir):
    # chunking is pure per-row arithmetic: no Exchange other than the
    # fan_out round-robin, no join, no aggregation
    plan = _plan(spark, sf_dir, "doc_chunk_spans")
    assert "HashAggregate" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 1  # fan_out only


def test_dau_wau_week_join_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "events_dau_wau")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_spend_cumedist_window_partitioned(spark, sf_dir):
    df = REGISTRY["customer_spend_cumedist"].spark(spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "windowspecdefinition(c_mktsegment" in analyzed


def test_no_new_unvetted_float_rounding():
    """Determinism lint: round() on a raw double is the round-3
    driver-gate failure class (plans/catalog.py conventions). Every
    existing F.round call site is either a ratio of exact integers, a
    score produced by an identical correctly-rounded double chain on
    both engines, or an exact-grid value — all carrying green driver
    evidence. A NEW F.round in the plans layer fails here: use
    ratio6/integer quantization, or consciously extend this allowlist
    with the same justification bar.
    """
    from pathlib import Path

    allow = {
        "analytics_queries.py": 1,   # pearson_r: identical exact-moment chain
        "dedup_queries.py": 3,       # jaccard/cosine of exact-int or identical chains
        "domain_queries.py": 7,      # money-grid rounds + matching percents
                                     # (r02 green) + cv_profile_stats salary
                                     # cents: integral-double * 100 lands
                                     # exactly on grid, no midpoint exists
                                     # + r6 lake_match_stats: one money-grid
                                     # round (same class) and one
                                     # near-integer micro round (pct*1e6 is
                                     # within 1e-9 of an int, never near .5);
                                     # the composite-score tie class is
                                     # handled by integer (…+2) div 5 instead
        "events_queries.py": 1,      # exact-grid conditional sum
        "layout_queries.py": 2,      # r9 manifest_pruning_audit + r10
                                     # bloom_point_lookup_audit: standard
                                     # money-grid cents round (2-dp price
                                     # * 100 lands on grid points, never a
                                     # midpoint — identical both engines)
        "mixing_queries.py": 2,      # quality band on exact quarters
                                     # (budget + curriculum, same banding)
        "relational_extra2.py": 4,   # share/percent of exact decimal sums
        "sketch_queries.py": 2,      # r8 log2_quantile_audit: the standard
                                     # money-grid cents round (value*100
                                     # lands on grid points, identical on
                                     # both engines — same class as the
                                     # versioned_queries rounds)
                                     # + r6 pareto price cents (2-dp money *
                                     # 100 on grid, no midpoint exists)
        "skills_queries.py": 1,      # confidence grid (r03 green)
        "text_queries.py": 1,        # tf-idf score chain (r03 green)
        "vector_queries.py": 6,      # cosine score_decimals precedent (r03 green)
        "versioned_queries.py": 4,   # r6 diff snapshots: acctbal cents
                                     # (money-grid class) in v1/v2/inserts
                                     # + r9 mor_delete_audit price cents
                                     # (same money-grid class)
    }
    plans = Path("bigdata_jobmatching_spark/plans")
    got = {
        p.name: p.read_text().count("F.round(")
        for p in sorted(plans.glob("*.py"))
        if p.read_text().count("F.round(")
    }
    assert got == allow, (
        f"F.round inventory drifted: {got} vs allowlist {allow} — "
        "new float rounding must go through ratio6 or be justified here"
    )


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    # The 100 TB pattern static pruning can't reach: the fact-side
    # partition filter only exists at runtime, derived from the dim
    # side of a join (classic star-schema "last month's hot days"
    # shape). The fact scan must carry a dynamicpruning expression in
    # its PartitionFilters — without it, a 100 TB fact table is read
    # in full before the join drops 97% of it.
    from bigdata_jobmatching_spark.sources.io import load_table, write_stage

    # NOTE the dim predicate must be a comparison: Spark's
    # PartitionPruning rule gates on isLikelySelective(), which
    # accepts comparisons/IN/LIKE but not a bare boolean attribute
    # (a `WHERE is_hot` flag filter silently disables DPP).
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    write_stage(ev, str(tmp_path / "fact"), partition_by=("day",))
    write_stage(
        ev.select("day").distinct().withColumn(
            "hotness", F.dayofmonth("day")
        ),
        str(tmp_path / "dim"),
    )
    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim = spark.read.parquet(str(tmp_path / "dim"))
    j = (
        fact.join(dim.filter("hotness = 5"), "day")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert j.count() > 0


def test_runtime_bloom_filter_on_shuffle_join(spark, sf_dir):
    # The non-partition-column twin of DPP: a selective dim-side
    # predicate builds a runtime bloom filter applied to the fact side
    # BEFORE its shuffle, cutting exchange volume ~6x here (1-of-5
    # order priorities). Local thresholds are lowered to mirror the
    # cluster-scale sizes that enable injection; the assertion is on
    # the optimized plan carrying bloom_filter_might_contain on the
    # lineitem side.
    from bigdata_jobmatching_spark.sources.io import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        # creation side: bloom_filter_agg over the filtered orders keys;
        # application side: a might_contain probe guarding the lineitem scan
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        assert j.count() == 1
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ann_constant_families_stay_out_of_the_plan(spark, sf_dir):
    # Regression guard for the round-4 fix: LSH hyperplanes / IVF
    # centroids must ride a 1-row broadcast, never literal expression
    # trees (4*8*64 literal nodes made analysis+codegen take 57 s and
    # bloated the JVM for every later query). A literal-tree relapse
    # multiplies the plan string by ~100x - pin a generous ceiling.
    for name in ("ann_lsh_topk", "ann_ivf_topk"):
        plan = _plan(spark, sf_dir, name)
        assert len(plan) < 100_000, f"{name} plan exploded: {len(plan)} chars"
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


@pytest.mark.parametrize("name", [
    # one representative per risk family: float-derived scores, window
    # ties, iterative integer flows, sketch chains, sweep-line deltas
    "source_mixing_weights", "doc_repetition_stats", "event_value_gini",
    "ann_cosine_topk", "copurchase_pagerank", "minhash_estimate_error",
    "open_orders_by_month", "user_value_twa",
])
def test_partition_order_determinism(spark, sf_dir, name):
    """The round-3 failure class as a permanent guard: each
    representative query must produce identical value-hash multisets
    under two different partitioning regimes (32 reducers/default
    splits vs 5 reducers/64k splits — maximally different merge
    orders). The full-registry sweep lives in
    tools/determinism_check.py."""
    import hashlib

    from bigdata_jobmatching_spark.plans.catalog import load_all

    spec = load_all()[name]

    def hashes(shuffle: str, split: str) -> list[str]:
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        spark.conf.set("spark.sql.files.maxPartitionBytes", split)
        try:
            df = spec.spark(spark, sf_dir)
            cols = df.columns
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            out = []
            for r in df.collect():
                t = tuple(r)
                s = "|".join(repr(t[i]) for i in order)
                out.append(hashlib.md5(s.encode()).hexdigest())
            return sorted(out)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            spark.conf.unset("spark.sql.files.maxPartitionBytes")

    assert hashes("8", "134217728") == hashes("3", "65536")


def test_oracle_types_map_exactly_onto_spark_dtypes(sf_dir):
    """The round-4 failure class as a permanent guard: DuckDB types
    SUM() over integers as HUGEINT (int128), which the external driver
    gate renders differently from Spark's BIGINT even when every value
    is bit-identical — 23 of 23 round-4 hash-fails were exactly this.
    fetchall() coerces HUGEINT to Python int, so a value-comparing
    check can never see it; DESCRIBE can. Every oracle output column
    (recursively through LIST/STRUCT) must be a DuckDB type with an
    exact Spark dtype counterpart."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.oracle_type_audit import audit

    bad = audit(sf_dir)
    assert bad == [], (
        f"{len(bad)} gate-unsafe oracle columns (wrap in CAST(... AS "
        f"BIGINT) or an exact type): {bad}"
    )


def test_oracle_audit_rejects_top_level_complex_types():
    """Round-7 blind spot, closed: the audit used to recurse into LIST
    element types and bless BIGINT[], but the driver's pandas
    canonicalizer cannot hash/sort list cells at all, so ANY top-level
    LIST/STRUCT/MAP output column is gate-incompatible by construction
    (the exact TypeError that nulled inverted_index_stats in r07)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.oracle_type_audit import type_problems

    assert type_problems("BIGINT[]") is not None
    assert type_problems("VARCHAR[]") is not None
    assert type_problems("STRUCT(a BIGINT, b VARCHAR)") is not None
    assert type_problems("MAP(VARCHAR, BIGINT)") is not None
    assert type_problems("BIGINT") is None
    assert type_problems("VARCHAR") is None


def test_oracle_audit_rejects_int128_and_scale0_decimals():
    """Round-11 blind spot, closed: the audit blessed every
    DECIMAL(p,s), but DuckDB backs p>18 decimals with int128 — the
    same storage class as the round-4 HUGEINT reds — and scale-0
    decimals render '123' vs '123.0' depending on the fetch layer.
    semantic_dedup_stats' sum_pair_dot was the registry's ONLY
    DECIMAL(38,0) column and its only two-round hash-red row; the
    proven-green DECIMAL(2,1) shape stays allowed."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.oracle_type_audit import type_problems

    assert type_problems("DECIMAL(38,0)") is not None
    assert type_problems("DECIMAL(19,2)") is not None  # int128-backed
    assert type_problems("DECIMAL(9,0)") is not None   # scale-0
    assert type_problems("DECIMAL(2,1)") is None       # proven green
    assert type_problems("DECIMAL(18,6)") is None


def test_scale0_decimal_rendering_asymmetry():
    """The mechanism the sdd_probe_dec38 canary measures, pinned as
    arithmetic fact: a scale-0 decimal renders differently between a
    Decimal-preserving fetch ('123') and any float64-converting fetch
    layer ('123.0'), while a scale>=1 decimal of the proven-green
    DECIMAL(2,1) shape renders identically both ways — which is
    exactly the observed gate pattern (every DECIMAL(2,1) query
    green, the registry's only DECIMAL(38,0) column red twice with
    rows/schema matching)."""
    from decimal import Decimal

    big = Decimal("5291587757310")  # a real sum_pair_dot value (r11)
    assert str(big) != repr(float(big))           # '...310' vs '...310.0'
    assert float(big) == int(big)                 # value survives; TEXT doesn't
    for s in ("0.5", "1.0", "0.3"):               # the DECIMAL(2,1) shape
        assert str(Decimal(s)) == repr(float(Decimal(s)))


def test_bench_plan_shapes_do_not_regress(spark, sf_dir):
    """Plan-shape regression guard: every bench-tagged query's current
    physical plan must not have MORE shuffles / cartesians / Python
    nodes / global windows / gathered exchanges / sort-merge joins or
    WIDER scans than the committed snapshot
    (tools/plan_snapshot.json — refresh with
    `python tools/plan_audit.py /root/testdata/sf0.001 --write-snapshot`
    after a deliberate, explained plan change). Catches the silent
    cost class bench wall-time only reveals noisily: a lost broadcast,
    a new exchange, a pruning-defeating projection."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, "/root/repo")
    from tools.plan_audit import REGRESSION_KEYS, audit_plans

    from bigdata_jobmatching_spark.plans.catalog import load_all

    snapshot = json.loads(
        Path("/root/repo/tools/plan_snapshot.json").read_text())
    bench_names = {n for n, s in load_all().items() if "bench" in s.tags}
    current = audit_plans(spark, names=bench_names,
                          sf_dir="/root/testdata/sf0.001")

    problems = []
    for name in sorted(bench_names):
        if name not in snapshot:
            problems.append(f"{name}: no snapshot entry — refresh the snapshot")
            continue
        for k in REGRESSION_KEYS:
            if current[name][k] > snapshot[name][k]:
                problems.append(
                    f"{name}: {k} {snapshot[name][k]} -> {current[name][k]}"
                )
    assert not problems, f"plan regressions vs snapshot: {problems}"
