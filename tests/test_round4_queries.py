"""Semantic unit tests for the round-4 additions: exact-int64
PageRank, interval tiling, TWA, SCD2 intervals, Gini, profiling.
Each pins hand-computed expectations on tiny inputs — the value-level
engine-vs-oracle check lives in tools/check_oracle.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bigdata_jobmatching_spark.operators.graph import pagerank_exact
from bigdata_jobmatching_spark.plans.catalog import load_all

REGISTRY = load_all()


def test_pagerank_one_iteration_hand_computed(spark):
    # path graph 1-2-3: deg 1,2,1; scale 1e12, n=3
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["m", "n"])
    got = {
        r["node"]: r["rank"]
        for r in pagerank_exact(edges, iterations=1).collect()
    }
    # r0 = 1e12 div 3 = 333333333333; tele = (15*333333333333) div 100
    # = 49999999999; inflow(1)=inflow(3)=333333333333 div 2,
    # inflow(2) = 2*333333333333
    assert got == {
        1: 49999999999 + (85 * 166666666666) // 100,
        2: 49999999999 + (85 * 666666666666) // 100,
        3: 49999999999 + (85 * 166666666666) // 100,
    }


def test_pagerank_mass_conservation_and_symmetry(spark):
    # star graph: hub 0 to leaves 1..4 — leaves must tie exactly
    edges = spark.createDataFrame([(0, i) for i in range(1, 5)], ["m", "n"])
    rows = pagerank_exact(edges, iterations=5).collect()
    ranks = {r["node"]: r["rank"] for r in rows}
    leaf_ranks = {ranks[i] for i in range(1, 5)}
    assert len(leaf_ranks) == 1
    assert ranks[0] > ranks[1]
    # integer truncation only ever loses mass, never creates it
    assert sum(ranks.values()) <= 10**12


def test_open_orders_interval_tiling(spark):
    from bigdata_jobmatching_spark.plans.catalog import load_all

    REG = load_all()
    df = REG["open_orders_by_month"].spark(spark, "/root/testdata/sf0.001")
    rows = {r["month"]: r for r in df.collect()}
    # spot-check one month against a direct range-predicate count
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    d = "1997-06-01"
    expect = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter((F.col("o_orderdate") <= d) & (F.col("l_shipdate") > d))
        .count()
    )
    assert rows[dt.date(1997, 6, 1)]["n_open_lines"] == expect


def test_twa_hand_computed(spark):
    from bigdata_jobmatching_spark.plans import temporal_queries as T

    # one user, values 1.00 for 10s then 3.00 for 30s -> twa 2.50
    base = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [
            (1, 10, base, "click", 1.00, "{}"),
            (2, 10, base + dt.timedelta(seconds=10), "click", 3.00, "{}"),
            (3, 10, base + dt.timedelta(seconds=40), "click", 9.99, "{}"),
        ],
        ["event_id", "user_id", "ts", "event_type", "value", "props"],
    )
    tmp = "/tmp/twa_test_events"
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = T._twa(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_segments"] == 2
    assert r["total_dur_ms"] == 40_000
    # (100*10000 + 300*30000) / 40000 = 250 cents
    assert r["twa_value"] == 2.50


def test_status_intervals_collapse_runs(spark):
    from bigdata_jobmatching_spark.plans import events_queries as E

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 7, base, "a", 0.0, "{}"),
        (2, 7, base + dt.timedelta(minutes=1), "a", 0.0, "{}"),
        (3, 7, base + dt.timedelta(minutes=2), "b", 0.0, "{}"),
        (4, 7, base + dt.timedelta(minutes=3), "a", 0.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )
    tmp = "/tmp/scd_test_events"
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = E._status_intervals(spark, tmp).orderBy("valid_from").collect()
    assert [r["status"] for r in out] == ["a", "b", "a"]
    assert out[0]["valid_from"] == base
    assert out[0]["valid_to"] == base + dt.timedelta(minutes=2)
    assert out[2]["valid_to"] is None


def test_gini_extremes(spark):
    from bigdata_jobmatching_spark.plans import analytics_queries as A

    base = dt.datetime(2024, 1, 1)  # a Monday
    rows = (
        # perfectly equal values -> gini 0
        [(i, 1, base, "eq", 5.0, "{}") for i in range(4)]
        # maximal concentration: one holder of everything
        + [(10 + i, 1, base, "max", 0.0, "{}") for i in range(3)]
        + [(20, 1, base, "max", 100.0, "{}")]
    )
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )
    tmp = "/tmp/gini_test_events"
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = {r["event_type"]: r for r in A._value_gini(spark, tmp).collect()}
    assert out["eq"]["gini"] == 0.0
    # n=4, one holder: G = (n-1)/n = 0.75
    assert out["max"]["gini"] == 0.75


def test_orders_profile_shape(spark):
    from bigdata_jobmatching_spark.plans import profiling_queries as P

    out = {
        r["col_name"]: r
        for r in P._orders_profile(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(out) == {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    }
    ok = out["o_orderkey"]
    assert ok["n_null"] == 0
    assert ok["n_distinct"] == ok["n_rows"]  # primary key
    n = ok["n_rows"]
    assert all(r["n_rows"] == n for r in out.values())  # single source scan


def test_pq_assign_ties_and_shapes(spark):
    from bigdata_jobmatching_spark.operators.similarity_search import (
        pq_assign,
    )

    # 4-dim vectors, 2 subspaces of 2 dims, 2 codes each; vector sits
    # exactly between code 0 and code 1 in subspace 1 -> tie must
    # resolve to the LOWEST code id
    cbs = [
        [[0.0, 0.0], [1.0, 1.0]],
        [[-1.0, 0.0], [1.0, 0.0]],
    ]
    df = spark.createDataFrame([(1, [0.1, 0.1, 0.0, 5.0])], ["vec_id", "embedding"])
    out = {
        (r["subspace"], ): (r["code"], r["err"])
        for r in pq_assign(df, "vec_id", "embedding", cbs).collect()
    }
    assert out[(0,)][0] == 0          # nearer to origin
    assert out[(1,)][0] == 0          # exact tie -> lowest code id
    assert abs(out[(0,)][1] - 0.02) < 1e-9


def test_l2_topk_orders_nearest_first(spark):
    from bigdata_jobmatching_spark.operators.similarity_search import (
        brute_force_topk_l2,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [3.0, 0.0]), (3, [2.0, 0.0])],
        ["vec_id", "embedding"],
    )
    q = df.filter(F.col("vec_id") == 0)
    out = brute_force_topk_l2(df, q, "vec_id", "embedding", k=3).collect()
    assert [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rnk"])] == [1, 3, 2]


def test_minhash_estimate_error_bounds(spark):
    from bigdata_jobmatching_spark.plans.catalog import load_all

    REG = load_all()
    rows = REG["minhash_estimate_error"].spark(spark, "/root/testdata/sf0.001").collect()
    assert rows, "banded candidates must exist in the test lake"
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["abs_err"] <= 1.0


def test_ewma_daily_hand_computed(spark):
    from bigdata_jobmatching_spark.plans import events_queries as E

    base = dt.datetime(2024, 1, 1)
    # three days of totals 100, 200, 400 cents for one type
    rows = [
        (1, 1, base, "t", 1.00, "{}"),
        (2, 1, base + dt.timedelta(days=1), "t", 2.00, "{}"),
        (3, 1, base + dt.timedelta(days=2), "t", 4.00, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )
    tmp = "/tmp/ewma_test_events"
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = {r["day"]: r["ewma_cents"] for r in E._ewma_daily(spark, tmp).collect()}
    # day0: only lag0 present -> 100*128/128 = 100
    assert out[dt.date(2024, 1, 1)] == 100.0
    # day1: (200*128 + 100*64) / (128+64) = 32000/192 = 166.666667
    assert out[dt.date(2024, 1, 2)] == 166.666667
    # day2: (400*128 + 200*64 + 100*32) / (128+64+32) = 67200/224 = 300
    assert out[dt.date(2024, 1, 3)] == 300.0


def test_log2_histogram_buckets(spark):
    from bigdata_jobmatching_spark.plans import events_queries as E

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, base, "t", 0.00, "{}"),    # cents 0 -> bucket 0
        (2, 1, base, "t", 0.01, "{}"),    # cents 1 -> bucket 1
        (3, 1, base, "t", 0.08, "{}"),    # cents 8 -> bucket 4
        (4, 1, base, "t", 0.15, "{}"),    # cents 15 -> bucket 4
        (5, 1, base, "t", 0.16, "{}"),    # cents 16 -> bucket 5
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type", "value", "props"]
    )
    tmp = "/tmp/log2_test_events"
    ev.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = {r["bucket"]: r["n_events"] for r in E._log2_hist(spark, tmp).collect()}
    assert out == {0: 1, 1: 1, 4: 2, 5: 1}


def test_schema_evolution_merge_read(spark, tmp_path):
    """Lake capability: two landings of the same table with an evolved
    schema (new column appended) read back as ONE table with
    mergeSchema — old rows surface NULL for the new column, and a
    projection of only old columns prunes to the original footprint."""
    p = str(tmp_path / "evolved")
    spark.createDataFrame(
        [(1, "a")], ["id", "v"]
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "v", "score"]
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 9.5
    # old-column projection still prunes (ReadSchema excludes score)
    plan = merged.select("id")._jdf.queryExecution().executedPlan().toString()
    assert "score" not in plan


def test_aqe_skew_join_splits_hot_partition(spark, tmp_path):
    """Scale guard: a join keyed on a heavily skewed column must
    produce correct results with AQE skew handling on — and the
    session enables adaptive skewJoin so Spark CAN split the hot
    partition into subpartitions at runtime. Correctness is asserted
    exactly; the plan is pinned to have run through AQE."""
    from pyspark.sql import functions as F

    # 50k rows of one hot key + 5k spread keys
    left = spark.range(55_000).select(
        F.when(F.col("id") < 50_000, F.lit(7)).otherwise(F.col("id") % 100 + 100).alias("k"),
        F.col("id").alias("lid"),
    )
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in [7] + [100 + i for i in range(100)]], ["k", "name"]
    ).hint("shuffle_hash")
    j = left.join(right, "k")
    n = j.count()
    assert n == 55_000 - 5_000 + 5_000  # every row matches exactly once
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "AdaptiveSparkPlan" in plan


def test_prefix_filter_is_lossless_vs_brute_force(spark):
    """Prefix filtering must find EXACTLY the pairs an all-pairs
    threshold join finds (the SSJoin completeness theorem,
    empirically pinned on the test lake)."""
    from bigdata_jobmatching_spark.functions import similarity as S
    from bigdata_jobmatching_spark.operators import dedup as D

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id",
        F.array_distinct(S.word_ngrams(F.col("text"), 3)).alias("sh"),
    ).filter(F.size("sh") > 0)

    fast = {
        (r["id_a"], r["id_b"])
        for r in D.prefix_filter_pairs(d, "doc_id", "sh", 4, 5).collect()
    }

    a = d.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = d.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    brute = {
        (r["id_a"], r["id_b"])
        for r in (
            a.crossJoin(b)
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("i", F.size(F.array_intersect("sa", "sb")).cast("bigint"))
            .withColumn("u", F.size(F.array_distinct(F.concat("sa", "sb"))).cast("bigint"))
            .filter(F.col("i") * 5 >= F.col("u") * 4)
            .collect()
        )
    }
    assert fast == brute
    assert brute, "test lake must contain at least one planted near-dup pair"


def test_simhash_banded_join_is_lossless(spark):
    """Pigeonhole completeness: the 4-band equi-join must surface
    every pair with Hamming distance <= 3, compared against an
    all-pairs scan of the same signatures."""
    from bigdata_jobmatching_spark.plans.catalog import load_all

    REG = load_all()
    fast = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in REG["simhash_md5_hamming_pairs"]
        .spark(spark, "/root/testdata/sf0.001").collect()
    }

    from bigdata_jobmatching_spark.functions import similarity as S

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sh3 = F.array_distinct(S.word_ngrams(F.col("text"), 3))
    sig = d.select("doc_id", S.simhash_md5(sh3, 32).alias("sh")).filter(
        F.size(sh3) > 0
    )
    a = sig.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sa"))
    b = sig.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sb"))
    brute = {
        (r["id_a"], r["id_b"], r["h"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr("CAST(bit_count(sa ^ sb) AS INT)").alias("h"))
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert fast == brute
    assert brute, "test lake must contain at least one simhash near-dup"


def test_triangles_per_node_hand_computed(spark):
    from bigdata_jobmatching_spark.operators.graph import triangles_per_node

    # K4 minus edge (3,4): triangles (1,2,3) and (1,2,4).
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], ["m", "n"]
    )
    got = {r["node"]: r["n_tri"] for r in triangles_per_node(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_clustering_coefficient_triangle_graph(spark):
    from bigdata_jobmatching_spark.operators.graph import (
        degrees,
        triangles_per_node,
    )
    from bigdata_jobmatching_spark.plans.catalog import ratio6

    # triangle 1-2-3 plus pendant 4 on node 1: cc(2)=cc(3)=1,
    # cc(1) = 2*1/(3*2) = 0.333333, pendant excluded (deg 1).
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], ["m", "n"]
    )
    deg = degrees(edges).filter(F.col("degree") >= 2)
    tpn = triangles_per_node(edges)
    j = deg.join(tpn, "node", "left").select(
        "node", "degree",
        F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("n_tri"),
    ).select(
        "node",
        ratio6("2 * n_tri", "degree * (CAST(degree AS BIGINT) - 1)")
        .alias("cc"),
    )
    got = {r["node"]: r["cc"] for r in j.collect()}
    assert got == {1: 0.333333, 2: 1.0, 3: 1.0}


def test_trend_slope_hand_computed(spark, tmp_path):
    import json

    # two types: 'up' counts 1,2,3 on days 0,1,2 (slope 1); 'flat'
    # counts 2,2 on days 0,1 (slope 0). Write a tiny events lake and
    # run the registered query against it.
    rows = []
    eid = 0
    for day, n in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + day, 12, 0, 0), 1, "up", 1.0, "{}")
            )
            eid += 1
    for day, n in [(0, 2), (1, 2)]:
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + day, 12, 0, 0), 1, "flat", 1.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    lake = str(tmp_path / "lake")
    df.write.parquet(f"{lake}/events.parquet")

    from bigdata_jobmatching_spark.plans.catalog import load_all

    REG = load_all()
    out = {
        r["event_type"]: r
        for r in REG["event_type_trend_slope"].spark(spark, lake).collect()
    }
    assert out["up"]["slope_per_day"] == 1.0
    assert out["up"]["n_days"] == 3
    assert out["flat"]["slope_per_day"] == 0.0
    # single-day type would have slope_den == 0 -> NULL slope
    assert out["up"]["slope_den"] > 0


def test_trend_slope_negative_and_null(spark, tmp_path):
    # 'down' counts 3,1 on days 0,1 -> slope -2; 'once' has a single
    # day -> slope_den 0 -> slope NULL.
    rows = []
    eid = 0
    for day, n in [(0, 3), (1, 1)]:
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2024, 1, 1 + day, 6, 0, 0), 1, "down", 1.0, "{}")
            )
            eid += 1
    rows.append((eid, dt.datetime(2024, 1, 1, 6, 0, 0), 1, "once", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    lake = str(tmp_path / "lake")
    df.write.parquet(f"{lake}/events.parquet")

    from bigdata_jobmatching_spark.plans.catalog import load_all

    REG = load_all()
    out = {
        r["event_type"]: r
        for r in REG["event_type_trend_slope"].spark(spark, lake).collect()
    }
    assert out["down"]["slope_per_day"] == -2.0
    assert out["once"]["slope_per_day"] is None


def test_band_load_accounts_every_doc_and_pair(spark):
    # invariants at sf0.001: every band partitions the corpus
    # (sum over buckets == n_docs), and candidate_pairs >= the
    # distinct banded candidate count seen by the near-dup join.
    from bigdata_jobmatching_spark.plans.catalog import load_all

    REG = load_all()
    sf = "/root/testdata/sf0.001"
    rows = REG["minhash_band_load"].spark(spark, sf).collect()
    assert {r["band_idx"] for r in rows} == {0, 1, 2, 3}
    from bigdata_jobmatching_spark.plans.dedup_queries import (
        _mmh_base,
        _mmh_bands,
    )

    n_docs = _mmh_base(spark, sf).count()
    for r in rows:
        assert r["n_singletons"] + (r["n_buckets"] - r["n_singletons"]) <= r["n_buckets"]
        assert r["max_bucket"] >= 1
        # bucket sizes partition the docs within each band
    per_band_docs = (
        _mmh_bands(_mmh_base(spark, sf))
        .groupBy("band_idx").count().collect()
    )
    assert all(r["count"] == n_docs for r in per_band_docs)


def test_sratio6_sign_and_tie_behavior(spark):
    import duckdb

    from bigdata_jobmatching_spark.plans.catalog import sratio6, sratio6_sql

    cases = [  # (num, den, expected 6dp half-away-from-zero)
        (-3, 2, -1.5),
        (3, 2, 1.5),
        (1, 2000000, 0.000001),    # exact tie rounds away from zero
        (-1, 2000000, -0.000001),
        (0, 7, 0.0),
    ]
    df = spark.createDataFrame(cases, ["num", "den", "expect"])
    got = df.select("expect", sratio6("num", "den").alias("got")).collect()
    for r in got:
        assert r["got"] == r["expect"], r
    for num, den, expect in cases:
        [(v,)] = duckdb.sql(
            f"SELECT {sratio6_sql(str(num), str(den))}"
        ).fetchall()
        assert v == expect, (num, den, v)


# --- relational_extra4: Q21-shape rewrite semantics -----------------------

def test_last_shippers_rewrite_hand_computed(spark, tmp_path):
    """The window rewrite must reproduce the EXISTS/NOT-EXISTS logic on
    a micro graph covering: a single-supplier order (excluded by the
    EXISTS arm), a clear last shipper, and a shipdate TIE at the order
    max (both tied suppliers count, per NOT-EXISTS-strictly-later)."""
    import datetime as dt

    from bigdata_jobmatching_spark.plans.relational_extra4 import _q21

    d = dt.datetime
    li = spark.createDataFrame(
        [
            # order 1: supplier 10 alone -> excluded (no other supplier)
            (1, 10, d(1997, 1, 1)),
            (1, 10, d(1997, 5, 1)),
            # order 2: 10 ships last -> only 10 counts
            (2, 10, d(1997, 3, 1)),
            (2, 20, d(1997, 2, 1)),
            # order 3: 10 and 20 tie at the max, 30 earlier -> 10 and 20
            (3, 10, d(1997, 4, 1)),
            (3, 20, d(1997, 4, 1)),
            (3, 30, d(1997, 1, 1)),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(10, "S10"), (20, "S20"), (30, "S30")],
        "s_suppkey long, s_name string",
    )
    sf = str(tmp_path)
    li.write.parquet(f"{sf}/lineitem.parquet")
    supp.write.parquet(f"{sf}/supplier.parquet")
    out = {r["s_name"]: r["numwait"] for r in _q21(spark, sf).collect()}
    assert out == {"S10": 2, "S20": 1}


def test_last_shippers_single_lineitem_scan(spark, sf_dir):
    """The rewrite's point is one pass over the fact table: the join
    formulation planned two lineitem scans, the window one."""
    df = REGISTRY["last_shippers_by_supplier"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    li_scans = [s for s in scans if "lineitem" in s]
    assert len(li_scans) == 1, plan


def test_returned_revenue_topk_deterministic_selection(spark, sf_dir):
    """Top-20 must impose a total order (revenue desc, then the unique
    custkey) so the LIMIT is engine-stable."""
    df = REGISTRY["returned_revenue_topk"].spark(spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= 20
    keys = [(-r["revenue"], r["c_custkey"]) for r in rows]
    assert keys == sorted(keys)


# --- ORC source/sink capability ------------------------------------------

def test_orc_roundtrip_pushdown_and_partition_pruning(spark, sf_dir, tmp_path):
    """ORC as a second lake format: values roundtrip exactly vs the
    parquet source, predicates push into the ORC scan, and partition
    directories prune."""
    from bigdata_jobmatching_spark.sources.io import (
        load_table, read_orc_stage, write_orc_stage,
    )

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc_stage(orders, path, partition_by=("o_orderpriority",))

    back = read_orc_stage(spark, path)
    # exact value roundtrip (column order differs: partition col moves last)
    a = sorted(map(tuple, orders.select(*sorted(orders.columns)).collect()))
    b = sorted(map(tuple, back.select(*sorted(orders.columns)).collect()))
    assert a == b

    q = back.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 1000.0)
    ).select("o_orderkey", "o_totalprice")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()
    # non-partition predicate pushed to the scan
    assert "PushedFilters: [" in plan and "o_totalprice" in plan.split("PushedFilters")[1][:200]
    # partition predicate pruned, not scanned
    assert "o_orderpriority" not in plan.split("ReadSchema")[1][:200]


# --- versioned stage tables ----------------------------------------------

def test_versioned_stage_publish_timetravel_rollback_vacuum(spark, sf_dir, tmp_path):
    """Atomic-publish versioned parquet: readers pin immutable
    versions, rollback is a pointer swap, vacuum never deletes the
    published version."""
    from bigdata_jobmatching_spark.sources import versioned as V
    from bigdata_jobmatching_spark.sources.io import load_table

    root = str(tmp_path / "nation_stage")
    nation = load_table(spark, sf_dir, "nation")
    assert V.current_version(root) is None

    v1 = V.write_version(nation, root)
    assert (v1, V.current_version(root)) == (1, 1)

    # a reader that resolved v1 BEFORE the next publish...
    pinned_v1 = V.read_version(spark, root, 1)
    v2 = V.write_version(nation.filter("n_nationkey < 10"), root)
    assert (v2, V.current_version(root)) == (2, 2)
    # ...still sees every v1 row after v2 published (immutability)
    assert pinned_v1.count() == nation.count()
    assert V.read_version(spark, root).count() == 10

    # time travel + rollback
    assert V.read_version(spark, root, 1).count() == nation.count()
    V.rollback(root, 1)
    assert V.current_version(root) == 1
    assert V.read_version(spark, root).count() == nation.count()

    # vacuum keeps the published version even though it's oldest
    v3 = V.write_version(nation.filter("n_nationkey < 5"), root)
    V.rollback(root, 1)
    deleted = V.vacuum(root, keep=1)
    assert 1 not in deleted  # published
    assert V.read_version(spark, root).count() == nation.count()
    assert set(V.list_versions(root)) >= {1, 3}
    assert 2 in deleted

    # crash-before-publish: a bare directory without pointer swap is
    # invisible to readers and vacuumable
    import os
    os.makedirs(os.path.join(root, "v00099"))
    assert V.current_version(root) == 1
    deleted2 = V.vacuum(root, keep=0, grace_seconds=0.0)
    assert 99 in deleted2 and V.current_version(root) == 1


def test_kcore_hand_computed_iterative_peel(spark):
    """2-core of a chain + triangle: the chain (1-2-3-4) must vanish,
    but only through REPEATED peels (each round exposes a new
    degree-1 endpoint), proving the loop iterates to fixpoint; the
    triangle survives with degree 2."""
    from bigdata_jobmatching_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (4, 10)],
        "m long, n long",
    )
    out = {r["node"]: r["core_degree"] for r in kcore(edges, k=2).collect()}
    assert out == {10: 2, 11: 2, 12: 2}


def test_kcore_raises_on_unroll_exhaustion(spark):
    """A long chain needs one peel per link under k=2; max_iter=1 must
    raise instead of returning a non-fixpoint set."""
    import pytest

    from bigdata_jobmatching_spark.operators.graph import kcore

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "m long, n long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(chain, k=2, max_iter=1)


def test_versioned_merge_upsert_delete_rollback(spark, sf_dir, tmp_path):
    """MERGE semantics on the versioned stage: update wins on key,
    unmatched carries over, new key inserts, tombstone deletes — and
    the pre-merge version is one rollback away."""
    from bigdata_jobmatching_spark.sources import versioned as V

    root = str(tmp_path / "dim_stage")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, val string"
    )
    V.write_version(base, root)

    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "id long, val string, deleted boolean",
    )
    v2 = V.merge_version(spark, root, updates, ("id",), delete_col="deleted")
    assert v2 == 2
    got = {r["id"]: r["val"] for r in V.read_version(spark, root).collect()}
    assert got == {1: "a", 2: "B", 4: "d"}  # 3 deleted

    V.rollback(root, 1)
    back = {r["id"]: r["val"] for r in V.read_version(spark, root).collect()}
    assert back == {1: "a", 2: "b", 3: "c"}


def test_parquet_rowgroup_stats_skip_on_sorted_column(spark, sf_dir, tmp_path):
    """Clustering (sort) + parquet min/max stats must let a selective
    range predicate skip most row groups: the scan's output-rows
    metric stays near the selected band on the CLUSTERED layout and
    explodes to ~full-table on a hash-scattered layout. This is the
    capability compact_stage(cluster_by=...) exists to buy."""
    from bigdata_jobmatching_spark.sources.io import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    n_total = li.count()

    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "5000")
    # clustered: globally sorted on the predicate column
    li.orderBy("l_extendedprice").coalesce(1).sortWithinPartitions(
        "l_extendedprice"
    ).write.option("parquet.block.size", 64 * 1024).parquet(clustered)
    # scattered: same rows, pseudo-random order
    li.orderBy(F.expr("hash(l_orderkey, l_quantity)")).coalesce(1).write.option(
        "parquet.block.size", 64 * 1024
    ).parquet(scattered)
    spark.conf.unset("spark.sql.files.maxRecordsPerFile")

    lo, hi = 900.0, 1100.0

    def scan_rows(path):
        df = spark.read.parquet(path).filter(
            (F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") < hi)
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        # first leaf is the FileSourceScan; its metric counts rows
        # surviving row-group/page pruning + pushed filters
        scan = plan
        while scan.children().size() > 0:
            scan = scan.children().apply(0)
        return scan.metrics().apply("numOutputRows").value()

    rows_clustered = scan_rows(clustered)
    rows_scattered = scan_rows(scattered)
    n_match = li.filter(
        (F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") < hi)
    ).count()

    assert rows_clustered < n_total * 0.5, (rows_clustered, n_total)
    assert rows_clustered < rows_scattered, (rows_clustered, rows_scattered)
    assert rows_clustered >= n_match


def test_fuzz_cross_engine_equivalence(spark, sf_dir):
    """Seeded mini-SQLancer: 25 random filter/group/aggregate ASTs
    rendered to both engines must value-hash-identically (attacks the
    space between the hand-written oracled queries; a failure here is
    the round-3 divergence class)."""
    from tools.fuzz_equivalence import run_fuzz

    failures = run_fuzz(25, seed=42, sf_dir=sf_dir, spark=spark, verbose=False)
    assert failures == [], failures


# --- ALS recommender invariants ------------------------------------------

def test_als_recommendations_shape_and_order(spark, sf_dir):
    """Implicit-ALS invariants: fixed (user x k) output grain, scores
    descending within user, recommended items come from the catalog."""
    from bigdata_jobmatching_spark.operators.recommend import (
        als_recommendations, purchase_matrix,
    )
    from bigdata_jobmatching_spark.sources.io import load_table

    m = purchase_matrix(load_table(spark, sf_dir, "lineitem"))
    k = 3
    recs = als_recommendations(m, k=k, max_iter=3).collect()
    n_users = m.select("user").distinct().count()
    assert len(recs) == n_users * k
    by_user = {}
    for r in recs:
        by_user.setdefault(r["user"], []).append(r)
    items = {r["item"] for r in m.select("item").distinct().collect()}
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["rec_rank"])
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r["item"] in items for r in rows)


def test_als_beats_popularity_on_heldout(spark, sf_dir):
    """The factor model must carry signal: hit-rate@5 on held-out
    purchases beats recommending nothing (>0) — a weak but honest
    floor for a 3-iteration model on synthetic data — and training is
    seed-reproducible at the output grain."""
    from bigdata_jobmatching_spark.operators.recommend import (
        als_recommendations, purchase_matrix,
    )
    from bigdata_jobmatching_spark.sources.io import load_table

    m = purchase_matrix(load_table(spark, "/root/testdata/sf0.01", "lineitem"))
    # hold out each user's highest-item-id purchase, train on the rest
    from pyspark.sql import Window

    w = Window.partitionBy("user")
    flagged = m.withColumn("mx", F.max("item").over(w))
    train = flagged.filter(F.col("item") != F.col("mx")).drop("mx")
    held = flagged.filter(F.col("item") == F.col("mx")).drop("mx")

    recs = als_recommendations(train, k=5, max_iter=5)
    hits = (
        recs.join(
            held.withColumnRenamed("item", "held_item").select("user", "held_item"),
            ["user"],
        )
        .filter(F.col("item") == F.col("held_item"))
        .count()
    )
    assert hits > 0

    again = als_recommendations(train, k=5, max_iter=5)
    a = {(r["user"], r["rec_rank"], r["item"]) for r in recs.collect()}
    b = {(r["user"], r["rec_rank"], r["item"]) for r in again.collect()}
    assert a == b


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order vs single-column sort: a selective range predicate on
    the NON-leading dimension must scan far fewer rows on the
    Z-ordered layout (lexicographic clustering gives it no locality),
    while values roundtrip exactly."""
    from bigdata_jobmatching_spark.functions.zorder import (
        interleave_bits, write_zordered,
    )
    from bigdata_jobmatching_spark.sources.io import load_table

    # interleave correctness on knowns: a=0b101, b=0b011 -> z=0b011011? 
    # bit i of a -> 2i, of b -> 2i+1: a=5(101),b=3(011):
    # pairs (a0=1,b0=1)->11, (a1=0,b1=1)->10, (a2=1,b2=0)->01
    # z = 01 10 11 = 0b011011 = 27
    row = spark.range(1).select(
        interleave_bits(F.lit(5), F.lit(3), bits=3).alias("z")
    ).collect()[0]
    assert row["z"] == 27

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_total = li.count()
    zpath = str(tmp_path / "zorder")
    lexpath = str(tmp_path / "lex")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "4000")
    write_zordered(li, zpath, "l_partkey", "l_suppkey", n_files=16)
    li.repartitionByRange(16, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.option("parquet.block.size", 64 * 1024).parquet(lexpath)
    spark.conf.unset("spark.sql.files.maxRecordsPerFile")

    # roundtrip
    assert sorted(map(tuple, spark.read.parquet(zpath).collect())) == sorted(
        map(tuple, li.collect())
    )

    # selective predicate on the SECOND dimension only
    smax = li.agg(F.max("l_suppkey")).collect()[0][0]
    lo, hi = 1, max(2, int(smax * 0.05))

    def scan_rows(path):
        df = spark.read.parquet(path).filter(
            (F.col("l_suppkey") >= lo) & (F.col("l_suppkey") < hi)
        )
        df.collect()
        scan = df._jdf.queryExecution().executedPlan()
        while scan.children().size() > 0:
            scan = scan.children().apply(0)
        return scan.metrics().apply("numOutputRows").value()

    z_rows = scan_rows(zpath)
    lex_rows = scan_rows(lexpath)
    assert z_rows < lex_rows, (z_rows, lex_rows)
    assert z_rows < n_total * 0.7
