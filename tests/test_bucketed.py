"""Bucketed-table proof: the reason write_bucketed exists is that a
join or aggregation on the bucket key must run WITHOUT an exchange —
the pre-shuffle was paid once at write time. These tests pin that at
the physical-plan level, which wall-clock timing at test scale cannot
see (the shuffle being skipped is the dominant cost only at 100 TB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_jobmatching_spark.sources.io import load_table, write_bucketed

_SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    # AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
    # only the final plan counts (the initial copy would double-count
    # every node)
    s = df._jdf.queryExecution().executedPlan().toString()
    return s.split("== Initial Plan ==")[0]


def test_bucketed_join_and_agg_skip_the_shuffle(spark, tmp_path):
    orders = load_table(spark, _SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    cust = load_table(spark, _SF, "customer").select(
        "c_custkey", "c_mktsegment")
    write_bucketed(orders, "t_orders_b", ("o_custkey",), n_buckets=8,
                   sort_cols=("o_custkey",), path=str(tmp_path / "ob"))
    write_bucketed(cust, "t_cust_b", ("c_custkey",), n_buckets=8,
                   sort_cols=("c_custkey",), path=str(tmp_path / "cb"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("t_orders_b").join(
                spark.table("t_cust_b"),
                F.col("o_custkey") == F.col("c_custkey"),
            ).groupBy("c_mktsegment").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .alias("cents"),
            )
            rows = {r.c_mktsegment: (r.n, r.cents) for r in j.collect()}
            plan = _plan(j)
            # co-located bucketed join: ZERO shuffle exchanges on the
            # join — the only exchange allowed is the final small
            # aggregation regroup on c_mktsegment
            n_exchanges = plan.count("Exchange hashpartitioning")
            assert n_exchanges <= 1, plan
            assert "SortMergeJoin" in plan
            # bucket-key aggregation: no exchange at all
            a = spark.table("t_orders_b").groupBy("o_custkey").agg(
                F.count(F.lit(1)).alias("n"))
            a.collect()
            assert "Exchange" not in _plan(a), _plan(a)

            # and the answers match the unbucketed plan exactly
            want = {
                r.c_mktsegment: (r.n, r.cents)
                for r in orders.join(
                    cust, F.col("o_custkey") == F.col("c_custkey"))
                .groupBy("c_mktsegment").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                    .alias("cents"),
                ).collect()
            }
            assert rows == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")
