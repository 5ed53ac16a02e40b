"""Distributed global rank / ntile (operators/ranking.py).

Pins the r13 rewrite of the partitionless-ntile family: the bucketed
operator must agree bit-for-bit with the single-partition
``Window.orderBy`` forms it replaces, across ascending/descending
orders, multi-column buckets, remainder-carrying N, and the N < n
edge — and its plan must contain no single-partition exchange feeding
a window."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_jobmatching_spark.operators.ranking import (
    global_ntile,
    global_ranks,
    ntile_from_rank,
)

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_global_ranks_is_exact_permutation(spark):
    o = _orders(spark)
    cols = [F.col("o_totalprice"), F.col("o_orderkey")]
    r = global_ranks(
        o, cols, [F.floor(F.col("o_totalprice") / 256).cast("long")],
        rank_col="r", total_col="n")
    n = o.count()
    agg = r.agg(
        F.count("*").alias("rows"),
        F.countDistinct("r").alias("dist"),
        F.min("r").alias("lo"),
        F.max("r").alias("hi"),
        F.min("n").alias("n_lo"),
        F.max("n").alias("n_hi"),
    ).collect()[0]
    assert (agg.rows, agg.dist, agg.lo, agg.hi) == (n, n, 1, n)
    assert agg.n_lo == agg.n_hi == n

    # rank order == key order (no cross-bucket inversions)
    ordered = r.orderBy("r").select("o_totalprice", "o_orderkey").collect()
    keys = [(row.o_totalprice, row.o_orderkey) for row in ordered]
    assert keys == sorted(keys)


def test_global_ntile_matches_window_ntile_asc(spark):
    o = _orders(spark)
    cols = [F.col("o_totalprice"), F.col("o_orderkey")]
    ref = o.withColumn("d", F.ntile(7).over(Window.orderBy(*cols))).select(
        "o_orderkey", F.col("d").alias("d_ref"))
    got = global_ntile(
        o, cols, [F.floor(F.col("o_totalprice") / 256).cast("long")],
        7, "d").select("o_orderkey", F.col("d").alias("d_got"))
    assert ref.join(got, "o_orderkey").filter("d_ref <> d_got").count() == 0


def test_global_ntile_matches_window_ntile_desc_multibucket(spark):
    o = _orders(spark)
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("o_totalprice").alias("money"),
    )
    cols = [F.desc("freq"), F.asc("o_custkey")]
    ref = per.withColumn("d", F.ntile(4).over(Window.orderBy(*cols))).select(
        "o_custkey", F.col("d").alias("d_ref"))
    # low-cardinality first key -> composite bucket (negated freq +
    # coarse key range), still ASC-aligned with (freq DESC, key ASC)
    got = global_ntile(
        per, cols,
        [-F.col("freq"), F.shiftright(F.col("o_custkey"), 6)],
        4, "d").select("o_custkey", F.col("d").alias("d_got"))
    assert ref.join(got, "o_custkey").filter("d_ref <> d_got").count() == 0


def test_global_ntile_n_exceeds_rows(spark):
    o = _orders(spark).orderBy("o_orderkey").limit(5)
    cols = [F.col("o_totalprice"), F.col("o_orderkey")]
    ref = o.withColumn("d", F.ntile(10).over(Window.orderBy(*cols))).select(
        "o_orderkey", F.col("d").alias("d_ref"))
    got = global_ntile(
        o, cols, [F.floor(F.col("o_totalprice") / 256).cast("long")],
        10, "d").select("o_orderkey", F.col("d").alias("d_got"))
    assert ref.join(got, "o_orderkey").filter("d_ref <> d_got").count() == 0


def test_ntile_from_rank_arithmetic(spark):
    # N = 10, n = 4 -> sizes 3,3,2,2 per the SQL spec
    df = spark.range(1, 11).select(
        F.col("id").alias("rank"),
        ntile_from_rank(F.col("id"), 4, F.lit(10).cast("long")).alias("b"),
    )
    got = {row.rank: row.b for row in df.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 2, 7: 3, 8: 3, 9: 4, 10: 4}


def test_global_ntile_property_random_values(spark):
    """Property sweep (seeded, not hypothesis — one Spark job per
    example is the cost driver): random value distributions with
    heavy bucket-expression ties, negative values, duplicate payload
    values (tie-broken by id), several n including n > N — the
    bucketed ntile must match the window ntile on every draw."""
    import random

    from pyspark.sql import Row

    rng = random.Random(13)
    for trial in range(6):
        n_rows = rng.choice([3, 17, 101, 400])
        n = rng.choice([2, 4, 7, 10, 450])
        vals = [rng.randint(-50, 50) for _ in range(n_rows)]
        df = spark.createDataFrame(
            [Row(id=i, v=v) for i, v in enumerate(vals)])
        cols = [F.col("v"), F.col("id")]
        ref = df.withColumn(
            "d", F.ntile(n).over(Window.orderBy(*cols))).select(
            "id", F.col("d").alias("d_ref"))
        # shiftright floors toward -inf for negatives: order-aligned
        got = global_ntile(
            df, cols, [F.shiftright(F.col("v"), 3)], n, "d"
        ).select("id", F.col("d").alias("d_got"))
        bad = ref.join(got, "id").filter("d_ref <> d_got").count()
        assert bad == 0, f"trial {trial}: n_rows={n_rows} n={n}"


def test_no_single_partition_window_in_plan(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.plan_audit import unbounded_global_windows

    o = _orders(spark)
    got = global_ntile(
        o, [F.col("o_totalprice"), F.col("o_orderkey")],
        [F.floor(F.col("o_totalprice") / 256).cast("long")], 10, "d")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert unbounded_global_windows(plan) == 0
    assert "Exchange SinglePartition" not in plan
