"""Physical-plan regression guards: the optimizations we rely on must
stay visible in the plans — filters pushed to the parquet scan,
column-pruned read schemas, dimension joins broadcast (never
sort-merge), partition-count fan-out on compute stages.
"""

from __future__ import annotations

import re

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
