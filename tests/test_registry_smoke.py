"""Every registered query must run at sf0.001 and return a stable,
non-degenerate schema. The value-level check against DuckDB lives in
tools/check_oracle.py (and the driver's own gate)."""

from __future__ import annotations

import pytest

from bigdata_jobmatching_spark.plans.catalog import load_all

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    # schema must be stable across two invocations
    df2 = spec.spark(spark, sf_dir)
    assert df.schema == df2.schema
    rows = df.limit(5).collect()
    assert rows is not None


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 15
