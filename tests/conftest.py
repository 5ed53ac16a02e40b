from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bigdata_jobmatching_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # shuffle_partitions=4 (r15, suite wall-time task): test inputs are
    # tiny, so reduce-stage cost is pure task-scheduling overhead —
    # 8 -> 4 measured -18% on the heaviest module (domain_pipeline
    # 292 -> 241 s) with the ranking/ntile, property, stateful-streaming
    # and bucketed sweeps all green. Engine results are partition-count
    # independent by design (the partition-order determinism sweep pins
    # that), so this trades nothing but scheduler churn.
    s = get_spark("tests", cpus=8, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE
