"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is measured with the noop sink (full plan runs, nothing is
collected to the driver) — the number reflects scan+shuffle+compute,
which is what scales.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_jobmatching_spark.plans.catalog import load_all
from bigdata_jobmatching_spark.session import get_spark

BENCH_TAG = "bench"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    registry = load_all()
    bench_specs = {n: s for n, s in registry.items() if BENCH_TAG in s.tags}

    # JVM/codegen warmup on a trivial plan so q1 doesn't pay startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, spec in bench_specs.items():
        t0 = time.time()
        spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "bench_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
