"""Dump .explain("formatted") for named queries to plans/<dir>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query>[,<query>...]
Plans are captured at the bench SF dir ($SPARK_GRAFT_SF_DIR, default
/root/testdata/sf0.1) on the same tuned session bench.py uses, so the
committed plan files reflect what the bench actually runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_jobmatching_spark.plans.catalog import load_all
from bigdata_jobmatching_spark.session import get_spark


def main() -> None:
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    registry = load_all()
    for name in names:
        df = registry[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
