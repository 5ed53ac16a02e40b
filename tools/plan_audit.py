"""Physical-plan census over the whole query registry.

For every registered query, builds the plan (nothing is executed) and
counts the operators that dominate cost at scale: shuffle exchanges,
broadcast exchanges, sort-merge vs hash joins, nested-loop/cartesian
joins, Python evaluation nodes, and global (unpartitioned) windows.
Prints one line per query plus a summary, and exits non-zero if a
query trips a scale red flag:

- a CartesianProduct (non-broadcast cross join) anywhere;
- a window/sort with no partitioning over a non-aggregated input
  (single-partition funnels) — detected as `Window [...]` whose
  partition spec is empty, excluding final ORDER BY of tiny outputs
  is not detectable statically, so this is a warn-only heuristic;
- more than MAX_EXCHANGES shuffle exchanges (deep shuffle chains).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

MAX_EXCHANGES = 8
PRUNE_MAX = 8  # widest legitimate projection (profile reads 6 of orders' 6)


# Queries whose CartesianProduct is the ALGORITHM, not an accident:
# MLlib recommendForAllUsers scores via a BLOCKED cross product of the
# two factor matrices (users x rank) x (items x rank) with per-block
# top-k — bounded by factor-matrix size, never by the ratings data.
_CARTESIAN_OK = {"copurchase_als_latent_recs"}


def plan_metrics(plan: str) -> dict[str, int]:
    """Operator census of one executedPlan string — the counts that
    dominate cost at scale."""
    n_shuffle = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    n_gather = plan.count("Exchange SinglePartition")
    n_bcast = plan.count("BroadcastExchange")
    n_smj = plan.count("SortMergeJoin")
    n_bhj = plan.count("BroadcastHashJoin")
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    n_cart = plan.count("CartesianProduct")
    n_py = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") \
        + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas") \
        + plan.count("PythonUDTF")
    n_gwin = len(re.findall(r"Window \[[^\]]*\], \[\]", plan))

    def top_level_fields(s: str) -> int:
        if not s:
            return 0
        depth, n = 0, 1
        for ch in s:
            if ch in "<(":
                depth += 1
            elif ch in ">)":
                depth -= 1
            elif ch == "," and depth == 0:
                n += 1
        return n

    scan_widths = [
        top_level_fields(s.rstrip(">").rstrip("."))
        for s in re.findall(r"ReadSchema: struct<([^\n]*)", plan)
    ]
    return {
        "shuffle": n_shuffle, "gather": n_gather, "bcast": n_bcast,
        "smj": n_smj, "bhj": n_bhj, "bnlj": n_bnlj, "cart": n_cart,
        "py": n_py, "global_window": n_gwin,
        "max_scan_cols": max(scan_widths, default=0),
    }


# Metrics where an INCREASE vs the committed snapshot is a plan
# regression (more shuffles/cartesians/Python/global windows/wider
# scans); bcast/bhj counts legitimately move with AQE thresholds.
REGRESSION_KEYS = (
    "shuffle", "gather", "smj", "bnlj", "cart", "py",
    "global_window", "max_scan_cols",
)


def audit_plans(spark, names=None, sf_dir="/root/testdata/sf0.001") -> dict[str, dict]:
    """{query: metrics} for the given (default: all) registered
    queries — builds plans only, executes nothing."""
    import __spark_entry__ as entry_mod

    out: dict[str, dict] = {}
    for name, fn in entry_mod.queries().items():
        if names is not None and name not in names:
            continue
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = plan_metrics(plan)
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--write-snapshot"]
    write_snapshot = "--write-snapshot" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    import __spark_entry__ as entry_mod
    from bigdata_jobmatching_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = entry_mod.queries()

    rows = []
    metrics_by_name: dict[str, dict] = {}
    flags: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - audit must not die mid-sweep
            rows.append((name, f"PLAN ERROR: {str(e)[:80]}"))
            flags.append(f"{name}: plan build failed")
            continue
        metrics_by_name[name] = plan_metrics(plan)
        m = metrics_by_name[name]
        rows.append((
            name,
            " ".join(f"{k}={v}" for k, v in m.items()),
        ))
        if m["cart"] and name not in _CARTESIAN_OK:
            flags.append(f"{name}: CartesianProduct in plan")
        if m["shuffle"] > MAX_EXCHANGES:
            flags.append(f"{name}: {m['shuffle']} shuffle exchanges > {MAX_EXCHANGES}")
        if m["max_scan_cols"] > PRUNE_MAX:
            flags.append(
                f"{name}: scan reads {m['max_scan_cols']} columns — pruning defeated?"
            )

    w = max(len(n) for n, _ in rows) if rows else 0
    for name, desc in sorted(rows):
        print(f"{name:<{w}}  {desc}")
    print(f"\n{len(rows)} queries audited")
    if write_snapshot:
        import json
        from pathlib import Path

        snap_path = Path(__file__).with_name("plan_snapshot.json")
        snap_path.write_text(json.dumps(
            dict(sorted(metrics_by_name.items())), indent=1) + "\n")
        print(f"snapshot: {snap_path} ({len(metrics_by_name)} queries)")
    if flags:
        print("RED FLAGS:")
        for f in flags:
            print(" -", f)
        return 1
    print("no red flags")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
