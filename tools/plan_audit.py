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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from bigdata_jobmatching_spark.session import get_spark

    spark = get_spark("plan-audit")
    qs = entry_mod.queries()

    rows = []
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
        # SinglePartition gathers (final scalar aggregates, global
        # limits) move a handful of pre-aggregated rows — counted
        # separately, never red-flagged
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
        # column-pruning census: ReadSchema width per parquet scan.
        # A scan that reads every column of a wide table for a narrow
        # query defeats pruning — the widest scan is reported and
        # red-flagged above PRUNE_MAX columns (the widest legitimate
        # projection in the registry; the fact tables have 11).
        def top_level_fields(s: str) -> int:
            # commas inside decimal(18,6) / nested struct<...> are not
            # field separators — count only depth-0 commas
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

        # plan strings hard-truncate long lines with '...', so widths
        # are a lower bound for very wide scans — still enough to flag
        # an unpruned wide-table read
        scan_widths = [
            top_level_fields(s.rstrip(">").rstrip("."))
            for s in re.findall(r"ReadSchema: struct<([^\n]*)", plan)
        ]
        max_scan = max(scan_widths, default=0)
        rows.append((
            name,
            f"shuffle={n_shuffle} gather={n_gather} bcast={n_bcast} smj={n_smj} "
            f"bhj={n_bhj} bnlj={n_bnlj} cart={n_cart} py={n_py} "
            f"global_window={n_gwin} max_scan_cols={max_scan}",
        ))
        if n_cart and name not in _CARTESIAN_OK:
            flags.append(f"{name}: CartesianProduct in plan")
        if n_shuffle > MAX_EXCHANGES:
            flags.append(f"{name}: {n_shuffle} shuffle exchanges > {MAX_EXCHANGES}")
        if max_scan > PRUNE_MAX:
            flags.append(
                f"{name}: scan reads {max_scan} columns — pruning defeated?"
            )

    w = max(len(n) for n, _ in rows) if rows else 0
    for name, desc in sorted(rows):
        print(f"{name:<{w}}  {desc}")
    print(f"\n{len(rows)} queries audited")
    if flags:
        print("RED FLAGS:")
        for f in flags:
            print(" -", f)
        return 1
    print("no red flags")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
