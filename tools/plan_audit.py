"""Physical-plan census over the whole query registry.

For every registered query, builds the plan (nothing is executed) and
counts the operators that dominate cost at scale: shuffle exchanges,
broadcast exchanges, sort-merge vs hash joins, nested-loop/cartesian
joins, Python evaluation nodes, and global (unpartitioned) windows.
Prints one line per query plus a summary, and exits non-zero if a
query trips a scale red flag:

- a CartesianProduct (non-broadcast cross join) anywhere;
- an UNBOUNDED partitionless window (r12 verdict task #1): a Window
  node fed through `Exchange SinglePartition` with no Limit /
  WindowGroupLimit bounding the gathered input — the plan shape that
  funnels a data-proportional frame into ONE task's sort. Detected
  structurally from the plan tree (the old `Window [...], []` regex
  never matched: partitionless windows print only two bracket
  groups). Known-bounded cases are allowlisted with justifications
  in _GLOBAL_WINDOW_OK;
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

# Queries whose partitionless window is BOUNDED BY SEMANTICS in a way
# the static detector cannot see (no Limit node in the plan). Every
# entry must say WHY the gathered input cannot grow with the data.
# Anything else that gathers an unbounded frame into one window task
# is a red flag — the class the r12 verdict killed must stay dead.
_GLOBAL_WINDOW_OK: dict[str, str] = {
    # ratio-to-report over the POST-AGGREGATION nation grain: the
    # window input is <= 25 rows at any data scale (nation is a
    # value-bounded dimension), so the single partition holds a
    # constant-size frame.
    "nation_revenue_share":
        "window input is the <=25-row nation-grain aggregate",
    # cumulative min over DISTINCT price-cents grain: TPC-H retail
    # price spans ~110k possible cent values regardless of SF, so the
    # gathered frame is value-domain-bounded, not data-proportional
    # (the >2-D / unbounded-grain variant would need the documented
    # local-frontier-then-merge shape instead).
    "parts_pareto_frontier":
        "window input is the value-bounded distinct-price aggregate",
}

# Queries allowed MORE unique shuffles than MAX_EXCHANGES, each with a
# reason the breadth is legitimate (breadth, never a chain).
_EXCHANGES_OK: dict[str, int] = {
    # three INDEPENDENT distributed ntiles (recency/frequency/monetary
    # orderings cannot share a range shuffle) at ~3 unique exchanges
    # each + the shared per-customer aggregate + the score joins; the
    # alternative was one single-partition window per metric.
    "customer_rfm_scores": 14,
}


_WINDOW_LINE = re.compile(r"(?:\+\-|\:\-|^)\s*(?:\*\(\d+\)\s*)?Window(?:GroupLimit)? \[")
_BOUND_NODES = ("GlobalLimit", "LocalLimit", "TakeOrderedAndProject",
                "WindowGroupLimit", "CollectLimit")


def _node_depth(line: str) -> int:
    """Tree depth of a plan line = column where the node text starts
    (after the ':  '/'+- ' gutter and any '*(n)' codegen marker)."""
    m = re.search(r"[A-Za-z*]", line)
    return m.start() if m else len(line)


def unbounded_global_windows(plan: str) -> int:
    """Count Window nodes that gather a NON-limit-bounded input into a
    single partition — the shape that becomes one task's sort of a
    data-proportional frame at scale.

    For each `Window [...]` line, walk the straight SPINE below it: if
    the first Exchange encountered is `Exchange SinglePartition` and no
    bounding node (Global/Local/CollectLimit, WindowGroupLimit,
    TakeOrderedAndProject) appears on the spine up to the SECOND
    exchange (a `.limit(n)` lands its GlobalLimit just below the
    window's own gather), the window is an unbounded global window.
    WindowGroupLimit lines themselves are not windows. The scan STOPS
    at the first branch boundary (a `:-` connector: a binary node —
    join/union — forks below): a Limit inside one branch of a join
    does not bound the join's output, so it must not bless the window
    (r13 advice — the subtree-wide scan was a false-negative hole)."""
    lines = plan.splitlines()
    n_bad = 0
    for i, line in enumerate(lines):
        if not _WINDOW_LINE.search(line) or "WindowGroupLimit" in line:
            continue
        d = _node_depth(line)
        first_ex = None
        bounded = False
        exchanges_seen = 0
        for j in range(i + 1, len(lines)):
            if _node_depth(lines[j]) <= d:
                break
            lj = lines[j]
            if re.search(r":-\s", lj):
                # a binary node branches here — the spine ends; bound
                # nodes inside a branch do not bound the window input
                break
            if any(b in lj for b in _BOUND_NODES):
                bounded = True
                break
            # AQE wraps a materialized exchange as a ShuffleQueryStage
            # line with the real `Exchange ...` node on the NEXT line —
            # the wrapper is transparent, only the Exchange line
            # carries the partitioning (counting the wrapper would
            # make the inner SinglePartition look like a benign
            # second exchange and pass the very shape this detector
            # exists to kill).
            if "ShuffleQueryStage" in lj or "AQEShuffleRead" in lj:
                continue
            if "Exchange " in lj:
                exchanges_seen += 1
                if exchanges_seen == 1:
                    first_ex = lj
                elif exchanges_seen >= 2:
                    break
        if first_ex is not None and "SinglePartition" in first_ex and not bounded:
            n_bad += 1
    return n_bad


_ID_NOISE = re.compile(r"#\d+L?|plan_id=\d+")


def _unique_exchanges(plan: str) -> tuple[int, int]:
    """(shuffle, gather) counts over UNIQUE canonical exchange
    subtrees. A frame consumed twice (self-join, rank + offset
    branches) duplicates its whole subtree in the static plan string,
    but Spark's ReuseExchange executes the canonically-identical
    exchange ONCE at runtime (verified: the adaptive final plans show
    ReusedExchange nodes) — so occurrence-counting overstates cost
    exactly where the plan is already doing the right thing. Subtrees
    are canonicalised by stripping expression/plan ids."""
    lines = plan.splitlines()
    shuffle_keys: set[str] = set()
    gather_keys: set[str] = set()
    for i, line in enumerate(lines):
        is_shuffle = re.search(r"Exchange (?:hash|range)partitioning", line)
        is_gather = "Exchange SinglePartition" in line
        if not (is_shuffle or is_gather):
            continue
        d = _node_depth(line)
        sub = ["0|" + _ID_NOISE.sub("", line[d:])]
        for j in range(i + 1, len(lines)):
            dj = _node_depth(lines[j])
            if dj <= d:
                break
            # keep the relative depth so distinct tree shapes with the
            # same node multiset cannot collide
            sub.append(f"{dj - d}|" + _ID_NOISE.sub("", lines[j][dj:]))
        key = "\n".join(sub)
        (shuffle_keys if is_shuffle else gather_keys).add(key)
    return len(shuffle_keys), len(gather_keys)


def plan_metrics(plan: str) -> dict[str, int]:
    """Operator census of one executedPlan string — the counts that
    dominate cost at scale."""
    n_shuffle, n_gather = _unique_exchanges(plan)
    n_bcast = plan.count("BroadcastExchange")
    n_smj = plan.count("SortMergeJoin")
    n_bhj = plan.count("BroadcastHashJoin")
    n_bnlj = plan.count("BroadcastNestedLoopJoin")
    n_cart = plan.count("CartesianProduct")
    n_py = plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") \
        + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas") \
        + plan.count("PythonUDTF")
    n_gwin = unbounded_global_windows(plan)

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
        if m["global_window"] and name not in _GLOBAL_WINDOW_OK:
            flags.append(
                f"{name}: {m['global_window']} unbounded partitionless "
                "window(s) — single-task sort of a data-proportional frame"
            )
        if m["shuffle"] > _EXCHANGES_OK.get(name, MAX_EXCHANGES):
            flags.append(f"{name}: {m['shuffle']} shuffle exchanges > "
                         f"{_EXCHANGES_OK.get(name, MAX_EXCHANGES)}")
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
