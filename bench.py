"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is measured with the noop sink (full plan runs, nothing is
collected to the driver) — the number reflects scan+shuffle+compute,
which is what scales.

Drift triage (round-7 verdict task #7): a single query's figure can
swing 2-2.4x run-to-run from shared-JVM accumulation when 60+ other
queries ran first (SCALING.md round-7 addendum 7). Set
SPARK_GRAFT_BENCH_LEAN=<query>[,<query>...] to time ONLY those
queries in a lean session — fresh JVM, just the warmup list plus the
named queries, min-of-N — which is the reproduction standard a
suspected regression must meet before it counts as one.
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
    # name-sorted: timings stay comparable across rounds even when the
    # registry's (gate-driven) ordering changes.
    bench_specs = {n: registry[n] for n in sorted(registry) if BENCH_TAG in registry[n].tags}

    lean = os.environ.get("SPARK_GRAFT_BENCH_LEAN", "").strip()
    if lean:
        names = [n.strip() for n in lean.split(",") if n.strip()]
        unknown = [n for n in names if n not in registry]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_LEAN: unknown queries {unknown}")
        bench_specs = {n: registry[n] for n in sorted(names)}

    # Warmup: a trivial plan for JVM startup, then four representative
    # plans at the smoke SF (join+agg+broadcast; regex/text projection;
    # vector higher-order functions; Arrow mapInPandas) so codegen, the
    # parquet reader, the Python workers and the Arrow channel are hot
    # before the first timed query instead of inflating it.
    # embedding_norm_stats covers the array/aggregate codegen the
    # name-sorted loop otherwise pays for inside ann_cosine_topk
    # (~2.5 s artifact in BENCH_r03); media_header_meta covers Python
    # worker spawn + Arrow serialization (~5 s artifact otherwise).
    # ann_cosine_topk warms the broadcast-nested-loop + window codegen
    # its family pays first-position (13.8 s vs 1.3 s steady in r04);
    # docs_dedup_cluster_sizes warms the iterative connected-components
    # machinery (localCheckpoint, per-iteration job setup: 24 s cold vs
    # 5 s steady).
    # copurchase_pagerank warms the iterative join+checkpoint loop,
    # docs_prefix_filter_pairs the md5-shingle + rank-window chain,
    # doc_bigram_commonness the arrays_zip bigram explode,
    # open_orders_by_month the sweep-line date arithmetic.
    # ann_lsh_topk warms the broadcast-planes bucket join + nested
    # higher-order signature path (measured ~10 s cold vs 1.3-1.6 s
    # steady at ANY sf — pure first-execution codegen, which the
    # cosine/IVF warmups don't cover).
    spark.range(1000).selectExpr("sum(id)").collect()
    for wq in ("q5_region_revenue", "doc_stats", "embedding_norm_stats",
               "media_header_meta", "ann_cosine_topk", "ann_lsh_topk",
               "docs_dedup_cluster_sizes", "copurchase_pagerank",
               "docs_prefix_filter_pairs", "doc_bigram_commonness",
               "open_orders_by_month"):
        registry[wq].spark(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    # min-of-N: this box runs with heavy co-tenant load (single-query
    # swings of 4x run-to-run with byte-identical plans were measured;
    # round-9's own suite-warmed vs quiet-box spread was 70.0 s vs
    # 66.3 s same-day), so each query executes N times and reports its
    # FASTEST wall — the number closest to the plan's true cost.
    # N=3 since round 10 (r9 verdict task #8), and the emitted JSON
    # carries a protocol field recording the policy plus box state
    # (load averages before/after), so a cross-round comparison can
    # tell ambient noise from real regressions.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    # per-repeat context (r13 verdict task #6 / r14 task #7): every
    # repeat records (wall, loadavg_1m at completion) so a cross-round
    # reader can tell whether a query's min was taken under ambient
    # load — additions-only; the driver parses `queries`/`value`.
    repeat_log: dict[str, list[list[float]]] = {}
    for name, spec in bench_specs.items():
        best = None
        reps: list[list[float]] = []
        for _ in range(max(1, repeats)):
            t0 = time.time()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            reps.append([round(dt, 3), round(os.getloadavg()[0], 2)])
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        repeat_log[name] = reps

    total = round(sum(timings.values()), 3)
    load_end = os.getloadavg()
    print(json.dumps({
        "metric": "bench_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "protocol": {
            "policy": "min-of-N wall, noop sink, warm JVM",
            "repeats": max(1, repeats),
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "os_cpus": os.cpu_count(),
            "loadavg_1m_start": round(load_start[0], 2),
            "loadavg_1m_end": round(load_end[0], 2),
            # [wall_sec, loadavg_1m_after] per repeat, per query
            "repeats_detail": repeat_log,
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
