"""Measured scaling curves: how does each headline query's wall time
grow when the data grows 10x?

Runs representative queries at sf0.001 / sf0.01 / sf0.1 (100x total
span) in one warmed session, min-of-2 per point, and reports the
0.01->0.1 growth factor. A query whose wall grows ~linearly (factor
<= ~10) or sublinearly on a 10x data step is compute/scan-bound the
way a scalable plan should be; a superlinear factor flags a pairwise
blowup or a plan that stopped reusing its partitioning — the
empirical answer to "would this survive 100x", measured rather than
argued.

Factors well BELOW 10 mean fixed per-query overhead (planning, job
launch, codegen) still dominates at these sizes; that overhead is
amortized at real scale, so the marginal factor is the signal here.

Usage: python tools/scaling_curve.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

DEFAULT_QUERIES = (
    "q1_pricing_summary",       # scan-bound grouped agg
    "q5_region_revenue",        # star join, broadcast dims
    "last_shippers_by_supplier",  # agg + window (Q21 rewrite)
    "job_cv_matching",          # inverted-index explode join
    "docs_dedup_keep_best",     # blocked pairs + iterative CC
    "docs_minhash_near_dups",   # banded LSH join
    "ann_cosine_topk",          # broadcast query set, vector math
    "tfidf_top_terms",          # explode + broadcast vocab join
    "events_sessionization",    # window over user partitions
    "copurchase_pagerank",      # iterative join+agg
    "doc_stats",                # narrow text projection
    "join_key_skew_audit",      # two-level key census
)


def main() -> int:
    from bigdata_jobmatching_spark.plans.catalog import load_all
    from bigdata_jobmatching_spark.session import get_spark

    names = sys.argv[1:] or list(DEFAULT_QUERIES)
    spark = get_spark("scaling-curve")
    reg = load_all()

    # warm every family at the smallest SF first
    for n in names:
        reg[n].spark(spark, SFS[0]).write.format("noop").mode("overwrite").save()

    print(f"{'query':28s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} {'x(.01->.1)':>10s}")
    for n in names:
        walls = []
        for sf in SFS:
            best = None
            for _ in range(2):
                t0 = time.time()
                reg[n].spark(spark, sf).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            walls.append(best)
        factor = walls[2] / walls[1] if walls[1] > 0 else float("inf")
        print(f"{n:28s} {walls[0]:8.2f} {walls[1]:8.2f} {walls[2]:8.2f} {factor:10.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
