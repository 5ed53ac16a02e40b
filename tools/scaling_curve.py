"""Measured scaling curves: how does each headline query's wall time
grow when the data grows 10x?

Runs representative queries at sf0.001 / sf0.01 / sf0.1 (100x total
span) in one warmed session, min-of-2 per point, and reports the
0.01->0.1 growth factor — and, when the private /tmp sf1 tier exists
(tools/gen_scale_tier.py), the 0.1->1 factor on top, a full 1000x
measured span. A query whose wall grows ~linearly (factor <= ~10) or
sublinearly on a 10x data step is compute/scan-bound the way a
scalable plan should be; a superlinear factor flags a pairwise blowup
or a plan that stopped reusing its partitioning — the empirical
answer to "would this survive 100x", measured rather than argued.

Factors well BELOW 10 mean fixed per-query overhead (planning, job
launch, codegen) still dominates at these sizes; that overhead is
amortized at real scale, so the marginal factor at the LARGEST step
is the signal here.

Usage:
  python tools/gen_scale_tier.py /root/testdata/sf0.1 /tmp/spark_graft_sf1 10
  python tools/scaling_curve.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SF1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")

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
    sfs = list(SFS)
    have_sf1 = os.path.isdir(SF1)
    if have_sf1:
        sfs.append(SF1)
    spark = get_spark("scaling-curve")
    reg = load_all()

    # warm every family at the smallest SF first
    for n in names:
        reg[n].spark(spark, sfs[0]).write.format("noop").mode("overwrite").save()

    hdr = f"{'query':28s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s}"
    if have_sf1:
        hdr += f" {'sf1':>8s}"
    hdr += f" {'x(.01->.1)':>10s}"
    if have_sf1:
        hdr += f" {'x(.1->1)':>9s}"
    print(hdr)
    for n in names:
        walls = []
        for sf in sfs:
            best = None
            for _ in range(2):
                t0 = time.time()
                reg[n].spark(spark, sf).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            walls.append(best)
        line = f"{n:28s} " + " ".join(f"{w:8.2f}" for w in walls)
        line += f" {walls[2] / walls[1] if walls[1] > 0 else float('inf'):10.1f}"
        if have_sf1:
            line += f" {walls[3] / walls[2] if walls[2] > 0 else float('inf'):9.1f}"
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
