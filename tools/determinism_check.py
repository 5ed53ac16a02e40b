"""Partition-order determinism sweep — the round-3 failure-class
detector.

The three round-3 driver-gate mismatches all passed the local oracle
twin and failed only under the driver: their results depended on
Spark's partition-merge order (raw-double sums, engine-fragile
rounding), which varies with parallelism and input splits. This tool
attacks that directly: every query runs TWICE under deliberately
different partitioning regimes —

  run A: shuffle.partitions=32, files.maxPartitionBytes=128m (default)
  run B: shuffle.partitions=5,  files.maxPartitionBytes=64k
         (many input splits, few reducers — maximally different
         merge orders and aggregation trees)

— and the order-insensitive value-hash multisets must be identical.
Any query whose values move is order-dependent and WILL eventually
hash-fail a driver gate even though the oracle twin passes.

Usage: python tools/determinism_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from check_oracle import row_hashes  # noqa: E402

REGIME_A = {"spark.sql.shuffle.partitions": "32",
            "spark.sql.files.maxPartitionBytes": "134217728"}
REGIME_B = {"spark.sql.shuffle.partitions": "5",
            "spark.sql.files.maxPartitionBytes": "65536"}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from bigdata_jobmatching_spark.session import get_spark

    spark = get_spark("determinism-check")
    qs = entry_mod.queries()

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        hashes = []
        try:
            for regime in (REGIME_A, REGIME_B):
                for k, v in regime.items():
                    spark.conf.set(k, v)
                df = fn(spark, sf_dir)
                rows = [tuple(r) for r in df.collect()]
                hashes.append(row_hashes(df.columns, rows))
        except Exception as e:  # noqa: BLE001 - sweep must finish
            print(f"FAIL {name}: error: {type(e).__name__}: {str(e)[:120]}")
            n_fail += 1
            continue
        finally:
            for k, v in REGIME_A.items():
                spark.conf.set(k, v)
        if hashes[0] == hashes[1]:
            print(f"PASS {name}: {len(hashes[0])} rows stable "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            ndiff = sum(1 for a, b in zip(hashes[0], hashes[1]) if a != b)
            ndiff += abs(len(hashes[0]) - len(hashes[1]))
            print(f"FAIL {name}: ORDER-DEPENDENT — {ndiff} row hashes moved "
                  f"between partitioning regimes")
            n_fail += 1

    print(f"\n{n_pass} stable, {n_fail} order-dependent/errored")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
