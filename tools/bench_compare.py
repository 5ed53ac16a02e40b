"""Diff two bench outputs (raw `bench.py` JSON lines or the driver's
BENCH_r*.json wrappers): common-subset totals, per-query deltas, and
entries unique to either side. Usage:

    python tools/bench_compare.py BENCH_r03.json /tmp/bench_now.json
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict[str, float]:
    with open(path) as fh:
        raw = fh.read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d["queries"]
    # driver wrapper: the bench line is embedded in a captured tail
    hay = d["tail"] if isinstance(d, dict) and "tail" in d else raw
    m = re.search(r'\{"metric".*\}', hay)
    if m:
        return json.loads(m.group(0))["queries"]
    raise SystemExit(f"no bench JSON found in {path}")


def main(argv: list[str]) -> int:
    if len(argv) != 2:
        print(__doc__)
        return 2
    a, b = (load_bench(p) for p in argv)
    common = sorted(set(a) & set(b))
    ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
    print(f"common subset: {len(common)} queries  "
          f"A={ta:.1f}s  B={tb:.1f}s  ({(tb - ta) / ta * 100:+.0f}%)")
    deltas = sorted(((b[q] - a[q], q) for q in common), reverse=True)
    print("largest regressions (B-A):")
    for d, q in deltas[:5]:
        print(f"  {q:35s} {a[q]:7.2f} -> {b[q]:7.2f}  ({d:+.2f})")
    print("largest improvements (B-A):")
    for d, q in deltas[-5:]:
        print(f"  {q:35s} {a[q]:7.2f} -> {b[q]:7.2f}  ({d:+.2f})")
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
    if only_a:
        print("only in A:", ", ".join(only_a))
    if only_b:
        print("only in B:", ", ".join(only_b))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
