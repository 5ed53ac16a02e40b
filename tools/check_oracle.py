"""Local twin of the driver's correctness gate.

Runs every queries() entry at a given SF dir through Spark AND its
oracle_sql() through DuckDB, then compares row count, column names,
and order-insensitive per-row value hashes. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def row_hashes(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        s = "|".join(canon_value(r[i]) for i in order)
        out.append(hashlib.md5(s.encode()).hexdigest())
    return sorted(out)


def _duckdb_modules():
    """DuckDB version matrix (round-10 verdict task #1: the driver's
    DuckDB version is a standing suspect whenever a query passes this
    local twin but fails the external gate). Yields (version, module)
    for every importable DuckDB: the installed one, plus any
    alternate builds listed in DUCKDB_MATRIX_PATHS (colon-separated
    dirs each containing a `duckdb` package — e.g. unpacked wheels of
    other releases). This sandbox ships exactly one build and has no
    network to fetch others, so the matrix is usually a single entry;
    the version is printed with the run so every PASS/FAIL line is
    attributable to a concrete engine build.
    """
    import importlib
    import os

    import duckdb as installed

    yield installed.__version__, installed
    # Snapshot the installed build's sys.modules entries so a later
    # bare `import duckdb` in this process resolves back to it, not
    # to whichever alternate build the matrix scan imported last.
    snapshot = {m: sys.modules[m] for m in list(sys.modules)
                if m == "duckdb" or m.startswith("duckdb.")}
    try:
        for p in filter(None, os.environ.get(
                "DUCKDB_MATRIX_PATHS", "").split(":")):
            sys.path.insert(0, p)
            try:
                importlib.invalidate_caches()
                for mod_name in list(sys.modules):
                    if (mod_name == "duckdb"
                            or mod_name.startswith("duckdb.")):
                        del sys.modules[mod_name]
                alt = importlib.import_module("duckdb")
                if alt.__version__ != installed.__version__:
                    yield alt.__version__, alt
            finally:
                sys.path.remove(p)
    finally:
        for mod_name in list(sys.modules):
            if mod_name == "duckdb" or mod_name.startswith("duckdb."):
                del sys.modules[mod_name]
        sys.modules.update(snapshot)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    matrix = list(_duckdb_modules())
    print("duckdb matrix: " + ", ".join(v for v, _ in matrix))
    duckdb = matrix[0][1]
    # Matrix mode: with >1 build available, every oracle runs under
    # EVERY build and the per-build hashes must agree before the
    # Spark comparison even starts — a cross-version oracle
    # divergence is reported as its own failure class.
    alt_builds = matrix[1:]

    import __spark_entry__ as entry_mod
    from bigdata_jobmatching_spark.session import get_spark

    spark = get_spark("oracle-check")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    def _mk_con(mod):
        c = mod.connect()
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"):
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        return c

    con = _mk_con(duckdb)
    alt_cons = [(v, _mk_con(m)) for v, m in alt_builds]

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        # cross-version matrix: the SAME oracle under every other
        # available DuckDB build must hash identically — a divergence
        # here is a portability bug in the oracle SQL itself,
        # independent of Spark
        xver = []
        for ver, acon in alt_cons:
            try:
                ares = acon.execute(sql)
                a_cols = [d[0] for d in ares.description]
                a_rows = ares.fetchall()
                if (sorted(a_cols) != sorted(d_cols)
                        or row_hashes(a_cols, a_rows)
                        != row_hashes(d_cols, d_rows)):
                    xver.append(ver)
            except Exception as e:  # noqa: BLE001
                xver.append(f"{ver} ({type(e).__name__})")
        if xver:
            print(f"FAIL {name}: oracle diverges across duckdb builds: "
                  f"{matrix[0][0]} vs {', '.join(xver)}")
            n_fail += 1
            continue
        problems = []
        # Type-parity guard (round-4 lesson): fetchall() coerces DuckDB
        # HUGEINT to Python int, hiding the int128-vs-int64 rendering
        # divergence the driver gate DOES see. DESCRIBE and reject any
        # column type with no exact Spark counterpart.
        from tools.oracle_type_audit import CANARY_COLUMNS, type_problems
        for col, duck_type, *_ in con.execute(f"DESCRIBE {sql}").fetchall():
            if (name, col) in CANARY_COLUMNS:
                continue  # deliberate rendering canary (see the audit)
            reason = type_problems(duck_type)
            if reason is not None:
                problems.append(f"oracle col {col} gate-unsafe type {reason}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            sh, dh = row_hashes(s_cols, s_rows), row_hashes(d_cols, d_rows)
            if sh != dh:
                ndiff = sum(1 for a, b in zip(sh, dh) if a != b)
                problems.append(f"value-hash mismatch ({ndiff}/{len(sh)} rows differ)")
                # per-column decomposition (round-9 verdict #1: localize
                # WHICH column diverges when the row hash can't say) —
                # Counter multisets so duplicate-count-only divergences
                # still show concrete values (a plain membership scan
                # would print empty diffs for exactly that class)
                from collections import Counter
                s_by = {c: Counter(canon_value(r[i]) for r in s_rows)
                        for i, c in enumerate(s_cols)}
                d_by = {c: Counter(canon_value(r[i]) for r in d_rows)
                        for i, c in enumerate(d_cols)}
                bad_cols = [c for c in sorted(s_by) if s_by[c] != d_by.get(c)]
                if bad_cols:
                    print(f"    diverging columns: {bad_cols}")
                else:
                    print("    diverging columns: NONE (column multisets"
                          " equal -> divergence is in the row-wise"
                          " pairing)")
                for c in bad_cols[:2]:
                    s_only = list((s_by[c] - d_by.get(c, Counter()))
                                  .elements())
                    d_only = list((d_by.get(c, Counter()) - s_by[c])
                                  .elements())
                    print(f"    col {c}: spark-only {s_only[:3]} "
                          f"duck-only {d_only[:3]}")
                s_set = set(sh)
                d_map = {}
                order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                for r in d_rows:
                    s = "|".join(canon_value(r[i]) for i in order)
                    d_map[hashlib.md5(s.encode()).hexdigest()] = r
                shown = 0
                for h, r in d_map.items():
                    if h not in s_set and shown < 3:
                        print(f"    duck-only row: {r}")
                        shown += 1
                s_map = {}
                order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                for r in s_rows:
                    s = "|".join(canon_value(r[i]) for i in order)
                    s_map[hashlib.md5(s.encode()).hexdigest()] = r
                shown = 0
                for h, r in s_map.items():
                    if h not in set(dh) and shown < 3:
                        print(f"    spark-only row: {r}")
                        shown += 1
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
