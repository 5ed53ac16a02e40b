"""Oracle type-parity audit (round-5 guard; VERDICT r4 "What's wrong" #2).

The driver's correctness gate hashes each engine's *rendered* values; it
saw 23 hash-red rows in round 4 whose only divergence was the oracle
column TYPE: DuckDB types SUM() over integer inputs as HUGEINT (int128),
which the driver renders differently from Spark's BIGINT even when every
value is bit-identical in int64. ``fetchall()`` coerces HUGEINT to
Python int, so the local value-comparing twin (tools/check_oracle.py)
could never see the difference — this audit closes that blind spot by
DESCRIBE-ing every oracle and failing on any column whose DuckDB type
has no exact Spark counterpart.

Usage:  python tools/oracle_type_audit.py [sf_dir]
Exit 0 = every oracled query's output schema maps exactly onto Spark
dtypes; exit 1 = offending (query, column, duckdb_type) rows printed.

Run with no Spark session — DESCRIBE only plans, it does not execute.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# DuckDB types with an exact Spark dtype counterpart. Anything outside
# this set either loses information (HUGEINT > int64) or renders
# differently (UUID, INTERVAL, BIT), so the gate's repr-hash can
# diverge even on equal values.
_EXACT_SPARK_TYPES = {
    "BOOLEAN": "boolean",
    "TINYINT": "tinyint",
    "SMALLINT": "smallint",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "FLOAT": "float",
    "DOUBLE": "double",
    "VARCHAR": "string",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary",
}


def _base(duck_type: str) -> str:
    """Strip list/struct wrappers down to the leaf scalar types."""
    return duck_type.strip()


def _leaf_types(duck_type: str) -> list[str]:
    """All scalar leaf types inside a possibly nested DuckDB type.

    DECIMAL(p,s) is allowed when p<=38 (Spark DecimalType matches);
    LIST/STRUCT/MAP recurse into their element types.
    """
    t = duck_type.strip()
    if t.endswith("[]"):  # LIST sugar
        return _leaf_types(t[:-2])
    for prefix in ("STRUCT(", "MAP(", "UNION("):
        if t.startswith(prefix):
            inner = t[len(prefix):-1]
            leaves: list[str] = []
            depth = 0
            cur = ""
            for ch in inner:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                if ch == "," and depth == 0:
                    leaves.extend(_leaf_types(cur.split(" ", 1)[-1]))
                    cur = ""
                else:
                    cur += ch
            if cur:
                leaves.extend(_leaf_types(cur.split(" ", 1)[-1]))
            return leaves
    return [t]


def type_problems(duck_type: str) -> str | None:
    """Return a reason string if ``duck_type`` is gate-unsafe, else None."""
    t = duck_type.strip()
    # Top-level LIST/STRUCT/MAP output columns are gate-incompatible BY
    # CONSTRUCTION regardless of their element types: the driver's pandas
    # canonicalizer sorts the result frame, and pandas cannot hash/sort
    # list/dict cells (`TypeError: unhashable type: 'list'` — the exact
    # failure that nulled inverted_index_stats in CORRECTNESS_r07).
    # Serialize to a string first (array_join / array_to_string).
    if t.endswith("[]") or t.startswith(("STRUCT(", "MAP(", "UNION(")):
        return f"top-level complex type {t} (pandas canonicalizer cannot sort it)"
    for leaf in _leaf_types(t):
        if leaf.startswith("DECIMAL("):
            # Round-11 hardening (the semantic_dedup_stats lesson: the
            # registry's single DECIMAL(38,0) column was the only
            # rows/schema-green hash-red row for two straight rounds):
            #   - p > 18 is int128-backed in DuckDB — the SAME storage
            #     class whose rendering divergence red-rowed the 23
            #     HUGEINT columns in round 4; this audit blessed it.
            #   - scale 0 is the one decimal shape whose rendering
            #     differs between a Decimal fetch ('123') and any
            #     float64-converting fetch layer ('123.0'); s >= 1
            #     values render identically both ways ('0.5'), which
            #     is why the DECIMAL(2,1) queries are proven green.
            # Gate-safe decimal = p <= 18 AND s >= 1. Integer-valued
            # outputs belong in BIGINT.
            p, s = (int(x) for x in
                    leaf[len("DECIMAL("):-1].split(","))
            if p > 18:
                return (f"{leaf} (int128-backed: p>18 renders through "
                        "the round-4 HUGEINT divergence path)")
            if s == 0:
                return (f"{leaf} (scale-0 decimal renders '123' vs "
                        "'123.0' across fetch layers; use BIGINT)")
            continue  # p<=18, s>=1: exact and render-stable
        if leaf not in _EXACT_SPARK_TYPES:
            return leaf
    return None


# Columns allowed to carry a gate-unsafe type ON PURPOSE. The round-11
# occupant, sdd_probe_dec38's n_vecs_dec38, is retired: its red r11
# gate row (rows/schema matching, hash red, while four BIGINT value
# probes over the same census frames were green) PROVED the
# driver-environment DECIMAL(38,0) rendering defect it was built to
# detect, closing the r09/r10 semantic_dedup_stats divergence as
# environmental. The finding survives as this audit's standing law
# (p>18 or scale-0 decimals rejected registry-wide) and as the
# arithmetic pin in tests/test_plan_invariants.py. Do not add entries
# here to silence a real finding.
CANARY_COLUMNS: frozenset[tuple[str, str]] = frozenset()


def audit(sf_dir: str = "/root/testdata/sf0.01") -> list[tuple[str, str, str]]:
    """(query, column, offending_type) for every gate-unsafe oracle column."""
    import duckdb

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    bad: list[tuple[str, str, str]] = []
    for name, sql in entry_mod.oracle_sql().items():
        rows = con.execute(f"DESCRIBE {sql}").fetchall()
        for col, duck_type, *_ in rows:
            if (name, col) in CANARY_COLUMNS:
                continue
            reason = type_problems(duck_type)
            if reason is not None:
                bad.append((name, col, reason))
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    bad = audit(sf_dir)
    if not bad:
        print("OK: every oracle column maps exactly onto a Spark dtype")
        return 0
    for name, col, reason in bad:
        print(f"TYPE-UNSAFE {name}.{col}: {reason}")
    print(f"\n{len(bad)} gate-unsafe columns in "
          f"{len({n for n, _, _ in bad})} queries")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
