"""Seeded random query-equivalence fuzzing (mini-SQLancer).

The oracle gate checks ~150 hand-written queries; this attacks the
space BETWEEN them: a deterministic generator builds random
filter/group/aggregate ASTs over lineitem (x orders), renders each
AST twice — once to DataFrame operations, once to DuckDB SQL — and
the results must value-hash-identically. Any divergence is either an
engine-semantics mismatch (the round-3 failure class: float rounding,
coercion, null handling) or a generator bug; both are worth failing
loudly on.

The AST stays inside the repo's determinism conventions by
construction: sums of money go through per-row DECIMAL casts,
quantities aggregate as BIGINT, and only total-order-safe outputs are
produced (group keys + aggregates; ORDER BY+LIMIT only with a
unique-key tie-break). Seeded: the same seed
always generates the same queries, so a CI failure reproduces.

Usage:
    python tools/fuzz_equivalence.py [n_cases] [seed] [sf_dir]
"""

from __future__ import annotations

import random
import sys

sys.path.insert(0, "/root/repo")

MONEY = "DECIMAL(18,6)"

# predicate atoms: (spark_sql_condition, duckdb_condition) — identical
# text where the dialects agree
_FLAGS = ["A", "N", "R"]
_STATUS = ["F", "O"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _rand_pred(rng: random.Random, with_orders: bool) -> tuple[str, str]:
    kind = rng.randrange(6 if with_orders else 5)
    if kind == 0:
        lo = rng.randrange(1, 45)
        hi = lo + rng.randrange(1, 10)
        c = f"l_quantity >= {lo} AND l_quantity < {hi}"
        return c, c
    if kind == 1:
        y = rng.randrange(1995, 2001)
        m = rng.randrange(1, 12)
        c_spark = f"l_shipdate >= '{y}-{m:02d}-01'"
        c_duck = f"l_shipdate >= TIMESTAMP '{y}-{m:02d}-01'"
        if rng.random() < 0.5:
            y2 = y + rng.randrange(0, 2)
            c_spark += f" AND l_shipdate < '{y2 + 1}-01-01'"
            c_duck += f" AND l_shipdate < TIMESTAMP '{y2 + 1}-01-01'"
        return c_spark, c_duck
    if kind == 2:
        flags = rng.sample(_FLAGS, rng.randrange(1, 3))
        inlist = ", ".join(f"'{f}'" for f in flags)
        c = f"l_returnflag IN ({inlist})"
        if rng.random() < 0.3:
            c = f"NOT ({c})"
        return c, c
    if kind == 3:
        pct = rng.randrange(1, 10)
        c = f"l_discount >= 0.0{pct}"
        return c, c
    if kind == 4:
        c = f"l_linestatus = '{rng.choice(_STATUS)}'"
        return c, c
    c = f"o_orderpriority = '{rng.choice(_PRIORITIES)}'"
    return c, c


_GROUPS = [
    # (key name, spark expr, duckdb expr)
    ("l_returnflag", "l_returnflag", "l_returnflag"),
    ("l_linestatus", "l_linestatus", "l_linestatus"),
    ("ship_year", "year(l_shipdate)", "CAST(EXTRACT(year FROM l_shipdate) AS INT)"),
    ("qty_band", "CAST(l_quantity AS BIGINT) div 10", "CAST(l_quantity AS BIGINT) // 10"),
]

_AGGS = [
    ("n_rows", "COUNT(*)", "COUNT(*)"),
    (
        "sum_qty",
        "SUM(CAST(l_quantity AS BIGINT))",
        "COALESCE(SUM(CAST(l_quantity AS BIGINT)), 0)",
    ),
    (
        "revenue",
        f"CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE)",
        f"CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS {MONEY})) AS DOUBLE)",
    ),
    (
        "max_qty",
        "MAX(CAST(l_quantity AS BIGINT))",
        "MAX(CAST(l_quantity AS BIGINT))",
    ),
    (
        "n_orders",
        "COUNT(DISTINCT l_orderkey)",
        "COUNT(DISTINCT l_orderkey)",
    ),
]


_DOC_PREDS = [
    ("lang IN ('en', 'fr')", "lang IN ('en', 'fr')"),
    ("lang = 'en'", "lang = 'en'"),
    ("n_chars >= {lo} AND n_chars < {hi}", "n_chars >= {lo} AND n_chars < {hi}"),
    ("source LIKE 'src1%'", "source LIKE 'src1%'"),
    ("text LIKE '%table%'", "text LIKE '%table%'"),
]


def gen_doc_case(rng: random.Random) -> dict:
    """Documents-table variant: string predicates, LIKE patterns,
    length bands, optional HAVING and deterministic ORDER BY+LIMIT."""
    n_preds = rng.randrange(1, 3)
    preds = []
    for _ in range(n_preds):
        t = rng.choice(_DOC_PREDS)
        lo = rng.randrange(0, 400)
        hi = lo + rng.randrange(50, 400)
        preds.append((t[0].format(lo=lo, hi=hi), t[1].format(lo=lo, hi=hi)))
    joiner = " OR " if rng.random() < 0.3 else " AND "
    where_s = joiner.join(f"({p[0]})" for p in preds)

    group = rng.choice(["source", "lang", None])
    having = ""
    order = ""
    if group:
        sel = (f"{group}, COUNT(*) AS n_docs, "
               f"SUM(CAST(n_chars AS BIGINT)) AS total_chars")
        gb = " GROUP BY 1"
        if rng.random() < 0.5:
            having = f" HAVING COUNT(*) >= {rng.randrange(1, 5)}"
        if rng.random() < 0.5:
            # deterministic top-k: unique group key breaks all ties
            order = f" ORDER BY n_docs DESC, {group} LIMIT {rng.randrange(1, 6)}"
    else:
        sel = ("COUNT(*) AS n_docs, "
               "COALESCE(SUM(CAST(n_chars AS BIGINT)), CAST(0 AS BIGINT)) AS total_chars")
        gb = ""
    sql_s = f"SELECT {sel} FROM documents WHERE {where_s}{gb}{having}{order}"
    return {"spark_sql": sql_s, "duck_sql": sql_s}


def gen_leftjoin_case(rng: random.Random) -> dict:
    """orders LEFT JOIN lineitem with a join-side filter that makes
    some orders childless: COUNT(col) vs COUNT(*) vs SUM over NULL
    groups — the null-counting semantics corner."""
    lo = rng.randrange(30, 50)
    y = rng.randrange(1995, 2000)
    sub = (f"SELECT l_orderkey, l_quantity FROM lineitem "
           f"WHERE l_quantity >= {lo} AND l_shipdate >= TIMESTAMP '{y}-01-01'")
    sql = (f"SELECT o_orderpriority, COUNT(*) AS n_rows, "
           f"COUNT(l_orderkey) AS n_lines, "
           f"COALESCE(SUM(CAST(l_quantity AS BIGINT)), CAST(0 AS BIGINT)) AS sum_qty "
           f"FROM orders LEFT JOIN ({sub}) li ON o_orderkey = li.l_orderkey "
           f"GROUP BY 1")
    return {"spark_sql": sql, "duck_sql": sql}


_SCALARS = [
    # identical semantics in both engines on non-null input
    ("len_t", "length(text)", "length(text)"),
    ("up_lang", "upper(lang)", "upper(lang)"),
    ("sub_src", "substr(source, 1, 4)", "substr(source, 1, 4)"),
    ("rep_t", "length(replace(text, 'a', ''))", "length(replace(text, 'a', ''))"),
    ("trim_l", "trim(lang)", "trim(lang)"),
    ("low_src", "lower(source)", "lower(source)"),
]


def gen_scalar_case(rng: random.Random) -> dict:
    """Row-level scalar projection over documents — string function
    semantics compared value-for-value on every row."""
    picks = rng.sample(_SCALARS, rng.randrange(2, 5))
    sel = ", ".join(["doc_id"] + [f"{e} AS {n}" for n, e, _ in picks])
    lo = rng.randrange(0, 300)
    sql = f"SELECT {sel} FROM documents WHERE n_chars >= {lo}"
    return {"spark_sql": sql, "duck_sql": sql}


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def gen_events_case(rng: random.Random) -> dict:
    """Events-table variant: time bucketing over the TIMESTAMP(NANOS)
    column (Spark reads it through the legacy nanosAsLong conversion,
    DuckDB natively — the truncation chains must agree), value-cents
    sums, type filters."""
    types = rng.sample(_EVENT_TYPES, rng.randrange(1, 4))
    inlist = ", ".join(f"'{t}'" for t in types)
    preds = [f"event_type IN ({inlist})"]
    if rng.random() < 0.5:
        lo = rng.randrange(0, 50)
        preds.append(f"value >= {lo}.0")
    if rng.random() < 0.4:
        d = rng.randrange(2, 28)
        preds.append(f"ts >= TIMESTAMP '2024-01-{d:02d}'")
    where = " AND ".join(preds)
    grain = rng.choice([
        ("day", "CAST(ts AS DATE)"),
        ("hr", "epoch_ms(ts) // 3600000"),
        ("etype", "event_type"),
    ])
    gname, gexpr_duck = grain
    gexpr_spark = {
        "day": "CAST(ts AS DATE)",
        "hr": "unix_millis(ts) div 3600000",
        "etype": "event_type",
    }[gname]
    aggs_s = ("COUNT(*) AS n, SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents, "
              "COUNT(DISTINCT user_id) AS n_users")
    sql_s = (f"SELECT {gexpr_spark} AS {gname}, {aggs_s} "
             f"FROM events WHERE {where} GROUP BY 1")
    sql_d = (f"SELECT {gexpr_duck} AS {gname}, {aggs_s} "
             f"FROM events WHERE {where} GROUP BY 1")
    return {"spark_sql": sql_s, "duck_sql": sql_d}


def gen_case(rng: random.Random) -> dict:
    """One random AST rendered to (spark plan builder args, duckdb sql)."""
    with_orders = rng.random() < 0.4
    n_preds = rng.randrange(1, 4)
    preds = [_rand_pred(rng, with_orders) for _ in range(n_preds)]
    joiner = " OR " if rng.random() < 0.25 else " AND "
    # OR across order-side + lineitem-side predicates is fine: the
    # join is inner on the key either way
    spark_where = joiner.join(f"({p[0]})" for p in preds)
    duck_where = joiner.join(f"({p[1]})" for p in preds)
    # orders predicates force the join
    needs_orders = with_orders and any("o_orderpriority" in p[0] for p in preds)

    groups = rng.sample(_GROUPS, rng.randrange(0, 3))
    aggs = rng.sample(_AGGS, rng.randrange(1, 4))
    # sum_qty nullability: Spark SUM over zero rows yields NULL group
    # never (groups only exist with rows) but global agg with no rows
    # yields one NULL row vs DuckDB same — keep COALESCE on duck side
    # and wrap spark side when ungrouped
    spark_aggs = []
    duck_aggs = []
    for name, s_expr, d_expr in aggs:
        if name == "sum_qty" and not groups:
            s_expr = "COALESCE(SUM(CAST(l_quantity AS BIGINT)), CAST(0 AS BIGINT))"
        spark_aggs.append(f"{s_expr} AS {name}")
        duck_aggs.append(f"{d_expr} AS {name}")

    g_names = [g[0] for g in groups]
    s_groups = [g[1] for g in groups]
    d_groups = [g[2] for g in groups]

    sel_s = ", ".join(
        [f"{e} AS {n}" for n, e in zip(g_names, s_groups)] + spark_aggs
    )
    sel_d = ", ".join(
        [f"{e} AS {n}" for n, e in zip(g_names, d_groups)] + duck_aggs
    )
    join_s = " JOIN orders ON l_orderkey = o_orderkey" if needs_orders else ""
    gb = (
        " GROUP BY " + ", ".join(str(i + 1) for i in range(len(groups)))
        if groups
        else ""
    )
    spark_sql = f"SELECT {sel_s} FROM lineitem{join_s} WHERE {spark_where}{gb}"
    duck_sql = f"SELECT {sel_d} FROM lineitem{join_s} WHERE {duck_where}{gb}"
    return {"spark_sql": spark_sql, "duck_sql": duck_sql}


def run_fuzz(n_cases: int = 25, seed: int = 42, sf_dir: str = "/root/testdata/sf0.01",
             spark=None, verbose: bool = True) -> list[dict]:
    """Run n_cases; returns the list of FAILURES (empty = all equal)."""
    import duckdb

    from bigdata_jobmatching_spark.session import get_spark
    from bigdata_jobmatching_spark.sources.io import register_views
    from tools.check_oracle import row_hashes

    spark = spark or get_spark("fuzz-equivalence")
    register_views(spark, sf_dir, "lineitem", "orders", "documents", "events")
    con = duckdb.connect()
    for t in ("lineitem", "orders", "documents", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    rng = random.Random(seed)
    failures = []
    for i in range(n_cases):
        roll = rng.random()
        if roll < 0.22:
            case = gen_doc_case(rng)
        elif roll < 0.36:
            case = gen_scalar_case(rng)
        elif roll < 0.46:
            case = gen_leftjoin_case(rng)
        elif roll < 0.60:
            case = gen_events_case(rng)
        else:
            case = gen_case(rng)
        sdf = spark.sql(case["spark_sql"])
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(case["duck_sql"])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        ok = (
            sorted(s_cols) == sorted(d_cols)
            and len(s_rows) == len(d_rows)
            and row_hashes(s_cols, s_rows) == row_hashes(d_cols, d_rows)
        )
        if verbose:
            print(f"{'PASS' if ok else 'FAIL'} case {i}: "
                  f"{len(s_rows)} rows :: {case['spark_sql'][:100]}")
        if not ok:
            failures.append({**case, "i": i, "spark_rows": len(s_rows),
                             "duck_rows": len(d_rows)})
    return failures


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    failures = run_fuzz(n, seed, sf)
    print(f"{n - len(failures)} pass, {len(failures)} fail")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
