"""Generate a private larger scale tier by deterministic replication
of an existing test-lake tier — the 10x step above sf0.1 that the
driver does not ship, used ONLY for scaling-curve measurements
(tools/scaling_curve.py); it is never an oracle input.

Method: each table is unioned N times with replica r's keys offset by
r * OFFSET, where OFFSET is the smallest power of 10 above the
table's max key. A power of 10 preserves the `key % 10/20/50/100`
residue structure the registered queries sample and derive attributes
from, so every replica contributes the same row count to every
modulus filter and the workload's selectivities survive the scale-up.
Foreign keys are remapped with the SAME offsets as their dimension
(l_orderkey/l_partkey/l_suppkey, o_custkey), so join fan-outs scale
exactly linearly; region/nation stay fixed (they are fixed-size dims
at any real scale too).

Documents: replica 0 keeps the original text; replica r > 0 tags
every word with an `r<r>` prefix. Token counts and document shapes
are preserved, but replicas share no tokens/shingles — the corpus
grows 10x while near-duplicate density stays constant, which is the
honest null model for dedup scaling (naive text copies would make
every doc a 10-way near-dup cluster and measure dup-density blowup,
not corpus growth).

Embeddings: replica r rotates labels and perturbs one coordinate by a
small deterministic epsilon so vectors are distinct but the geometry
(norms, cluster structure) is essentially unchanged.

Events: user_id and event_id offset per replica, timestamps kept —
10x events over the same wall-clock span, i.e. a 10x-hotter stream
with the same key-skew shape.

Usage: python tools/gen_scale_tier.py SRC_DIR DST_DIR [N]
  e.g. python tools/gen_scale_tier.py /root/testdata/sf0.1 /tmp/spark_graft_sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb


def _pow10_above(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def generate(src: str, dst: str, replicas: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')"
        )

    off = {
        k: _pow10_above(con.execute(f"SELECT max({k}) FROM {t}").fetchone()[0])
        for k, t in (
            ("o_orderkey", "orders"), ("c_custkey", "customer"),
            ("p_partkey", "part"), ("s_suppkey", "supplier"),
            ("doc_id", "documents"), ("vec_id", "embeddings"),
            ("event_id", "events"), ("user_id", "events"),
        )
    }
    rng = f"(SELECT unnest(range({replicas})) AS r)"

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    # fixed-size dims: copy as-is
    write("region", "SELECT * FROM region")
    write("nation", "SELECT * FROM nation")

    write("customer", f"""
      SELECT c_custkey + r * {off['c_custkey']} AS c_custkey,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer, {rng}""")
    write("supplier", f"""
      SELECT s_suppkey + r * {off['s_suppkey']} AS s_suppkey,
             s_name, s_nationkey, s_acctbal
      FROM supplier, {rng}""")
    write("part", f"""
      SELECT p_partkey + r * {off['p_partkey']} AS p_partkey,
             p_name, p_brand, p_type, p_size, p_retailprice
      FROM part, {rng}""")
    write("orders", f"""
      SELECT o_orderkey + r * {off['o_orderkey']} AS o_orderkey,
             o_custkey + r * {off['c_custkey']} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders, {rng}""")
    write("lineitem", f"""
      SELECT l_orderkey + r * {off['o_orderkey']} AS l_orderkey,
             l_partkey + r * {off['p_partkey']} AS l_partkey,
             l_suppkey + r * {off['s_suppkey']} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount,
             l_tax, l_returnflag, l_linestatus, l_shipdate
      FROM lineitem, {rng}""")
    write("events", f"""
      SELECT event_id + r * {off['event_id']} AS event_id,
             CAST(ts AS TIMESTAMP) AS ts,
             user_id + r * {off['user_id']} AS user_id,
             event_type, value, props
      FROM events, {rng}""")
    write("documents", f"""
      SELECT doc_id + r * {off['doc_id']} AS doc_id,
             CASE WHEN r = 0 THEN text
                  ELSE 'r' || r || replace(text, ' ', ' r' || r) END AS text,
             lang, source,
             CAST(length(CASE WHEN r = 0 THEN text
                  ELSE 'r' || r || replace(text, ' ', ' r' || r) END) AS BIGINT)
               AS n_chars
      FROM documents, {rng}""")
    write("embeddings", f"""
      SELECT vec_id + r * {off['vec_id']} AS vec_id,
             list_transform(
               list_zip(embedding, range(1, len(embedding) + 1)),
               p -> CAST(CASE WHEN p[2] = 1 + r % len(embedding)
                              THEN p[1] + 0.001 * r ELSE p[1] END AS FLOAT)
             ) AS embedding,
             CAST((label + r) % 10 AS INT) AS label
      FROM embeddings, {rng}""")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, dst, n)
