"""Temporal joins, salted agg equivalence, Arrow ANN parity, MLlib LSH."""

from __future__ import annotations

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from bigdata_jobmatching_spark.operators import similarity_search as ANN
from bigdata_jobmatching_spark.operators.mllib_lsh import mllib_minhash_pairs
from bigdata_jobmatching_spark.operators.temporal import asof_join, range_join
from bigdata_jobmatching_spark.sources.io import load_table


def _ts(m: int) -> datetime:
    return datetime(2024, 1, 1, 10, m, 0)


def test_asof_join_hand_case(spark):
    trades = spark.createDataFrame(
        [(1, _ts(5), "t1"), (1, _ts(20), "t2"), (2, _ts(10), "t3")],
        "key int, ts timestamp, trade string",
    )
    quotes = spark.createDataFrame(
        [(1, _ts(3), 100.0), (1, _ts(5), 101.0), (1, _ts(15), 105.0), (2, _ts(30), 200.0)],
        "key int, qts timestamp, px double",
    )
    out = {
        r.trade: r.px_asof
        for r in asof_join(
            trades, quotes, "key", "ts", "qts", ["px"], tiebreak=["trade"]
        ).collect()
    }
    # t1 at 10:05 matches the exact-tie quote at 10:05 (right sorts first)
    assert out == {"t1": 101.0, "t2": 105.0, "t3": None}


def test_range_join_bucketed_equals_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_millis(F.unix_millis("ts"))
    )
    a = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("sid"), "ts"
    )
    b = ev.filter(F.col("event_type") != "signup").select(
        F.col("user_id"), F.col("event_id").alias("oid"), F.col("ts").alias("ots")
    )
    plain = range_join(a, b, "user_id", "ts", "ots", 3600).select("sid", "oid")
    bucketed = range_join(a, b, "user_id", "ts", "ots", 3600, bucket_minutes=60).select("sid", "oid")
    assert plain.exceptAll(bucketed).count() == 0
    assert bucketed.exceptAll(plain).count() == 0


def test_arrow_ann_matches_native_exact(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    native = ANN.brute_force_topk(e, q, "vec_id", "embedding", k=5, score_decimals=6)
    arrow = ANN.brute_force_topk_arrow(e, q, "vec_id", "embedding", k=5, score_decimals=6)
    n = native.select("query_id", "neighbor_id", "rnk")
    a = arrow.select("query_id", "neighbor_id", "rnk")
    assert n.exceptAll(a).count() == 0 and a.exceptAll(n).count() == 0


def test_arrow_ann_rejects_oversized_query_set(spark, sf_dir):
    # the closure-broadcast contract is a SMALL query set; a misuse
    # must fail loudly (limit-bounded collect), not OOM the driver.
    import pytest

    e = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="max_queries"):
        ANN.brute_force_topk_arrow(e, e, "vec_id", "embedding", k=5, max_queries=10)


def test_mllib_lsh_agrees_with_native_on_planted_dups(spark):
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(57)) + " x1 x2 x3"
    far = " ".join(f"zzz{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = mllib_minhash_pairs(df, "doc_id", "text", jaccard_threshold=0.5).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]


def test_tfidf_pipeline(spark, sf_dir):
    from bigdata_jobmatching_spark.operators.mllib_lsh import tfidf_top_terms

    d = load_table(spark, sf_dir, "documents")
    out = tfidf_top_terms(d, "doc_id", "text")
    rows = out.limit(3).collect()
    assert len(rows) == 3
    assert all(r.tfidf.numNonzeros() > 0 for r in rows)


def test_sql_registered_pandas_udf(spark, sf_dir):
    """The spark.udf.register path the reference uses for SQL-callable
    UDFs (load_to_bigquery.py:143-147) — demonstrated with an Arrow
    pandas_udf, the only sanctioned Python-per-row style."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def py_char_entropy(s: pd.Series) -> pd.Series:
        import math

        def ent(t):
            if not t:
                return 0.0
            from collections import Counter
            n = len(t)
            return -sum(c / n * math.log2(c / n) for c in Counter(t).values())

        return s.map(ent)

    spark.udf.register("py_char_entropy", py_char_entropy)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udf_test")
    row = spark.sql(
        "SELECT max(py_char_entropy(text)) AS h FROM docs_udf_test"
    ).collect()[0]
    assert row.h > 1.0


def test_ivf_ann_recall(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    exact = ANN.brute_force_topk(e, q, "vec_id", "embedding", k=5)
    ivf = ANN.ivf_topk(e, q, "vec_id", "embedding", n_cells=8, n_probe=4, k=5)
    hits = exact.join(ivf, ["query_id", "neighbor_id"], "left_semi").count()
    total = exact.count()
    assert total > 0
    # probing half the cells on random data must recover a meaningful
    # fraction of true neighbors (clustered real data does far better)
    assert hits / total >= 0.4, f"recall {hits}/{total}"
    # full probe == exact
    full = ANN.ivf_topk(e, q, "vec_id", "embedding", n_cells=8, n_probe=8, k=5)
    miss = exact.select("query_id", "neighbor_id").exceptAll(
        full.select("query_id", "neighbor_id")
    ).count()
    assert miss == 0


def test_ivf_fixed_full_probe_equals_brute_force(spark, sf_dir):
    # PROPERTY: probing every cell makes fixed-centroid IVF exact —
    # the candidate set becomes the whole corpus, so (query, neighbor,
    # rnk) must match brute force row for row.
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    cents = ANN.lcg_centroids(4, 64)
    ivf = ANN.ivf_topk_fixed(
        e, q, "vec_id", "embedding", centroids=cents,
        n_probe=4, k=5, score_decimals=6,
    ).select("query_id", "neighbor_id", "rnk")
    bf = ANN.brute_force_topk(
        e, q, "vec_id", "embedding", k=5, score_decimals=6
    ).select("query_id", "neighbor_id", "rnk")
    assert ivf.exceptAll(bf).count() == 0 and bf.exceptAll(ivf).count() == 0


def test_ivf_fixed_partial_probe_recall(spark, sf_dir):
    # with 2 of 4 cells probed, recall against brute force stays
    # useful (>= 0.3 on random vectors; real clustered data is higher)
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0)
    cents = ANN.lcg_centroids(4, 64)
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ANN.ivf_topk_fixed(
            e, q, "vec_id", "embedding", centroids=cents, n_probe=2, k=5
        ).collect()
    }
    bf = {
        (r.query_id, r.neighbor_id)
        for r in ANN.brute_force_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    assert len(bf) > 0
    assert len(ivf & bf) / len(bf) >= 0.3


def test_lsh_wide_dim_plans_fast(spark):
    # dim=512 used to cross the plane-literal budget (4*8*512 literal
    # nodes -> analysis dwarfed the query; the operator raised). With
    # the planes shipped as a 1-row broadcast column the plan is O(1)
    # nodes at any width: building AND executing the dim=512 plan on a
    # small frame must finish in seconds, not choke on analysis.
    import time

    from bigdata_jobmatching_spark.operators import similarity_search as SS

    rng = [
        (i, [((i * 31 + j * 7) % 17 - 8) / 8.0 for j in range(512)])
        for i in range(8)
    ]
    df = spark.createDataFrame(rng, "id long, vec array<double>")
    t0 = time.time()
    out = SS.lsh_ann_topk(
        df, df.filter("id = 0"), "id", "vec", dim=512, tables=4, bits=8, k=3
    ).collect()
    assert time.time() - t0 < 60
    assert all(r.query_id == 0 and r.neighbor_id != 0 for r in out)
