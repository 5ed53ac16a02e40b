"""Dashboard/analytics workload (PLAN_REALISATION.md:479-527 declared
queries) + remaining §2 operator specimens: collect_list grouping
(A1), arrays_zip pairing (§2.7), co-occurrence joins, approximate
aggregates (scale-out path, SURVEY §7.2-10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as X
from ..sources.io import fan_out, load_table
from .catalog import QuerySpec, register
from .text_queries import _KEYWORD_CATALOG, _SQL_TOKS

MONEY = "decimal(18,6)"


# --- customer_order_history: groupBy + collect into sorted array (A1) -----

def _order_history(spark: SparkSession, sf: str) -> DataFrame:
    # The sorted array is emitted as a comma-joined string: the driver's
    # pandas canonicalizer cannot hash raw list cells, and a deterministic
    # string encodes the same information gate-compatibly.
    o = load_table(spark, sf, "orders")
    return (
        o.filter(F.col("o_custkey") % 100 == 0)
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("orderkeys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_HISTORY_SQL = """
SELECT o_custkey,
  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
  COUNT(*) AS n_orders
FROM orders WHERE o_custkey % 100 = 0 GROUP BY o_custkey
"""

register(QuerySpec(
    "customer_order_history", _order_history, _HISTORY_SQL,
    "groupBy + collect_list into sorted array (A1, deduplicate.py:207-229)",
    ("relational", "agg", "array"),
))


# --- doc_bigrams: arrays_zip token pairing + explode (§2.7) ---------------

def _bigrams(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    pairs = d.select(F.explode(X.bigram_zip(F.col("text"))).alias("p")).select(
        F.concat_ws(" ", F.col("p.0"), F.col("p.1")).alias("bigram")
    )
    return (
        pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 30)
    )


_BIGRAMS_SQL = f"""
WITH toks AS (SELECT {_SQL_TOKS} AS t FROM documents),
pairs AS (
  SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p FROM toks WHERE len(t) >= 2
)
SELECT p[1] || ' ' || p[2] AS bigram, COUNT(*) AS n
FROM pairs GROUP BY 1 HAVING COUNT(*) >= 30
"""

register(QuerySpec(
    "doc_bigrams", _bigrams, _BIGRAMS_SQL,
    "arrays_zip bigram pairing + explode + having (extract_skills.py:311-326 shape)",
    ("text", "array", "agg"),
))


# --- skill_cooccurrence: declared dashboard (co-occurrence pairs) ---------

def _cooccurrence(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    catalog = spark.createDataFrame(_KEYWORD_CATALOG, "keyword string, category string")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(X.tokens(F.col("text")))).alias("keyword")
    ).join(F.broadcast(catalog.select("keyword")), "keyword")
    a = toks.select("doc_id", F.col("keyword").alias("kw_a"))
    b = toks.select("doc_id", F.col("keyword").alias("kw_b"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("kw_a") < F.col("kw_b"))
        .groupBy("kw_a", "kw_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 50)
    )


_KW_LIST = ", ".join(f"'{k}'" for k, _ in _KEYWORD_CATALOG)
_COOC_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_distinct({_SQL_TOKS})) AS keyword FROM documents
),
hits AS (SELECT DISTINCT doc_id, keyword FROM toks WHERE keyword IN ({_KW_LIST}))
SELECT a.keyword AS kw_a, b.keyword AS kw_b, COUNT(*) AS n_docs
FROM hits a JOIN hits b ON a.doc_id = b.doc_id AND a.keyword < b.keyword
GROUP BY 1, 2 HAVING COUNT(*) >= 50
"""

register(QuerySpec(
    "skill_cooccurrence", _cooccurrence, _COOC_SQL,
    "skill co-occurrence pairs (declared dashboard, PLAN_REALISATION.md:512-517)",
    ("text", "join", "agg", "bench"),
))


# --- avg_price_by_segment_priority: salary-by-sector dashboard analog -----

def _segment_priority(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(F.col("o_totalprice").cast(MONEY)).cast("double") / F.count(F.lit(1))).alias("avg_price"),
        )
    )


_SEGMENT_SQL = f"""
SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS {MONEY})) AS DOUBLE) / COUNT(*) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""

register(QuerySpec(
    "avg_price_by_segment_priority", _segment_priority, _SEGMENT_SQL,
    "avg-metric by two dims (avg salary by sector/experience dashboard shape)",
    ("relational", "agg", "join"),
))


# --- price_quantiles: exact interpolated percentiles ----------------------

def _quantiles(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.25).alias("p25"),
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.75).alias("p75"),
    )


_QUANTILES_SQL = """
SELECT o_orderpriority,
  quantile_cont(o_totalprice, 0.25) AS p25,
  quantile_cont(o_totalprice, 0.5) AS p50,
  quantile_cont(o_totalprice, 0.75) AS p75
FROM orders GROUP BY o_orderpriority
"""

register(QuerySpec(
    "price_quantiles", _quantiles, _QUANTILES_SQL,
    "exact interpolated percentiles per group (salary-distribution dashboard)",
    ("relational", "agg", "percentile"),
))


# --- approx_distinct_stats: approximate aggregates (scale path) -----------
# HLL sketches are implementation-specific => no cross-engine oracle;
# unit tests assert <5% relative error vs exact counts.

def _approx(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


register(QuerySpec(
    "approx_distinct_stats", _approx, None,
    "approx_count_distinct + percentile_approx (sketch-based scale path; no SQL twin)",
    ("relational", "approx"),
))


# --- price_qty_correlation: Pearson r from exact decimal moments ----------
# Native F.corr / DuckDB corr() use different one-pass formulations
# whose float error differs between engines; computing the five moments
# as exact DECIMAL sums (operands at DECIMAL(12,6) so the DECIMAL(24,12)
# products fit both engines' 38-digit limit; DuckDB needs one operand
# widened to DECIMAL(24,6) to route the multiply through int128) and
# assembling r in double at the end is
# order-independent and engine-exact — the same discipline as the
# average queries, extended to second moments.

def _corr(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    x = F.col("l_extendedprice").cast("decimal(12,6)")
    y = F.col("l_quantity").cast("decimal(12,6)")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,12)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,12)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,12)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    r = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(F.col("n").alias("n_rows"), F.round(r, 9).alias("pearson_r"))


_CORR_SQL = """
WITH m AS (
  SELECT COUNT(*) AS n,
    SUM(CAST(l_extendedprice AS DECIMAL(12,6))) AS sx,
    SUM(CAST(l_quantity AS DECIMAL(12,6))) AS sy,
    SUM(CAST(CAST(l_extendedprice AS DECIMAL(24,6)) * CAST(l_quantity AS DECIMAL(12,6)) AS DECIMAL(38,12))) AS sxy,
    SUM(CAST(CAST(l_extendedprice AS DECIMAL(24,6)) * CAST(l_extendedprice AS DECIMAL(12,6)) AS DECIMAL(38,12))) AS sxx,
    SUM(CAST(CAST(l_quantity AS DECIMAL(24,6)) * CAST(l_quantity AS DECIMAL(12,6)) AS DECIMAL(38,12))) AS syy
  FROM lineitem
)
SELECT n AS n_rows,
  round(
    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
  9) AS pearson_r
FROM m
"""

register(QuerySpec(
    "price_qty_correlation", _corr, _CORR_SQL,
    "Pearson correlation assembled from exact decimal moments "
    "(engine-independent, unlike native corr())",
    ("analytics", "agg"),
))


# --- customer_rfm_scores: RFM quartile segmentation -----------------------
# Classic recency/frequency/monetary scoring: per-customer aggregates
# then ntile(4) per metric with unique-key tie-breaks (total order ->
# engine-reproducible buckets). Monetary sums are exact DECIMAL.
# Scale shape (r12 verdict task #1): each quartile is a DISTRIBUTED
# ntile (range shuffle + parallel per-partition ranks + broadcast
# offsets, operators/ranking.py) — three parallel shuffles of the
# customer-grain frame, zero single-partition windows, same buckets
# as the oracle's window NTILE(4) bit-for-bit.

def _rfm(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranking import global_ntile

    o = load_table(spark, sf, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(MONEY)).alias("monetary_d"),
    )
    # Three INDEPENDENT ntile passes joined back on the key, not a
    # chain: global_ntile consumes its input twice (ranked frame +
    # offset counts; Spark's ReuseExchange reads the shuffle once at
    # runtime), so chaining would square the static plan per level
    # while side-by-side passes stay linear.
    # each pass consumes the SAME canonical `per` frame (no per-pass
    # projection) so the orders aggregate is planned once and shared
    # by ReuseExchange instead of re-computed three ways; DESC metric
    # orders get NEGATED bucket expressions (ASC-aligned per the
    # global_ranks contract), all with value-bounded bucket counts
    # (~2.4k order dates / ~45 order-count values / ~5k monetary
    # steps at any scale factor)
    r_s = global_ntile(
        per, [F.desc("last_order"), F.asc("o_custkey")],
        [-F.unix_date(F.col("last_order"))], 4, "r_score",
    ).select("o_custkey", "r_score")
    f_s = global_ntile(
        per, [F.desc("frequency"), F.asc("o_custkey")],
        [-F.col("frequency")], 4, "f_score",
    ).select("o_custkey", "f_score")
    m_s = global_ntile(
        per, [F.desc("monetary_d"), F.asc("o_custkey")],
        [(-F.floor(F.col("monetary_d") / 4096)).cast("long")], 4, "m_score",
    ).select("o_custkey", "m_score")
    return (
        per.join(r_s, "o_custkey").join(f_s, "o_custkey")
        .join(m_s, "o_custkey")
        .select(
            "o_custkey", "last_order", "frequency",
            F.col("monetary_d").cast("double").alias("monetary"),
            "r_score", "f_score", "m_score",
        )
        .withColumn(
            "rfm",
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"),
        )
    )


_RFM_SQL = f"""
WITH per AS (
  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_order,
    COUNT(*) AS frequency,
    SUM(CAST(o_totalprice AS {MONEY})) AS monetary_d
  FROM orders GROUP BY 1
),
scored AS (
  SELECT o_custkey, last_order, frequency,
    CAST(monetary_d AS DOUBLE) AS monetary,
    CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS INT) AS r_score,
    CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INT) AS f_score,
    CAST(ntile(4) OVER (ORDER BY monetary_d DESC, o_custkey) AS INT) AS m_score
  FROM per
)
SELECT *, r_score * 100 + f_score * 10 + m_score AS rfm FROM scored
"""

register(QuerySpec(
    "customer_rfm_scores", _rfm, _RFM_SQL,
    "RFM quartile segmentation (recency/frequency/monetary ntiles, "
    "exact-decimal monetary, total-order tie-breaks)",
    ("analytics", "window", "segmentation", "bench"),
))


# --- event_value_gini: weekly inequality of the value signal --------------
# Gini coefficient per (event_type, week) from the rank formula
# G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over ascending x —
# every term an exact int64 (half-up cents, row_number ranks), the
# final division ratio6's half-up rescaling, so both engines agree
# bit-for-bit (ties contribute identically whatever their rank
# order). The ranking window partitions by (type, week) — group
# sizes stay calendar-bounded at any corpus scale; a 100 TB variant
# with giant groups would swap exact ranks for a fixed histogram
# binning (same two-shuffle shape).

def _value_gini(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").select(
        "event_type", "event_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("event_type", "week").orderBy("cents", "event_id")
    ranked = ev.withColumn("i", F.row_number().over(w).cast("bigint"))
    from .catalog import ratio6

    return (
        ranked.groupBy("event_type", "week")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s0"),
            F.sum(F.expr("i * cents")).alias("s1"),
        )
        .select(
            "event_type", "week", "n",
            ratio6("2 * s1 - (n + 1) * s0", "NULLIF(n * s0, 0)").alias("gini"),
        )
    )


_VALUE_GINI_SQL = f"""
WITH ev AS (
  SELECT event_type, event_id,
    CAST(date_trunc('week', ts) AS DATE) AS week,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY event_type, week ORDER BY cents, event_id) AS BIGINT) AS i
  FROM ev
),
g AS (
  SELECT event_type, week, COUNT(*) AS n,
    SUM(cents) AS s0, SUM(i * cents) AS s1
  FROM ranked GROUP BY 1, 2
)
SELECT event_type, week, n,
  {{r}} AS gini
FROM g
"""

from .catalog import ratio6_sql as _r6s

register(QuerySpec(
    "event_value_gini", _value_gini,
    _VALUE_GINI_SQL.format(r=_r6s("2 * s1 - (n + 1) * s0", "NULLIF(n * s0, 0)")),
    "weekly Gini coefficient of event value per type (exact-integer "
    "rank formula, half-up cent quantization)",
    ("analytics", "window", "agg", "bench"),
))


# --- weighted_median_price: exact weighted median via cumsum window -------
# Per (returnflag, linestatus): the quantity-weighted median of
# l_extendedprice — the lower weighted median (smallest price whose
# cumulative weight reaches half the total), a total-order-unique
# definition both engines compute identically from exact integers
# (prices as half-up cents, weights as int64). Shape: one shuffle to
# the group key for the cumulative window (value-ordered within
# group), then an argmin aggregate — at 100 TB the window partitions
# are per-group and the 2x-cumweight >= total test is integer
# cross-multiplication, no float averaging.

def _weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_linestatus",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        .alias("price_cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    g = ["l_returnflag", "l_linestatus"]
    win = (
        Window.partitionBy(*g)
        .orderBy("price_cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # collapse equal prices first so the cumsum order is total
    per_price = li.groupBy(*g, "price_cents").agg(F.sum("w").alias("pw"))
    cum = per_price.withColumn("cw", F.sum("pw").over(win)).withColumn(
        "tot", F.sum("pw").over(Window.partitionBy(*g))
    )
    return (
        cum.filter(2 * F.col("cw") >= F.col("tot"))
        .groupBy(*g)
        .agg(
            F.min("price_cents").alias("median_price_cents"),
            F.max("tot").alias("total_weight"),
        )
    )


_WMEDIAN_SQL = """
WITH per_price AS (
  SELECT l_returnflag, l_linestatus,
    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents,
    SUM(CAST(l_quantity AS BIGINT)) AS pw
  FROM lineitem GROUP BY 1, 2, 3
),
cum AS (
  SELECT l_returnflag, l_linestatus, price_cents, pw,
    SUM(pw) OVER (PARTITION BY l_returnflag, l_linestatus
                  ORDER BY price_cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
    SUM(pw) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot
  FROM per_price
)
SELECT l_returnflag, l_linestatus,
  MIN(price_cents) AS median_price_cents,
  CAST(MAX(tot) AS BIGINT) AS total_weight
FROM cum WHERE 2 * cw >= tot
GROUP BY 1, 2
"""

register(QuerySpec(
    "weighted_median_price", _weighted_median, _WMEDIAN_SQL,
    "exact quantity-weighted lower median price per (flag, status) — "
    "cumulative-weight window + integer cross-multiplied half test",
    ("analytics", "window", "agg"),
))


# --- bigram_pmi_topk: collocation extraction without logs -----------------
# PMI ranks collocations by p(ab) / (p(a) p(b)); the log is monotone,
# so ranking (and the reported score) can skip it entirely — the raw
# ratio n_ab * N_uni / n_a / n_b * N_uni / N_bi is a fixed chain of
# single correctly-rounded IEEE ops on exact integers, bit-identical
# on both engines (no cross-engine ln/log2 divergence, the reason
# naive PMI is hard to oracle). Unigram and bigram tables are small
# after their one groupBy each; the scoring join broadcasts the
# unigram side.

_PMI_MIN_N = 5
_PMI_TOPK = 50


def _bigram_pmi(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    zipped = X.bigram_zip(F.col("text"))
    uni = (
        d.select(F.explode(X.tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    )
    totals = uni.agg(
        F.sum("n_w").cast("long").alias("n_uni"),
    )
    bi = (
        d.select(F.explode(zipped).alias("p"))
        .select(F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))
        .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_N)
    )
    n_bi = (
        d.select(
            F.greatest(F.size(X.tokens(F.col("text"))) - 1, F.lit(0)).alias("k")
        )
        .agg(F.sum("k").cast("long").alias("n_bi"))
    )
    scored = (
        bi
        .join(F.broadcast(uni.select(F.col("w").alias("w1"),
                                     F.col("n_w").alias("n_w1"))), "w1")
        .join(F.broadcast(uni.select(F.col("w").alias("w2"),
                                     F.col("n_w").alias("n_w2"))), "w2")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_bi))
        # fixed op order; every step a single correctly-rounded IEEE op
        .withColumn(
            "pmi_ratio",
            F.col("n_ab").cast("double") * F.col("n_uni") / F.col("n_w1")
            / F.col("n_w2") * F.col("n_uni") / F.col("n_bi"),
        )
    )
    w = Window.orderBy(F.desc("pmi_ratio"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _PMI_TOPK)
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_w1").cast("long").alias("n_w1"),
            F.col("n_w2").cast("long").alias("n_w2"),
            "pmi_ratio",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_PMI_SQL = f"""
WITH toks AS (SELECT {{toks}} AS t FROM documents),
uni AS (
  SELECT unnest(t) AS w FROM toks
),
uni_counts AS (SELECT w, COUNT(*) AS n_w FROM uni GROUP BY w),
totals AS (SELECT CAST(SUM(n_w) AS BIGINT) AS n_uni FROM uni_counts),
bi_total AS (
  SELECT CAST(SUM(greatest(len(t) - 1, 0)) AS BIGINT) AS n_bi FROM toks
),
pairs AS (
  SELECT unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS p
  FROM toks WHERE len(t) >= 2
),
bi AS (
  SELECT p[1] AS w1, p[2] AS w2, COUNT(*) AS n_ab
  FROM pairs GROUP BY 1, 2 HAVING COUNT(*) >= {_PMI_MIN_N}
),
scored AS (
  SELECT b.w1, b.w2, b.n_ab, u1.n_w AS n_w1, u2.n_w AS n_w2,
    CAST(b.n_ab AS DOUBLE) * t.n_uni / u1.n_w / u2.n_w * t.n_uni / bt.n_bi
      AS pmi_ratio
  FROM bi b
  JOIN uni_counts u1 ON b.w1 = u1.w
  JOIN uni_counts u2 ON b.w2 = u2.w
  CROSS JOIN totals t CROSS JOIN bi_total bt
)
SELECT w1 || ' ' || w2 AS bigram,
  CAST(n_ab AS BIGINT) AS n_ab,
  CAST(n_w1 AS BIGINT) AS n_w1,
  CAST(n_w2 AS BIGINT) AS n_w2,
  pmi_ratio, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
    ORDER BY pmi_ratio DESC, w1 ASC, w2 ASC) AS rnk
  FROM scored
) WHERE rnk <= {_PMI_TOPK}
"""

register(QuerySpec(
    "bigram_pmi_topk", _bigram_pmi, _PMI_SQL.format(toks=_SQL_TOKS),
    "top-k collocations by exact-rational PMI (log-free monotone "
    "ranking; broadcast unigram joins, fixed IEEE op order both "
    "engines)",
    ("text", "agg", "join"),
))


# --- corpus_checksum: order-invariant dataset fingerprint -----------------
# Reproducibility primitive: per source, XOR of per-document content
# hashes (md5 hex -> int48) — invariant to row order and partitioning
# by construction, so the same corpus always fingerprints identically
# on any engine, any shuffle, any day. One narrow pass + one tiny
# groupBy; at 100 TB this is the cheap "did the input change"
# pre-flight every pipeline run should start with.

def _corpus_checksum(spark: SparkSession, sf: str) -> DataFrame:
    d = fan_out(load_table(spark, sf, "documents"))
    h = F.conv(F.substring(F.md5(F.col("text")), 1, 12), 16, 10).cast("long")
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.expr(
            "bit_xor(CAST(conv(substring(md5(text), 1, 12), 16, 10) AS BIGINT))"
        ).alias("content_xor"),
        F.min(h).alias("min_hash"),
        F.max(h).alias("max_hash"),
    )


_CHECKSUM_SQL = """
WITH h AS (
  SELECT source, length(text) AS n_chars,
    CAST('0x' || substr(md5(text), 1, 12) AS BIGINT) AS hh
  FROM documents
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_chars) AS BIGINT) AS n_chars,
  CAST(bit_xor(hh) AS BIGINT) AS content_xor,
  CAST(min(hh) AS BIGINT) AS min_hash,
  CAST(max(hh) AS BIGINT) AS max_hash
FROM h GROUP BY source
"""

register(QuerySpec(
    "corpus_checksum", _corpus_checksum, _CHECKSUM_SQL,
    "order-invariant per-source corpus fingerprint (XOR of md5-int48 "
    "content hashes + doc/char counts) — the input-drift pre-flight",
    ("text", "agg", "audit"),
))


# --- hll_registers_audit: deterministic HLL state, value-oracled ----------
# Round-7 closure of the approx-distinct verifiability gap: the HLL
# APPROXIMATION lives only in the final float estimate — the sketch
# STATE (register maxima) is a pure deterministic function of the
# data once the hash is pinned. Registers here use the repo's
# engine-portable md5 hash (15 hex digits -> 60-bit int, the
# minhash_md5 discipline): reg = h % 1024, rho = trailing-zero count
# of h div 1024 plus one, register value = MAX(rho). The full
# register histogram plus the exact distinct count are hash-checked,
# so the sketch every executor would build and merge at 100 TB is
# externally value-proven — max() is duplicate-insensitive, so no
# pre-distinct is needed and the register pass is one map-side-
# combinable aggregation over raw rows. Output rows: (reg_rho >= 1,
# n_registers) histogram; (0, n_empty_registers); (-1, exact
# distinct) as the comparison anchor.

_HLL_M = 1024


def _hll_audit(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    hv = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10
    ).cast("long")
    rw = o.select(hv.alias("hv")).select(
        (F.col("hv") % _HLL_M).alias("reg"),
        F.expr(f"hv div {_HLL_M}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(51)).otherwise(
        F.expr("bit_count((w & -w) - 1) + 1")
    )
    regs = rw.groupBy("reg").agg(F.max(rho).alias("rho"))
    hist = regs.groupBy(F.col("rho").cast("int").alias("reg_rho")).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers")
    )
    empty = regs.agg(
        F.lit(0).cast("int").alias("reg_rho"),
        (_HLL_M - F.count(F.lit(1))).cast("long").alias("n_registers"),
    )
    exact = o.agg(
        F.lit(-1).cast("int").alias("reg_rho"),
        F.countDistinct("o_custkey").cast("long").alias("n_registers"),
    )
    return hist.unionByName(empty).unionByName(exact)


_HLL_SQL = f"""
WITH h AS (
  SELECT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)
              AS BIGINT) AS hv
  FROM orders
),
rw AS (SELECT hv % {_HLL_M} AS reg, hv // {_HLL_M} AS w FROM h),
regs AS (
  SELECT reg,
    MAX(CASE WHEN w = 0 THEN 51
             ELSE bit_count((w & -w) - 1) + 1 END) AS rho
  FROM rw GROUP BY reg
)
SELECT CAST(rho AS INT) AS reg_rho,
       CAST(COUNT(*) AS BIGINT) AS n_registers
FROM regs GROUP BY 1
UNION ALL
SELECT 0, CAST({_HLL_M} - (SELECT COUNT(*) FROM regs) AS BIGINT)
UNION ALL
SELECT -1, CAST((SELECT COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)
"""

register(QuerySpec(
    "hll_registers_audit", _hll_audit, _HLL_SQL,
    "deterministic HyperLogLog register state (md5 hash, m=1024) "
    "value-oracled as a histogram + exact-distinct anchor — the "
    "sketch is proven, only the estimate is approximate",
    ("analytics", "approx", "agg"),
))


# --- priority_rate_by_price_decile: binned target-rate (calibration) -------
# The supervised-learning diagnostic: bin orders into totalprice
# deciles (NTILE semantics over exact cents with an orderkey
# tie-break, so the binning is a total order both engines agree on)
# and measure the URGENT-priority rate per bin — the calibration-
# curve/WOE-binning input, kept log-free as exact count ratios.
# Scale shape (r13): the ntile is the DISTRIBUTED bucketed form
# (operators/ranking.py — value-aligned cents buckets, per-bucket
# parallel ranks, broadcast prefix offsets); no single-partition
# sort at any grain, per-bin rate arithmetic unchanged.

def _rate_by_decile(spark: SparkSession, sf: str) -> DataFrame:
    from .catalog import ratio6 as _r6

    o = load_table(spark, sf, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long").alias("cents"),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
    )
    from ..operators.ranking import global_ntile

    # Distributed NTILE over the exact-cents total order (r12 verdict
    # task #1): cents >> 15 gives ~1.7k deterministic order-aligned
    # buckets over the fixed TPC-H price domain; same deciles as the
    # oracle's window ntile, no single-partition sort in the plan.
    binned = global_ntile(
        o, [F.col("cents"), F.col("o_orderkey")],
        [F.shiftright(F.col("cents"), 15)], 10, "decile")
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.col("is_urgent"), 1).otherwise(0))
            .alias("n_urgent"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .select(
            "decile", "n_orders", "n_urgent", "min_cents", "max_cents",
            _r6("n_urgent", "n_orders").alias("urgent_rate"),
        )
        .orderBy("decile")
    )


from .catalog import ratio6_sql as _r6s_cal  # noqa: E402

_RATE_DECILE_SQL = f"""
WITH o AS (
  SELECT o_orderkey,
    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
    o_orderpriority = '1-URGENT' AS is_urgent
  FROM orders
),
binned AS (
  SELECT *, NTILE(10) OVER (ORDER BY cents, o_orderkey) AS decile FROM o
)
SELECT decile,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CASE WHEN is_urgent THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
  MIN(cents) AS min_cents,
  MAX(cents) AS max_cents,
  {_r6s_cal("SUM(CASE WHEN is_urgent THEN 1 ELSE 0 END)", "COUNT(*)")}
    AS urgent_rate
FROM binned
GROUP BY decile
ORDER BY decile
"""

register(QuerySpec(
    "priority_rate_by_price_decile", _rate_by_decile, _RATE_DECILE_SQL,
    "binned target-rate calibration: exact-cents price deciles "
    "(ntile with orderkey tie-break) x URGENT-priority rate, the "
    "WOE-binning input as pure count ratios",
    ("analytics", "window", "ml"),
))
