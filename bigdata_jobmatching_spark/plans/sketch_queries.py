"""Probabilistic-filter and sketch audits, value-verified.

Three mergeable-summary structures a 100 TB engine leans on, each
implemented with EXACT integer hash arithmetic so DuckDB reproduces
every counter and the driver gate hash-checks the values (the same
discipline as hll_registers_audit / minhash_md5_near_dups):

- ``bloom_prefilter_audit``: a partitioned Bloom filter built from a
  dimension's keys, broadcast and probed by the fact side — the
  row-level runtime-filter join Spark 3.3+ injects automatically
  (spark.sql.optimizer.runtime.bloomFilter.enabled); here built
  explicitly so the false-positive economics are measurable.
- ``countmin_user_estimates``: a d x w count-min sketch over event
  actors; per-user upper-bound estimates (min across rows) against
  exact counts — the mergeable frequency summary for skew detection
  when exact per-key counts don't fit.
- ``kmv_distinct_estimate``: k-minimum-values distinct-count sketch
  (Bar-Yossef et al. 2002) per event type; (k-1) * 2^60 / h_(k) with
  the exact-below-k rule. The estimate is two IEEE ops on identical
  int inputs, so it is engine-identical.

Hash family: h_i(x) = ((a_i * x + b_i) mod p) mod m with p = 2^31-1
and fixed odd multipliers — pure int64, identical on both engines
(a_i * x stays inside int64 for keys < 2.8e9; the test lake's keys
are < 10^7, asserted in the scale-tier generator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table
from .catalog import QuerySpec, ratio6, ratio6_sql, register

_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_A = (2_654_435_761, 2_246_822_519, 3_266_489_917, 668_265_263)
_B = (97, 1_013, 40_503, 100_003)


def _h(i: int, key: str, m: int) -> str:
    """SQL text of hash row i over int column `key`, identical in
    Spark and DuckDB (pure int64 ops, both engines use floored %
    for non-negative operands)."""
    return f"((({_A[i]} * CAST({key} AS BIGINT) + {_B[i]}) % {_P}) % {m})"


# --- bloom_prefilter_audit: broadcast runtime-filter economics --------------
# Build: k=3 hash rows over the BUILDING-segment customer keys, each
# setting bits in its own m=8192 partition (a partitioned/blocked
# Bloom filter — one array per hash keeps the dedup grain trivially
# (i, pos)). Probe: every order's o_custkey. Classify probes into
# true/false positives and negatives and measure the false-positive
# rate among true non-members. Scale shape: the filter is THREE
# sorted int arrays <= 8192 entries broadcast to every task — the
# fact side is scanned once with zero shuffle (the groupBy at the end
# aggregates 4 classification counters); this is exactly the shape of
# an injected runtime bloom filter on a 100 TB fact join, where
# skipping the shuffle of non-matching rows is the entire win.

_BLOOM_M = 8192
_BLOOM_K = 3


def _bloom_audit(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    # one row: the three bit arrays (sorted distinct positions)
    bits = dim.agg(*[
        F.sort_array(F.collect_set(
            F.expr(_h(i, "c_custkey", _BLOOM_M)))).alias(f"bits{i}")
        for i in range(_BLOOM_K)
    ])
    member = dim.select(F.col("c_custkey").alias("mk")).distinct()
    probed = (
        orders.select("o_custkey")
        .crossJoin(F.broadcast(bits))
        .join(F.broadcast(member), F.col("o_custkey") == F.col("mk"), "left")
        .select(
            F.col("mk").isNotNull().alias("is_member"),
            (
                F.array_contains(F.col("bits0"), F.expr(_h(0, "o_custkey", _BLOOM_M)))
                & F.array_contains(F.col("bits1"), F.expr(_h(1, "o_custkey", _BLOOM_M)))
                & F.array_contains(F.col("bits2"), F.expr(_h(2, "o_custkey", _BLOOM_M)))
            ).alias("passes"),
        )
    )
    bits_set = dim.select(
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("i"),
                     F.expr(_h(i, "c_custkey", _BLOOM_M)).alias("pos"))
            for i in range(_BLOOM_K)
        ]))
    ).select("col.*").distinct().agg(F.count(F.lit(1)).alias("bits_set"))
    return (
        probed.agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_members"),
            F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("n_pass"),
            F.sum(F.when(F.col("passes") & ~F.col("is_member"), 1)
                  .otherwise(0)).alias("n_false_pos"),
            F.sum(F.when(~F.col("passes") & F.col("is_member"), 1)
                  .otherwise(0)).alias("n_false_neg"),
        )
        .crossJoin(F.broadcast(bits_set))
        .select(
            "n_probes", "n_members", "n_pass", "n_false_pos",
            # Bloom filters admit no false negatives — oracled as 0.
            "n_false_neg", "bits_set",
            ratio6("n_false_pos", "n_probes - n_members").alias("fp_rate"),
            ratio6("bits_set", str(_BLOOM_K * _BLOOM_M)).alias("fill_frac"),
        )
    )


def _bloom_sql() -> str:
    sets = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, {_h(i, 'c_custkey', _BLOOM_M)} AS pos "
        f"FROM customer WHERE c_mktsegment = 'BUILDING'"
        for i in range(_BLOOM_K)
    )
    passes = " AND ".join(
        f"{_h(i, 'o_custkey', _BLOOM_M)} IN (SELECT pos FROM bits WHERE i = {i})"
        for i in range(_BLOOM_K)
    )
    return f"""
WITH bits AS (SELECT DISTINCT i, pos FROM ({sets})),
dim AS (SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
probed AS (
  SELECT o_custkey IN (SELECT c_custkey FROM dim) AS is_member,
         ({passes}) AS passes
  FROM orders
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
    CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
    CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
    CAST(SUM(CASE WHEN passes AND NOT is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
    CAST(SUM(CASE WHEN is_member AND NOT passes THEN 1 ELSE 0 END) AS BIGINT) AS n_false_neg
  FROM probed
)
SELECT n_probes, n_members, n_pass, n_false_pos, n_false_neg,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
  {ratio6_sql("n_false_pos", "n_probes - n_members")} AS fp_rate,
  {ratio6_sql("(SELECT COUNT(*) FROM bits)", str(_BLOOM_K * _BLOOM_M))} AS fill_frac
FROM agg
"""


register(QuerySpec(
    "bloom_prefilter_audit", _bloom_audit, _bloom_sql(),
    "partitioned Bloom filter (k=3, m=8192) built from a dimension "
    "filter, broadcast, probed by every fact row: TP/FP/FN census, "
    "measured false-positive rate, fill fraction — the runtime-filter "
    "join shape with exact cross-engine hash arithmetic",
    ("sketch", "join", "audit", "bench"),
))


# --- countmin_user_estimates: count-min frequency sketch --------------------
# d=4 x w=512 counter matrix over events.user_id; per-user estimate is
# the min across the 4 rows — a guaranteed upper bound on the exact
# count. Reported for the top 20 users by exact count, with the
# overestimate explicit. Scale shape: the sketch is ONE 2048-row agg
# (mergeable across partitions by construction — counters are sums);
# the probe side joins the 2048-row counter table broadcast, so
# per-key frequency bounds at 100 TB cost one map-side-combinable
# shuffle regardless of key cardinality.

_CM_D = 4
_CM_W = 512


def _countmin(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    rows = F.array(*[
        F.struct(F.lit(i).alias("i"),
                 F.expr(_h(i, "user_id", _CM_W)).alias("bucket"))
        for i in range(_CM_D)
    ])
    counters = (
        ev.select(F.explode(rows).alias("r"))
        .groupBy("r.i", "r.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = (
        exact.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("exact_cnt").desc(), F.col("user_id"))),
        ).filter(F.col("rn") <= 20).drop("rn")
    )
    probe = top.select(
        "user_id", "exact_cnt", F.explode(rows).alias("r"))
    return (
        probe.join(F.broadcast(counters),
                   (probe.r.i == counters.i) & (probe.r.bucket == counters.bucket))
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cm_estimate"))
        .select(
            "user_id", "exact_cnt", "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.col("exact_cnt").desc(), "user_id")
    )


def _countmin_sql() -> str:
    buckets = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, {_h(i, 'user_id', _CM_W)} AS bucket FROM events"
        for i in range(_CM_D)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT user_id, exact_cnt, {i} AS i, "
        f"{_h(i, 'user_id', _CM_W)} AS bucket FROM top"
        for i in range(_CM_D)
    )
    return f"""
WITH counters AS (
  SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM ({buckets})
  GROUP BY i, bucket
),
exact AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt
  FROM events GROUP BY user_id
),
top AS (
  SELECT user_id, exact_cnt FROM exact
  ORDER BY exact_cnt DESC, user_id LIMIT 20
),
probe AS ({probe_rows})
SELECT p.user_id, p.exact_cnt,
  MIN(c.cnt) AS cm_estimate,
  MIN(c.cnt) - p.exact_cnt AS overestimate
FROM probe p JOIN counters c ON p.i = c.i AND p.bucket = c.bucket
GROUP BY p.user_id, p.exact_cnt
ORDER BY p.exact_cnt DESC, p.user_id
"""


register(QuerySpec(
    "countmin_user_estimates", _countmin, _countmin_sql(),
    "count-min sketch (4 x 512) over event actors: broadcast counter "
    "matrix, min-across-rows upper-bound estimates vs exact counts "
    "for the top-20 users, overestimate explicit",
    ("sketch", "agg", "skew", "bench"),
))


# --- kmv_distinct_estimate: k-minimum-values distinct sketch ----------------
# Per event type, hash each distinct user to the 60-bit md5 family,
# keep the k=64 smallest, estimate |distinct| as (k-1) * 2^60 / h_(k)
# (uniform order statistics); when fewer than k distinct values exist
# the sketch IS the exact set. (k-1) * 2^60 is exact in double (small
# int times a power of two) and the divide is one correctly-rounded
# IEEE op, so the estimate is bit-identical on both engines. Scale
# shape: the sketch state is 64 int64s per group — mergeable by
# union+re-truncate — and computing it exactly is one agg plus a
# bounded per-group window; the estimate-vs-exact gap is the audit.

_KMV_K = 64
_TWO60 = float(1 << 60)


def _kmv(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    hashed = (
        ev.select("event_type", "user_id").distinct()
        .select(
            "event_type",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                   16, 10).cast("long").alias("h"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("h")
    per_type = (
        hashed.withColumn("rn", F.row_number().over(w))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("exact_distinct"),
            F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("kth_hash"),
        )
    )
    est = F.when(
        F.col("kth_hash").isNotNull(),
        F.lit(float(_KMV_K - 1) * _TWO60) / F.col("kth_hash").cast("double"),
    ).otherwise(F.col("exact_distinct").cast("double"))
    return per_type.select(
        "event_type", "exact_distinct", "kth_hash",
        est.alias("kmv_estimate"),
        (est - F.col("exact_distinct").cast("double")).alias("kmv_err"),
    ).orderBy("event_type")


_KMV_SQL = f"""
WITH hashed AS (
  -- grain mirror (r7 ADVICE): dedup ONLY on (event_type, user_id),
  -- exactly like the Spark side — no outer DISTINCT on h, so a 60-bit
  -- hash collision between two user_ids yields the same row count and
  -- the same kth_hash on both engines.
  SELECT event_type,
    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
  FROM (SELECT DISTINCT event_type, user_id FROM events)
),
ranked AS (
  SELECT event_type, h,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hashed
),
per_type AS (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS exact_distinct,
    MAX(CASE WHEN rn = {_KMV_K} THEN h END) AS kth_hash
  FROM ranked GROUP BY event_type
)
SELECT event_type, exact_distinct, kth_hash,
  CASE WHEN kth_hash IS NOT NULL
       THEN {float(_KMV_K - 1) * _TWO60} / CAST(kth_hash AS DOUBLE)
       ELSE CAST(exact_distinct AS DOUBLE) END AS kmv_estimate,
  CASE WHEN kth_hash IS NOT NULL
       THEN {float(_KMV_K - 1) * _TWO60} / CAST(kth_hash AS DOUBLE)
       ELSE CAST(exact_distinct AS DOUBLE) END
    - CAST(exact_distinct AS DOUBLE) AS kmv_err
FROM per_type
ORDER BY event_type
"""

register(QuerySpec(
    "kmv_distinct_estimate", _kmv, _KMV_SQL,
    "k-minimum-values distinct sketch (k=64, 60-bit md5 hashes) per "
    "event type: (k-1)*2^60/h_(k) estimate vs exact distinct, "
    "exact-below-k rule, bit-identical IEEE arithmetic",
    ("sketch", "agg", "distinct"),
))


# --- cm_join_size_estimate: sketch-based join-cardinality audit -------------
# Round-8: the query-optimizer primitive count-min sketches were
# invented for (Alon-Matias-Szegedy F2 / Cormode-Muthukrishnan inner
# products): |R join S on k| = sum_k n_R(k) * n_S(k), upper-bounded by
# min over hash rows d of the sketch inner product
# sum_j cm_R[d][j] * cm_S[d][j]. Two estimators over the lake's join
# keys, each against its exact truth:
# - self_join_f2: the second frequency moment of lineitem.l_partkey
#   (self-join size) — the classic AMS demo and the quantity a
#   skew-aware join planner needs;
# - lineitem_x_part: the two-relation form against the part table.
# Scale shape: each sketch is ONE 2048-row mergeable aggregation; the
# inner products are broadcast-sized math. Headroom: the int64 inner
# product needs every bucket counter < 3e9 (cnt^2 < 9e18) — holds to
# ~1.5e12 rows at w=512; the assert_true below raises loudly beyond
# (rescale to per-thousand counts or widen w first). The exact sides
# (a groupBy and a join count) are the AUDIT cost, not the production
# cost — at 100 TB you run only the sketches.

def _cm_sketch(df: DataFrame, key: str) -> DataFrame:
    rows = F.array(*[
        F.struct(F.lit(i).alias("i"),
                 F.expr(_h(i, key, _CM_W)).alias("bucket"))
        for i in range(_CM_D)
    ])
    guarded_cnt = F.coalesce(
        F.assert_true(
            F.col("cnt") < F.lit(3_000_000_000),
            F.lit("cm_join_size_estimate: bucket counter exceeds int64 "
                  "inner-product headroom — widen the sketch or rescale"),
        ).cast("long"),
        F.col("cnt"),
    )
    return (
        df.select(F.explode(rows).alias("r"))
        .groupBy("r.i", "r.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("cnt", guarded_cnt)
    )


def _cm_join_size(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("k"))
    pt = load_table(spark, sf, "part").select(F.col("p_partkey").alias("k"))
    sk_li = _cm_sketch(li, "k")
    sk_pt = _cm_sketch(pt, "k")

    est_self = (
        sk_li.groupBy("i")
        .agg(F.sum(F.col("cnt") * F.col("cnt")).alias("ip"))
        .agg(F.min("ip").alias("cm_estimate"))
        .withColumn("estimator", F.lit("self_join_f2"))
    )
    a, b = sk_li.alias("a"), sk_pt.alias("b")
    est_join = (
        a.join(F.broadcast(b),
               (F.col("a.i") == F.col("b.i"))
               & (F.col("a.bucket") == F.col("b.bucket")))
        .groupBy("a.i")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
        .agg(F.min("ip").alias("cm_estimate"))
        .withColumn("estimator", F.lit("lineitem_x_part"))
    )

    per_key = li.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    exact_self = per_key.agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("exact")
    ).withColumn("estimator", F.lit("self_join_f2"))
    exact_join = li.join(pt, "k").agg(
        F.count(F.lit(1)).cast("long").alias("exact")
    ).withColumn("estimator", F.lit("lineitem_x_part"))

    ests = est_self.unionByName(est_join)
    exacts = exact_self.unionByName(exact_join)
    return (
        ests.join(exacts, "estimator")
        .select(
            "estimator",
            "exact",
            F.col("cm_estimate").cast("long").alias("cm_estimate"),
            (F.col("cm_estimate") - F.col("exact")).cast("long")
            .alias("overestimate"),
        )
        .orderBy("estimator")
    )


def _cm_join_size_sql() -> str:
    li_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, {_h(i, 'l_partkey', _CM_W)} AS bucket FROM lineitem"
        for i in range(_CM_D)
    )
    pt_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS i, {_h(i, 'p_partkey', _CM_W)} AS bucket FROM part"
        for i in range(_CM_D)
    )
    return f"""
WITH sk_li AS (
  SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM ({li_rows})
  GROUP BY i, bucket
),
sk_pt AS (
  SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM ({pt_rows})
  GROUP BY i, bucket
),
est_self AS (
  SELECT 'self_join_f2' AS estimator, MIN(ip) AS cm_estimate
  FROM (SELECT i, SUM(cnt * cnt) AS ip FROM sk_li GROUP BY i)
),
est_join AS (
  SELECT 'lineitem_x_part' AS estimator, MIN(ip) AS cm_estimate
  FROM (
    SELECT a.i, SUM(a.cnt * b.cnt) AS ip
    FROM sk_li a JOIN sk_pt b ON a.i = b.i AND a.bucket = b.bucket
    GROUP BY a.i
  )
),
exact_self AS (
  SELECT 'self_join_f2' AS estimator, CAST(SUM(cnt * cnt) AS BIGINT) AS exact
  FROM (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey)
),
exact_join AS (
  SELECT 'lineitem_x_part' AS estimator, CAST(COUNT(*) AS BIGINT) AS exact
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
ests AS (SELECT * FROM est_self UNION ALL SELECT * FROM est_join),
exacts AS (SELECT * FROM exact_self UNION ALL SELECT * FROM exact_join)
SELECT e.estimator, x.exact,
  CAST(e.cm_estimate AS BIGINT) AS cm_estimate,
  CAST(e.cm_estimate - x.exact AS BIGINT) AS overestimate
FROM ests e JOIN exacts x ON e.estimator = x.estimator
ORDER BY e.estimator
"""


register(QuerySpec(
    "cm_join_size_estimate", _cm_join_size, _cm_join_size_sql(),
    "sketch-based join-cardinality audit: count-min inner products "
    "upper-bound the self-join F2 moment of l_partkey and the "
    "lineitem x part join size, measured against exact truth — the "
    "AMS/CM primitive a skew-aware join planner runs before choosing "
    "a strategy",
    ("sketch", "join", "audit"),
))


# --- log2_quantile_audit: mergeable histogram quantiles vs exact ------------
# Round-8: quantiles WITHOUT a global sort — the scale path for p50/
# p95/p99 dashboards. Per event type, a log2-bucket histogram over
# value cents (bucket = floor(log2(cents)) computed as
# length(bin(cents)) - 1, pure integer on both engines) is a
# MERGEABLE summary: counts add across partitions/days, and the
# q-quantile estimate is the upper bound 2^(bucket+1) - 1 of the
# first bucket whose cumulative count reaches the nearest-rank
# ceil(q*n) — guaranteed within 2x of the true value by construction,
# and the audit MEASURES the gap against the exact nearest-rank
# quantile (itself computed by rank selection, not interpolation, so
# both engines pick the identical cent value). Scale shape: the
# sketch is a per-(type, bucket) hash aggregation (~40 rows total);
# the exact side is the audit cost only.

_QUANT_QS = (50, 90, 99)


def _log2_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(F.col("cents") >= 1)
    hist = (
        ev.withColumn("bucket", F.length(F.expr("bin(cents)")) - 1)
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = (
        Window.partitionBy("event_type").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum))
    tot = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    w_rank = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = (
        load_table(spark, sf, "events").select(
            "event_type", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        ).filter(F.col("cents") >= 1)
        .withColumn("rk", F.row_number().over(w_rank))
    )

    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in _QUANT_QS])).alias("q"))
    targets = tot.crossJoin(F.broadcast(qs)).select(
        "event_type", "q", "n",
        F.ceil(F.col("q") * F.col("n") / 100).cast("long").alias("rank"),
    )
    exact = targets.join(
        ranked,
        (targets.event_type == ranked.event_type)
        & (targets.rank == ranked.rk),
    ).select(
        targets.event_type, "q", "n",
        F.col("cents").alias("exact_cents"),
    )
    est = (
        targets.join(cum, "event_type")
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("event_type", "q")
        .agg(F.min("bucket").alias("est_bucket"))
        .select(
            "event_type", "q", "est_bucket",
            (F.pow(F.lit(2.0), F.col("est_bucket") + 1) - 1)
            .cast("long").alias("est_cents"),
        )
    )
    return (
        exact.join(est, ["event_type", "q"])
        .select(
            "event_type", "q", "n", "exact_cents", "est_bucket", "est_cents",
            ratio6("est_cents", "exact_cents").alias("est_over_exact"),
        )
        .orderBy("event_type", "q")
    )


_QUANT_SQL = f"""
WITH ev AS (
  SELECT event_type, event_id,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE CAST(round(value * 100) AS BIGINT) >= 1
),
hist AS (
  SELECT event_type, length(bin(cents)) - 1 AS bucket, COUNT(*) AS cnt
  FROM ev GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket,
    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                   ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
tot AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1),
qs AS (SELECT unnest([{", ".join(str(q) for q in _QUANT_QS)}]) AS q),
targets AS (
  SELECT event_type, q, n,
    CAST(ceil(q * n / 100.0) AS BIGINT) AS rank
  FROM tot CROSS JOIN qs
),
ranked AS (
  SELECT event_type, cents,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY cents, event_id) AS rk
  FROM ev
),
exact AS (
  SELECT t.event_type, t.q, t.n, r.cents AS exact_cents
  FROM targets t JOIN ranked r
    ON t.event_type = r.event_type AND t.rank = r.rk
),
est AS (
  SELECT t.event_type, t.q, MIN(c.bucket) AS est_bucket
  FROM targets t JOIN cum c ON t.event_type = c.event_type
  WHERE c.cum >= t.rank
  GROUP BY 1, 2
)
SELECT e.event_type, e.q, e.n, e.exact_cents, s.est_bucket,
  CAST(power(2.0, s.est_bucket + 1) - 1 AS BIGINT) AS est_cents,
  {ratio6_sql("CAST(power(2.0, s.est_bucket + 1) - 1 AS BIGINT)",
              "e.exact_cents")} AS est_over_exact
FROM exact e JOIN est s ON e.event_type = s.event_type AND e.q = s.q
ORDER BY e.event_type, e.q
"""

register(QuerySpec(
    "log2_quantile_audit", _log2_quantiles, _QUANT_SQL,
    "mergeable log2-histogram quantiles (p50/p90/p99 per event type) "
    "vs exact nearest-rank selection: bucket-upper-bound estimates "
    "with the measured 2x-bounded error — the no-global-sort "
    "percentile path",
    ("sketch", "agg", "audit"),
))
