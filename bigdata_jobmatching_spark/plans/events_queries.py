"""Event-stream analytics on the ``events`` table — the batch forms
of the reference's streaming workload ("offers per day" dashboards,
PLAN_REALISATION.md:479-483; SURVEY §2.9's idiomatic upgrade path).
The same transforms run under readStream in ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.io import load_table
from .catalog import QuerySpec, ratio6, ratio6_sql, register, sratio6, sratio6_sql

MONEY = "decimal(18,6)"


# --- events_daily_by_type: the "offers per day" aggregate -----------------

def _daily(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("total_value"),
        )
    )


_DAILY_SQL = f"""
SELECT CAST(ts AS DATE) AS day, event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(value AS {MONEY})) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2
"""

register(QuerySpec(
    "events_daily_by_type", _daily, _DAILY_SQL,
    "date-derivation groupBy (offers-per-day dashboard, consume_jobs.py:117-121)",
    ("events", "agg", "bench"),
))


# --- events_hourly_windows: tumbling event-time window (batch form) -------

def _hourly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type", "n_events",
        )
    )


_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
  event_type, COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""

register(QuerySpec(
    "events_hourly_windows", _hourly, _HOURLY_SQL,
    "tumbling window aggregate — batch twin of the streaming path",
    ("events", "window", "streaming-shape"),
))


# --- events_sessionization: lag + gap-threshold session ids ---------------

def _sessions(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = 30 * 60 * 1000
    with_flag = ev.withColumn(
        "prev_ms", F.lag(F.unix_millis("ts")).over(w)
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_ms").isNull()
            | ((F.unix_millis("ts") - F.col("prev_ms")) > gap_ms),
            1,
        ).otherwise(0),
    )
    return (
        with_flag.groupBy("user_id")
        .agg(
            F.sum("new_session").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("n_sessions", F.col("n_sessions").cast("bigint"))
    )


_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id,
    CASE WHEN lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000
         THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM flagged GROUP BY user_id
"""

register(QuerySpec(
    "events_sessionization", _sessions, _SESSIONS_SQL,
    "sessionization via lag + gap threshold (advanced window)",
    ("events", "window", "bench"),
))


# --- events_type_mix: wide conditional-count projection per day -----------

def _type_mix(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    def n(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            n("click"), n("view"), n("purchase"), n("signup"), n("error"),
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0)).cast(MONEY))
            .cast("double").alias("purchase_value"),
        )
    )


_TYPE_MIX_SQL = f"""
SELECT CAST(ts AS DATE) AS day,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS {MONEY})) AS DOUBLE) AS purchase_value
FROM events GROUP BY 1
"""

register(QuerySpec(
    "events_type_mix", _type_mix, _TYPE_MIX_SQL,
    "pivot-style conditional counts (contract-type mix dashboard)",
    ("events", "agg", "pivot"),
))


# --- user_funnel_conversion: staged min-over-condition funnel -------------

def _funnel(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    s = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ms").alias("signup_ms")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ms") > F.col("signup_ms"))
        .groupBy("user_id").agg(F.min("ms").alias("click_ms"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ms") > F.col("click_ms"))
        .groupBy("user_id").agg(F.min("ms").alias("purchase_ms"))
    )
    return (
        s.join(c, "user_id", "left").join(p, "user_id", "left")
        .agg(
            F.count(F.lit(1)).alias("n_signed_up"),
            F.count("click_ms").alias("n_clicked_after"),
            F.count("purchase_ms").alias("n_purchased_after"),
        )
    )


_FUNNEL_SQL = """
WITH s AS (
  SELECT user_id, MIN(epoch_ms(ts)) AS signup_ms FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(epoch_ms(e.ts)) AS click_ms
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND epoch_ms(e.ts) > s.signup_ms
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_ms(e.ts)) AS purchase_ms
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > c.click_ms
  GROUP BY e.user_id
)
SELECT COUNT(*) AS n_signed_up,
  COUNT(c.click_ms) AS n_clicked_after,
  COUNT(p.purchase_ms) AS n_purchased_after
FROM s LEFT JOIN c ON s.user_id = c.user_id LEFT JOIN p ON s.user_id = p.user_id
"""

register(QuerySpec(
    "user_funnel_conversion", _funnel, _FUNNEL_SQL,
    "staged funnel: signup -> first later click -> first later purchase",
    ("events", "funnel", "join"),
))


# --- order_price_deciles: ntile window distribution -----------------------

def _deciles(spark: SparkSession, sf: str) -> DataFrame:
    from ..operators.ranking import global_ntile

    # Distributed NTILE (r12 verdict task #1): deterministic
    # price-range buckets (floor(price/256) — ~2k buckets over TPC-H's
    # fixed price domain at ANY scale factor) + per-bucket parallel
    # ranks + broadcast prefix offsets reproduce the oracle's
    # NTILE(10) bit-for-bit with no single-partition window; the
    # (o_totalprice, o_orderkey) pair is a total order.
    o = load_table(spark, sf, "orders")
    return (
        global_ntile(
            o, [F.col("o_totalprice"), F.col("o_orderkey")],
            [F.floor(F.col("o_totalprice") / 256).cast("long")],
            10, "decile")
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("total_price"),
        )
        .withColumn("decile", F.col("decile").cast("int"))
    )


_DECILES_SQL = """
SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_price
FROM (
  SELECT o_totalprice, NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
) GROUP BY decile
"""

register(QuerySpec(
    "order_price_deciles", _deciles, _DECILES_SQL,
    "global ntile decile distribution (salary-deciles dashboard shape)",
    ("relational", "window"),
))


# --- events_json_props: JSON field extraction from the props column ------

def _json_props(spark: SparkSession, sf: str) -> DataFrame:
    # Extract the JSON number as DOUBLE on both sides: string->bigint casts
    # disagree between engines on non-integer numerics ("1.5": Spark NULL,
    # DuckDB rounds), while string->double parsing agrees exactly.
    ev = load_table(spark, sf, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("double"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


_JSON_SQL = """
SELECT event_type, COUNT(*) AS n_events,
  SUM(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS sum_k,
  MIN(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS min_k,
  MAX(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS max_k
FROM events GROUP BY event_type
"""

register(QuerySpec(
    "events_json_props", _json_props, _JSON_SQL,
    "semi-structured JSON extraction (from_json ingest path, consume_jobs.py:105-111)",
    ("events", "json"),
))


# --- events_multi_grain_rollup: GROUPING SETS in one pass ------------------
# Hypertable-style continuous-aggregate shape: (day, type), (day) and
# grand-total grains computed in ONE scan+shuffle via grouping sets
# instead of three separate aggregations. Grain is labeled from key
# nullness (engine-safe; ts is never null so a null day only appears
# in super-aggregate rows).

def _multi_grain(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )
    day, typ = F.col("day"), F.col("event_type")
    g = ev.groupingSets([[day, typ], [day], []], day, typ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(MONEY)).cast("double").alias("total_value"),
    )
    grain = (
        F.when(F.col("day").isNull(), F.lit("total"))
        .when(F.col("event_type").isNull(), F.lit("day"))
        .otherwise(F.lit("day_type"))
    )
    return g.select("day", "event_type", grain.alias("grain"), "n_events", "total_value")


_MULTI_GRAIN_SQL = f"""
SELECT CAST(ts AS DATE) AS day, event_type,
  CASE WHEN CAST(ts AS DATE) IS NULL THEN 'total'
       WHEN event_type IS NULL THEN 'day' ELSE 'day_type' END AS grain,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS {MONEY})) AS DOUBLE) AS total_value
FROM events
GROUP BY GROUPING SETS ((CAST(ts AS DATE), event_type), (CAST(ts AS DATE)), ())
"""

register(QuerySpec(
    "events_multi_grain_rollup", _multi_grain, _MULTI_GRAIN_SQL,
    "continuous-aggregate rollup at three grains in one scan via "
    "GROUPING SETS (hypertable rollup analog)",
    ("events", "agg", "rollup", "bench"),
))


# --- events_user_type_cube: full CUBE in one pass --------------------------
# The fourth grouping shape next to plain GROUP BY, ROLLUP
# (part_size_rollup) and GROUPING SETS (events_multi_grain_rollup):
# CUBE over (event_type, user cohort) computes all four grains in one
# scan+shuffle. grouping_id disambiguates a NULL key from a subtotal
# row — both engines emit the same bitmask (first column = high bit).

def _type_cohort_cube(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_type", (F.col("user_id") % 10).alias("cohort"), "value"
    )
    return (
        ev.cube("event_type", "cohort")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("total_value"),
            F.grouping_id().cast("int").alias("grp"),
        )
        .select("event_type", "cohort", "grp", "n_events", "total_value")
    )


_CUBE_SQL = f"""
SELECT event_type, user_id % 10 AS cohort,
  CAST(GROUPING(event_type, user_id % 10) AS INT) AS grp,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS {MONEY})) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE (event_type, user_id % 10)
"""

register(QuerySpec(
    "events_user_type_cube", _type_cohort_cube, _CUBE_SQL,
    "four grains in one scan via CUBE with grouping_id disambiguation",
    ("events", "agg", "cube"),
))


# --- events_daily_deltas: lag-based day-over-day change --------------------
# The missing window shape next to running sums and ntile: lag() over
# an aggregated series. The window partitions by event_type, so no
# global sort; day_value is an exact decimal cast to double before the
# subtraction, making the delta engine-reproducible.

def _daily_deltas(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.sum(F.col("value").cast(MONEY)).cast("double").alias("day_value"))
    w = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("day_value").over(w)
    return daily.select(
        "day", "event_type", "day_value",
        F.round(F.col("day_value") - prev, 6).alias("delta_vs_prev_day"),
    )


_DAILY_DELTAS_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
    CAST(SUM(CAST(value AS {MONEY})) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, day_value,
  round(day_value - LAG(day_value) OVER (PARTITION BY event_type ORDER BY day), 6)
    AS delta_vs_prev_day
FROM daily
"""

register(QuerySpec(
    "events_daily_deltas", _daily_deltas, _DAILY_DELTAS_SQL,
    "day-over-day value change per event type via lag() over the "
    "aggregated series",
    ("events", "window", "agg"),
))


# --- events_sliding_hour_value: RANGE window frame -------------------------
# A physical-time sliding aggregate per user: everything in the
# trailing hour, expressed as a RANGE frame over epoch millis — peers
# at the same timestamp are included symmetrically on both engines,
# so no tie-break is needed (unlike ROWS frames).

def _sliding_hour(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 50)
    ms = F.unix_millis("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ms)
        .rangeBetween(-3_600_000, 0)
    )
    return ev.select(
        "user_id", "event_id",
        F.sum(F.col("value").cast(MONEY)).over(w).cast("double").alias("hour_value"),
        F.count(F.lit(1)).over(w).alias("hour_events"),
    )


_SLIDING_SQL = f"""
SELECT user_id, event_id,
  CAST(SUM(CAST(value AS {MONEY})) OVER (
    PARTITION BY user_id ORDER BY epoch_ms(ts)
    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_value,
  COUNT(*) OVER (
    PARTITION BY user_id ORDER BY epoch_ms(ts)
    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS hour_events
FROM events WHERE user_id < 50
"""

register(QuerySpec(
    "events_sliding_hour_value", _sliding_hour, _SLIDING_SQL,
    "trailing-hour sliding aggregate per user via a RANGE frame over "
    "epoch millis (physical-time window, peer-inclusive)",
    ("events", "window"),
))


# --- events_retention_cohorts: cohort x offset retention matrix -----------
# Users are cohorted by first-activity week; each (cohort_week,
# week_offset) cell counts distinct users active that many weeks
# later. Two aggregations plus a broadcast join of the (small) cohort
# dim — the classic retention matrix without any driver-side loop.

def _retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(F.broadcast(cohort), "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id)
SELECT c.cohort_week,
  CAST(floor(date_diff('day', c.cohort_week, e.week) / 7) AS INT) AS week_offset,
  COUNT(DISTINCT e.user_id) AS n_users
FROM ev e JOIN cohort c ON e.user_id = c.user_id
GROUP BY 1, 2
"""

register(QuerySpec(
    "events_retention_cohorts", _retention, _RETENTION_SQL,
    "weekly cohort retention matrix (first-activity cohort x week offset, "
    "distinct-user counts)",
    ("events", "agg", "cohort"),
))


# --- events_props_typed: typed JSON field extraction with audit -----------
# The typed counterpart of events_json_props: the reference's
# no-inference discipline (consume_jobs.py:39-75) applied to batch JSON
# columns. Semantics are pinned engine-independently: extract the field
# as text, accept it ONLY if it matches a strict bounded-integer
# pattern, cast, and audit everything else as unparsed. This sidesteps
# the from_json-vs-JSON-extract coercion divergence (round-3 driver
# fail): Spark's from_json('k int') nulls quoted/decimal values that
# SQL CAST(props->>'k') coerces, so no SQL oracle can predict from_json
# on non-canonical payloads. from_json's strictness itself is pinned by
# tests/test_functions.py::test_from_json_strict_schema with
# adversarial payloads ("7", 7.5, {}, junk).

_K_INT_RE = r"^-?[0-9]{1,9}$"  # bounded: CAST never overflows INT


def _props_typed(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    raw = F.get_json_object("props", "$.k")
    typed = ev.withColumn(
        "k", F.when(raw.rlike(_K_INT_RE), raw.cast("int"))
    )
    return (
        typed.groupBy(
            "event_type",
            (F.col("k") % 10).alias("k_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_unparsed"),
        )
    )


_PROPS_TYPED_SQL = f"""
WITH ex AS (
  SELECT event_type,
    CASE WHEN json_valid(props) THEN props->>'k' END AS raw
  FROM events
),
typed AS (
  SELECT event_type,
    CASE WHEN regexp_matches(raw, '{_K_INT_RE}') THEN CAST(raw AS INT) END AS k
  FROM ex
)
SELECT event_type, k % 10 AS k_bucket,
  COUNT(*) AS n_events,
  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsed
FROM typed
GROUP BY 1, 2
"""

register(QuerySpec(
    "events_props_typed", _props_typed, _PROPS_TYPED_SQL,
    "typed JSON field extraction (strict bounded-integer pattern, "
    "engine-pinned) with unparsed-row audit",
    ("events", "json", "agg"),
))


# --- event_path_counts: sessionized funnel paths --------------------------
# The "what do users actually do in a session" query: sessionize by
# 30-min gap (same rule as events_sessionization), take each
# session's first 8 event types in time order, and count sessions per
# path. The path string is built from an array_sort over
# (ts, event_id, event_type) structs so ordering is total and
# engine-reproducible (unique event_id tie-break).

def _paths(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    wl = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_ms = 30 * 60 * 1000
    flagged = ev.withColumn(
        "prev_ms", F.lag(F.unix_millis("ts")).over(wl)
    ).withColumn(
        "new_session",
        F.when(
            F.col("prev_ms").isNull()
            | ((F.unix_millis("ts") - F.col("prev_ms")) > gap_ms),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wsum))
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    1, 8,
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return per_sess.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
    )


_PATHS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
    CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
           OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
),
per_sess AS (
  SELECT user_id, session_id,
    array_to_string(list_slice(list(event_type ORDER BY ts, event_id), 1, 8), '>') AS path,
    COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_id
)
SELECT path, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS total_events
FROM per_sess GROUP BY path
"""

register(QuerySpec(
    "event_path_counts", _paths, _PATHS_SQL,
    "sessionized funnel paths: first-8 event-type sequences per "
    "session, counted per distinct path",
    ("events", "window", "session", "bench"),
))


# --- events_hourly_anomalies: exact-arithmetic z-score outliers -----------
# Anomaly detection over the (event_type, hour-of-day) seasonal
# profile: each (type, day, hour) cell's value total is z-scored
# against the same (type, hour) across days. Determinism: totals are
# quantized to integer micro-units with floor (a single
# correctly-rounded IEEE multiply + exact floor — no round()), the
# moment sums are exact BIGINT/DECIMAL, and the final mean/std/z
# chain is the identical sequence of correctly-rounded double ops on
# both engines. Two narrow aggregations + an equi-join — scales.

def _hourly_anomalies(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    cell = ev.groupBy(
        "event_type", F.to_date("ts").alias("day"), F.hour("ts").alias("hr")
    ).agg(
        F.sum(F.expr("CAST(floor(value * 1000000) AS BIGINT)")).alias("total_u")
    )
    stats = cell.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("total_u").alias("s1"),
        F.sum(
            F.expr("CAST(total_u AS DECIMAL(18,0)) * CAST(total_u AS DECIMAL(18,0))")
        ).alias("s2"),
    )
    j = cell.join(stats, ["event_type", "hr"]).filter(F.col("n_days") >= 5)
    mean = F.col("s1").cast("double") / F.col("n_days")
    ex2 = F.col("s2").cast("double") / F.col("n_days")
    std = F.sqrt(F.greatest(ex2 - mean * mean, F.lit(0.0)))
    z = (F.col("total_u").cast("double") - mean) / std
    return (
        j.filter(std > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 2.0)
        .select(
            "event_type", "day", "hr",
            F.col("total_u").alias("total_micro"), "z",
        )
    )


_HOURLY_ANOM_SQL = """
WITH cell AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(EXTRACT(hour FROM ts) AS INT) AS hr,
    SUM(CAST(floor(value * 1000000) AS BIGINT)) AS total_u
  FROM events GROUP BY 1, 2, 3
),
stats AS (
  SELECT event_type, hr, COUNT(*) AS n_days,
    SUM(total_u) AS s1,
    SUM(CAST(total_u AS DECIMAL(18,0)) * CAST(total_u AS DECIMAL(18,0))) AS s2
  FROM cell GROUP BY 1, 2
),
j AS (
  SELECT c.event_type, c.day, c.hr, c.total_u,
    CAST(s.s1 AS DOUBLE) / s.n_days AS mean,
    CAST(s.s2 AS DOUBLE) / s.n_days AS ex2
  FROM cell c JOIN stats s ON c.event_type = s.event_type AND c.hr = s.hr
  WHERE s.n_days >= 5
),
scored AS (
  SELECT event_type, day, hr, total_u,
    sqrt(greatest(ex2 - mean * mean, 0.0)) AS std,
    (CAST(total_u AS DOUBLE) - mean) AS dev
  FROM j
)
SELECT event_type, day, hr, CAST(total_u AS BIGINT) AS total_micro, dev / std AS z
FROM scored
WHERE std > 0 AND abs(dev / std) >= 2.0
"""

register(QuerySpec(
    "events_hourly_anomalies", _hourly_anomalies, _HOURLY_ANOM_SQL,
    "z-score anomaly flags per (event_type, day, hour) vs the "
    "(type, hour) seasonal profile — exact integer moments, "
    "deterministic double chain",
    ("events", "agg", "anomaly", "bench"),
))


# --- events_rate_outliers: superhuman-rate (bot) detection ----------------
# Per user: the busiest minute (max events within any calendar
# minute) and total volume; flag users whose peak exceeds the
# threshold. Calendar-minute bucketing keeps it two map-side
# aggregations (no self-join, no sliding state); the streaming twin
# would be a 1-minute tumbling window + threshold filter.

def _rate_outliers(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    per_min = ev.groupBy(
        "user_id", (F.unix_millis("ts") / F.lit(60000)).cast("bigint").alias("minute")
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        per_min.groupBy("user_id")
        .agg(
            F.max("c").alias("peak_per_minute"),
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("active_minutes"),
        )
        .filter(F.col("peak_per_minute") >= 2)
    )


_RATE_OUTLIERS_SQL = """
WITH per_min AS (
  SELECT user_id, CAST(floor(epoch_ms(ts) / 60000) AS BIGINT) AS minute, COUNT(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id, MAX(c) AS peak_per_minute, CAST(SUM(c) AS BIGINT) AS n_events,
  COUNT(*) AS active_minutes
FROM per_min GROUP BY user_id
HAVING MAX(c) >= 2
"""

register(QuerySpec(
    "events_rate_outliers", _rate_outliers, _RATE_OUTLIERS_SQL,
    "bot detection: per-user peak events-per-calendar-minute + volume, "
    "thresholded — two map-side aggregations, no self-join",
    ("events", "agg", "anomaly"),
))


# --- events_dau_wau: activity stickiness -----------------------------------
# DAU, the containing ISO week's WAU, and the DAU/WAU stickiness
# ratio per day. Two distinct-count aggregations + an equi-join on
# the week key; the week timestamp stays internal (Spark date_trunc
# returns TIMESTAMP, DuckDB DATE — exporting it would hash-mismatch
# on representation, not value).

def _dau_wau(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    d = ev.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    w = (
        ev.withColumn("wk", F.date_trunc("week", F.col("day")))
        .groupBy("wk")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        d.withColumn("wk", F.date_trunc("week", F.col("day")))
        .join(F.broadcast(w), "wk")
        .select("day", "dau", "wau", ratio6("dau", "wau").alias("stickiness"))
    )


_DAU_WAU_SQL = f"""
WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events),
d AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM e GROUP BY 1),
w AS (
  SELECT date_trunc('week', day) AS wk, COUNT(DISTINCT user_id) AS wau
  FROM e GROUP BY 1
)
SELECT d.day, d.dau, w.wau, {ratio6_sql('d.dau', 'w.wau')} AS stickiness
FROM d JOIN w ON date_trunc('week', d.day) = w.wk
"""

register(QuerySpec(
    "events_dau_wau", _dau_wau, _DAU_WAU_SQL,
    "DAU / weekly-WAU stickiness per day (two distinct-count aggs + "
    "broadcast week join)",
    ("events", "agg", "engagement"),
))


# --- event_type_transitions: first-order Markov transition counts ---------
# The behavioral-model input: counts of consecutive (prev_type ->
# next_type) transitions within each user's event stream (lag window
# per user, total order by (ts, event_id)).

def _transitions(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


_TRANSITIONS_SQL = """
WITH lagged AS (
  SELECT event_type AS next_type,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type, next_type, COUNT(*) AS n_transitions
FROM lagged WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""

register(QuerySpec(
    "event_type_transitions", _transitions, _TRANSITIONS_SQL,
    "first-order event-type transition counts per user stream "
    "(Markov behavioral model input)",
    ("events", "window", "agg"),
))


# --- events_props_variant: VARIANT-typed JSON extraction ------------------
# The same engine-pinned extraction discipline as events_props_typed,
# driven through Spark's VARIANT type (try_parse_json + variant_get)
# instead of string-path extraction: the binary VARIANT encoding is
# parsed once and fields are read without re-tokenizing the JSON —
# the 100 TB answer to repeated get_json_object calls over the same
# column. Extraction surfaces the field as TEXT, accepts it only
# under the strict bounded-integer pattern, then casts — so the
# DuckDB oracle (which has no VARIANT) predicts every value exactly.

def _props_variant(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    raw = F.expr("variant_get(try_parse_json(props), '$.k', 'string')")
    typed = ev.withColumn(
        "k", F.when(raw.rlike(_K_INT_RE), raw.cast("int"))
    )
    return typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_unparsed"),
        F.sum(F.col("k").cast("bigint")).alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


_PROPS_VARIANT_SQL = f"""
WITH ex AS (
  SELECT event_type,
    CASE WHEN json_valid(props) THEN props->>'k' END AS raw
  FROM events
),
typed AS (
  SELECT event_type,
    CASE WHEN regexp_matches(raw, '{_K_INT_RE}') THEN CAST(raw AS INT) END AS k
  FROM ex
)
SELECT event_type,
  COUNT(*) AS n_events,
  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsed,
  CAST(SUM(CAST(k AS BIGINT)) AS BIGINT) AS sum_k,
  MIN(k) AS min_k,
  MAX(k) AS max_k
FROM typed
GROUP BY 1
"""

register(QuerySpec(
    "events_props_variant", _props_variant, _PROPS_VARIANT_SQL,
    "VARIANT-typed JSON field extraction (parse once, extract without "
    "re-tokenizing) with the strict bounded-integer discipline and "
    "unparsed-row audit",
    ("events", "json", "variant", "agg", "bench"),
))


# --- user_status_intervals: SCD2-style change capture ----------------------
# Build slowly-changing-dimension validity intervals from an event
# log: per user, collapse consecutive same-type events into one
# [valid_from, valid_to) interval per status run — the change-capture
# -> interval materialization every warehouse does for point-in-time
# joins. Timestamps compare at exact microsecond grain on both
# engines (unix micros); ties break on event_id, so run boundaries
# are fully deterministic. Per-user windows keep partitions bounded.

def _status_intervals(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros("ts").alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        changes.withColumn("next_us", F.lead("us").over(w2))
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            F.timestamp_micros(F.col("us")).alias("valid_from"),
            F.timestamp_micros(F.col("next_us")).alias("valid_to"),
        )
    )


_STATUS_INTERVALS_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events
),
marked AS (
  SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id)
         AS prev_type
  FROM ev
),
changes AS (
  SELECT * FROM marked
  WHERE prev_type IS NULL OR prev_type != event_type
)
SELECT user_id, event_type AS status,
  make_timestamp(us) AS valid_from,
  make_timestamp(LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id))
    AS valid_to
FROM changes
"""

register(QuerySpec(
    "user_status_intervals", _status_intervals, _STATUS_INTERVALS_SQL,
    "SCD2 validity intervals from event change capture (consecutive "
    "same-status runs collapsed, microsecond-exact boundaries)",
    ("events", "window", "scd"),
))


# --- events_ewma_daily: exact dyadic EWMA over the daily series -----------
# An exponentially-weighted moving average with dyadic weights
# 2^(7-k) over the last 8 daily totals (row-based series per type).
# Weights and totals are exact integers, so the smoothed value is an
# exact ratio — no sequential float recurrence, which would be
# engine-order fragile. Eight bounded lags (not a growing state)
# keep the window frame O(1); per-type daily series are tiny at any
# corpus scale (aggregation happens FIRST).

_EWMA_LAGS = 8


def _ewma_daily(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)")).alias("day_cents")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lags = {k: F.lag("day_cents", k).over(w) for k in range(_EWMA_LAGS)}
    num = None
    den = None
    for k in range(_EWMA_LAGS):
        wt = 2 ** (_EWMA_LAGS - 1 - k)
        term = F.coalesce(lags[k], F.lit(0)) * F.lit(wt)
        present = F.when(lags[k].isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = present if den is None else den + present
    return daily.select(
        "event_type", "day", "day_cents",
        num.alias("_n"),
        den.alias("_d"),
    ).select(
        "event_type", "day", "day_cents",
        ratio6("_n", "_d").alias("ewma_cents"),
    )


def _ewma_sql() -> str:
    terms = []
    present = []
    for k in range(_EWMA_LAGS):
        wt = 2 ** (_EWMA_LAGS - 1 - k)
        lag = (
            "day_cents" if k == 0
            else f"LAG(day_cents, {k}) OVER (PARTITION BY event_type ORDER BY day)"
        )
        terms.append(f"COALESCE({lag}, 0) * {wt}")
        present.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms)
    den = " + ".join(present)
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS day_cents
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, day, day_cents,
    {num} AS num, {den} AS den
  FROM daily
)
SELECT event_type, day, day_cents,
  {ratio6_sql("num", "den")} AS ewma_cents
FROM lagged
"""


register(QuerySpec(
    "events_ewma_daily", _ewma_daily, _ewma_sql(),
    "8-day dyadic-weight EWMA of daily value totals per event type "
    "(exact integer weights/lags, leading-edge renormalization)",
    ("events", "window", "timeseries"),
))


# --- events_value_log2_histogram: power-of-two value histogram ------------
# The log-scale histogram every monitoring pipeline wants, computed
# exactly: bucket = bit-length of the half-up integer cents (both
# engines expose the binary string; its length is floor(log2)+1).
# No log() calls, no float bucketing — integer in, integer out.

def _log2_hist(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    bucket = F.when(F.col("cents") <= 0, F.lit(0)).otherwise(
        F.length(F.bin(F.col("cents")))
    ).cast("int")
    return (
        ev.withColumn("bucket", bucket)
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


_LOG2_HIST_SQL = """
WITH ev AS (
  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
)
SELECT event_type,
  CAST(CASE WHEN cents <= 0 THEN 0 ELSE length(bin(cents)) END AS INT) AS bucket,
  COUNT(*) AS n_events,
  MIN(cents) AS min_cents,
  MAX(cents) AS max_cents
FROM ev GROUP BY 1, 2
"""

register(QuerySpec(
    "events_value_log2_histogram", _log2_hist, _LOG2_HIST_SQL,
    "power-of-two value histogram per event type via integer "
    "bit-length bucketing (no float log anywhere)",
    ("events", "histogram", "agg"),
))


# --- event_type_trend_slope: exact OLS slope of daily counts --------------
# Per-event-type linear trend of daily event counts: the least-squares
# slope over points (x = day index, y = daily count), computed from
# the closed form n*Sxy - Sx*Sy over n*Sxx - Sx^2. Every sum is pure
# int64 (day indices and counts), so numerator and denominator are
# exact on both engines; the final slope goes through sratio6 (signed
# half-away-from-zero int64 rescaling) — no double accumulation
# anywhere, per the catalog determinism conventions. At corpus scale
# this is a two-level map-side-combinable aggregation over a handful
# of event types: the daily rollup shrinks the data to (types x days)
# rows before the moment sums.

_SLOPE_ANCHOR = "2024-01-01"  # test-lake epoch; any fixed literal works


def _trend_slope(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    pts = daily.select(
        "event_type",
        F.datediff("day", F.lit(_SLOPE_ANCHOR).cast("date"))
        .cast("long").alias("x"),
        "y",
    )
    agg = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = agg.select(
        "event_type",
        F.col("n").alias("n_days"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long").alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long").alias("slope_den"),
    )
    return d.select(
        "event_type", "n_days", "slope_num", "slope_den",
        F.when(
            F.col("slope_den") > 0, sratio6("slope_num", "slope_den")
        ).alias("slope_per_day"),
    )


_TREND_SLOPE_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
pts AS (
  SELECT event_type, CAST(day - DATE '{_SLOPE_ANCHOR}' AS BIGINT) AS x, y
  FROM daily
),
agg AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
    SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts GROUP BY 1
),
d AS (
  SELECT event_type, n AS n_days,
    CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
    CAST(n * sxx - sx * sx AS BIGINT) AS slope_den
  FROM agg
)
SELECT event_type, n_days, slope_num, slope_den,
  CASE WHEN slope_den > 0
    THEN {sratio6_sql('slope_num', 'slope_den')} END AS slope_per_day
FROM d
"""

register(QuerySpec(
    "event_type_trend_slope", _trend_slope, _TREND_SLOPE_SQL,
    "per-event-type least-squares trend slope of daily counts — exact "
    "int64 moment sums, signed half-away-from-zero 6dp division",
    ("events", "agg", "regression", "bench"),
))


# --- events_sequence_match: view -> click -> purchase within gaps ---------
# MATCH_RECOGNIZE-style 3-step pattern: a view completes if the SAME
# user's EARLIEST following click lands within the gap, and the
# earliest purchase after that click lands within another gap.
# Gap = 6 h (round-10): the synthetic events run ~1 event per user
# per 10.7 h, so the original 30-min gap NEVER fired and the query's
# two gate greens were vacuous 0=0 hash matches (round-9 verdict
# wrong #2). 6 h fires at every tier (1/20/249 completed triples at
# sf0.001/0.01/0.1) while keeping the earliest-next semantics and
# the oracle in lockstep; tests/test_round10_queries.py pins the
# non-empty behavior on crafted chains.
# "Earliest-next" makes the match deterministic (no combinatorial
# pairing): each step is an equi-join on user_id carrying the time
# band, reduced by a min() aggregate at the anchor grain before the
# next step — never an exploding multi-way product. At 100 TB the
# user-key join carries the range predicate; a celebrity user routes
# through the bucketed interval join (operators/temporal.py) instead.

_SEQ_GAP_MS = 360 * 60 * 1000


def _seq_match(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", F.unix_millis("ts").alias("ms"),
        F.to_date("ts").alias("day"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"),
        F.col("ms").alias("v_ms"), "day",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ms").alias("c_ms"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ms").alias("p_ms"))

    first_click = (
        views.join(
            clicks,
            (views.user_id == clicks.cu)
            & (clicks.c_ms > views.v_ms)
            & (clicks.c_ms <= views.v_ms + _SEQ_GAP_MS),
        )
        .groupBy("user_id", "view_id", "v_ms", "day")
        .agg(F.min("c_ms").alias("first_c_ms"))
    )
    completed = (
        first_click.join(
            purchases,
            (first_click.user_id == purchases.pu)
            & (purchases.p_ms > first_click.first_c_ms)
            & (purchases.p_ms <= first_click.first_c_ms + _SEQ_GAP_MS),
        )
        .groupBy("user_id", "view_id", "day")
        .agg(F.min("p_ms").alias("first_p_ms"))
    )
    return completed.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.countDistinct("user_id").alias("n_users"),
    )


_SEQ_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms, CAST(ts AS DATE) AS day
  FROM events
),
first_click AS (
  SELECT v.user_id, v.event_id AS view_id, v.ms AS v_ms, v.day,
         MIN(c.ms) AS first_c_ms
  FROM ev v
  JOIN ev c ON c.user_id = v.user_id AND c.event_type = 'click'
    AND c.ms > v.ms AND c.ms <= v.ms + {_SEQ_GAP_MS}
  WHERE v.event_type = 'view'
  GROUP BY 1, 2, 3, 4
),
completed AS (
  SELECT f.user_id, f.view_id, f.day, MIN(p.ms) AS first_p_ms
  FROM first_click f
  JOIN ev p ON p.user_id = f.user_id AND p.event_type = 'purchase'
    AND p.ms > f.first_c_ms AND p.ms <= f.first_c_ms + {_SEQ_GAP_MS}
  GROUP BY 1, 2, 3
)
SELECT day, COUNT(*) AS n_sequences, COUNT(DISTINCT user_id) AS n_users
FROM completed GROUP BY day
"""

register(QuerySpec(
    "events_sequence_match", _seq_match, _SEQ_SQL,
    "3-step view->click->purchase pattern within 6-hour gaps "
    "(earliest-next semantics: banded user joins + min-reduce per "
    "anchor, no combinatorial pairing)",
    ("events", "join", "temporal", "bench"),
))


# --- events_lttb_downsample: extremum-representative time buckets ---------
# Dashboard downsampling in the LTTB spirit: per (event_type, hour
# bucket) keep the single point FARTHEST from the bucket mean, with
# the distance computed as the exact integer cross-multiplication
# |value_cents * n - sum_cents| (no float mean), ties broken by
# event_id. One shuffle to the bucket grain for the moments, one
# window for the argmax — at 100 TB a 10^6-point series reduces to
# n_buckets rows with no collect and no float comparisons.

def _lttb(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_type", "event_id",
        F.expr("unix_millis(ts) div 3600000").alias("bucket"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    moments = ev.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
    w = Window.partitionBy("event_type", "bucket").orderBy(
        F.abs(F.col("cents") * F.col("n") - F.col("s")).desc(), F.col("event_id"))
    return (
        ev.join(moments, ["event_type", "bucket"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type", "bucket",
            F.col("event_id").alias("rep_event_id"),
            F.col("cents").alias("rep_value_cents"),
            "n",
        )
    )


_LTTB_SQL = """
WITH ev AS (
  SELECT event_type, event_id, epoch_ms(ts) // 3600000 AS bucket,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
m AS (
  SELECT event_type, bucket, COUNT(*) AS n, SUM(cents) AS s
  FROM ev GROUP BY 1, 2
),
ranked AS (
  SELECT ev.event_type, ev.bucket, ev.event_id, ev.cents, m.n,
    ROW_NUMBER() OVER (PARTITION BY ev.event_type, ev.bucket
      ORDER BY abs(ev.cents * m.n - m.s) DESC, ev.event_id) AS rn
  FROM ev JOIN m USING (event_type, bucket)
)
SELECT event_type, bucket, event_id AS rep_event_id,
  cents AS rep_value_cents, n
FROM ranked WHERE rn = 1
"""

register(QuerySpec(
    "events_lttb_downsample", _lttb, _LTTB_SQL,
    "LTTB-spirit downsampling: per (type, hour) keep the point "
    "farthest from the bucket mean via exact integer "
    "cross-multiplication, unique-key tie-break",
    ("events", "window", "agg"),
))


# --- events_debounce: burst suppression (event-time dedup-with-tolerance) -
# The stream-hygiene op between exact dedup and sessionization:
# repeated (user, type) events inside a 30-second tolerance are
# bursts (double-clicks, retries, at-least-once replays) and only
# the burst HEAD survives. Pure lag-window arithmetic on exact
# microsecond integers — per-key partitions, no global order, the
# same shape Structured Streaming runs with dropDuplicatesWithinWatermark.

_DEBOUNCE_US = 30_000_000


def _debounce(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    return (
        ev.withColumn("gap_us", us - prev_us)
        .filter(F.col("gap_us").isNull() | (F.col("gap_us") > _DEBOUNCE_US))
        .select(
            "user_id", "event_type", "event_id",
            F.col("gap_us").cast("long").alias("gap_us"),
        )
    )


_DEBOUNCE_SQL = f"""
WITH lagged AS (
  SELECT user_id, event_type, event_id,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (
      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, event_type, event_id, CAST(gap_us AS BIGINT) AS gap_us
FROM lagged WHERE gap_us IS NULL OR gap_us > {_DEBOUNCE_US}
"""

register(QuerySpec(
    "events_debounce", _debounce, _DEBOUNCE_SQL,
    "30-second burst suppression per (user, type): only burst heads "
    "survive (event-time dedup-with-tolerance; exact microsecond lag "
    "arithmetic, per-key windows)",
    ("events", "window", "dedup"),
))


# --- events_sliding_distinct_users: exact sliding distinct ----------------
# Sliding-window COUNT DISTINCT is the expensive one: a RANGE-frame
# countDistinct is unsupported/naive on any engine, so the scale-safe
# shape is dedupe-then-count — explode each event into the sliding
# windows that contain it (window count = window/slide, a small
# constant), dedupe (window_start, user) with a first-level groupBy
# (map-side combinable), then count per window. Both shuffles key on
# window_start, so the second reuses the first's partitioning. Here:
# 1-hour windows sliding every 15 minutes.

_SLIDE_US = 15 * 60 * 1_000_000
_WIN_SLICES = 4  # 1 h / 15 min


def _sliding_distinct(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    slice_idx = F.expr(f"unix_micros(ts) div {_SLIDE_US}")
    win = ev.select(
        "user_id",
        F.explode(
            F.sequence(slice_idx - _WIN_SLICES + 1, slice_idx)
        ).alias("win_idx"),
    )
    per_user = win.groupBy("win_idx", "user_id").agg(F.count(F.lit(1)).alias("__n"))
    return (
        per_user.groupBy("win_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_users"),
            F.sum("__n").cast("long").alias("n_events"),
        )
        .select(
            F.timestamp_micros(F.col("win_idx") * _SLIDE_US).alias("window_start"),
            "n_distinct_users", "n_events",
        )
    )


_SLIDING_DISTINCT_SQL = f"""
WITH sliced AS (
  SELECT user_id, epoch_us(ts) // {_SLIDE_US} AS slice_idx FROM events
),
win AS (
  SELECT user_id, unnest(range(slice_idx - {_WIN_SLICES} + 1, slice_idx + 1))
    AS win_idx
  FROM sliced
),
per_user AS (
  SELECT win_idx, user_id, COUNT(*) AS n FROM win GROUP BY 1, 2
)
SELECT make_timestamp(win_idx * {_SLIDE_US}) AS window_start,
  CAST(COUNT(*) AS BIGINT) AS n_distinct_users,
  CAST(SUM(n) AS BIGINT) AS n_events
FROM per_user GROUP BY 1
"""

register(QuerySpec(
    "events_sliding_distinct_users", _sliding_distinct,
    _SLIDING_DISTINCT_SQL,
    "exact distinct users per 1-hour window sliding every 15 min via "
    "the dedupe-then-count shape (explode into window/slide slices, "
    "two map-side-combinable aggregations sharing one key)",
    ("events", "window", "agg"),
))


# --- events_session_spans: per-session grain (round-7) --------------------
# The session-grain face of events_sessionization (which aggregates
# to per-user counts): lag-flag + running-sum session ids, one row
# per session with exact microsecond start/span. This is the batch
# SPEC for the streaming F.session_window twin
# (streaming/event_hygiene.session_windows_stream — gap_ms + 1
# boundary calibration, AvailableNow equivalence test). Two window
# passes and the final aggregation all share the user_id key: one
# shuffle, per-user partitions, no global order.

_SESSION_GAP_US = 30 * 60 * 1_000_000


def _session_spans(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_s = F.when(
        F.lag(us).over(w).isNull()
        | (us - F.lag(us).over(w) > _SESSION_GAP_US),
        1,
    ).otherwise(0)
    sess = ev.withColumn("__us", us).withColumn(
        "__sid",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "__sid").agg(
        F.min("__us").cast("long").alias("session_start_us"),
        (F.max("__us") - F.min("__us")).cast("long").alias("span_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    ).drop("__sid")


_SESSION_SPANS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, us,
    SUM(new_s) OVER (
      PARTITION BY user_id ORDER BY us, event_id
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
  CAST(MIN(us) AS BIGINT) AS session_start_us,
  CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, sid
"""

register(QuerySpec(
    "events_session_spans", _session_spans, _SESSION_SPANS_SQL,
    "per-session rows (exact microsecond start/span/count) via "
    "lag-flag + running-sum ids — the batch spec of the streaming "
    "session_window twin",
    ("events", "window", "sessionization"),
))


# --- events_theilsen_slope: robust trend (median of pairwise slopes) -------
# The Theil-Sen estimator: per event type, the MEDIAN of all pairwise
# slopes (y_j - y_i) / (x_j - x_i) over daily-count points — the
# robust twin of event_type_trend_slope's OLS (a 29%-breakdown
# estimator: one corrupted day cannot move it). Each slope is ONE
# IEEE division of two exact int64s (engine-identical); the median is
# the LOWER median by row_number — no float averaging anywhere. Scale
# shape: the pair join runs on the collapsed (type, day) grain —
# #days^2/2 pairs per type, never corpus rows; for decade-long ranges
# bound it by pairing each day only with the next 90 (the windowed
# Theil-Sen variant) — the fence arithmetic is unchanged.

def _theilsen(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    pts = daily.select(
        "event_type",
        F.datediff("day", F.lit(_SLOPE_ANCHOR).cast("date"))
        .cast("long").alias("x"),
        "y",
    )
    a = pts.select("event_type", F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = pts.select("event_type", F.col("x").alias("xj"), F.col("y").alias("yj"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("xi") < F.col("xj"))
        .select(
            "event_type",
            ((F.col("yj") - F.col("yi")).cast("double")
             / (F.col("xj") - F.col("xi")).cast("double")).alias("slope"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    ranked = slopes.select(
        "event_type", "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.partitionBy("event_type")).alias("n_pairs"),
    )
    return (
        ranked.filter(F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2))
        .select("event_type", "n_pairs",
                F.col("slope").alias("theilsen_slope"))
        .orderBy("event_type")
    )


_THEILSEN_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
pts AS (
  SELECT event_type,
    CAST(datediff('day', DATE '{_SLOPE_ANCHOR}', day) AS BIGINT) AS x, y
  FROM daily
),
slopes AS (
  SELECT a.event_type,
    CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
  FROM pts a JOIN pts b
    ON a.event_type = b.event_type AND a.x < b.x
),
ranked AS (
  SELECT event_type, slope,
    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope) AS rn,
    COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM slopes
)
SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
  slope AS theilsen_slope
FROM ranked
WHERE rn = (n_pairs + 1) // 2
ORDER BY event_type
"""

register(QuerySpec(
    "events_theilsen_slope", _theilsen, _THEILSEN_SQL,
    "Theil-Sen robust trend per event type: lower-median of all "
    "pairwise daily-count slopes (each ONE exact-int IEEE divide), "
    "pair join on the collapsed (type, day) grain",
    ("events", "window", "robust"),
))


# --- events_distribution_drift: event-mix drift between time halves --------
# Population-drift audit: split the observed day range at its
# midpoint, compare each event type's share of the first half vs the
# second. The share delta is computed as the exact cross-multiplied
# integer cnt1*T2 - cnt2*T1 over T1*T2 through sratio6 — no float
# shares are ever subtracted (the L1/total-variation building block,
# the log-free stand-in for PSI/KL drift scores). Scale shape: one
# map-side-combinable (type, half) aggregation; the day-range scalars
# broadcast. Headroom (r7 ADVICE correction): the binding bound is
# sratio6's internal x2,000,000 rescale — worst-case
# abs(cnt1*t2 - cnt2*t1) ~ t1*t2, so t1*t2*2e6 must stay in int64,
# i.e. ~2.1e6 events per half (NOT the ~3e9 a bare cnt*T product
# suggests); rescale counts to per-thousand units first beyond that.
# Degenerate splits (every event in one half — single-day lakes) make
# t1 or t2 zero: DuckDB errors loudly on the zero divisor while
# non-ANSI Spark would yield NULL shares, so the guard below raises
# on the Spark side too — both engines fail loudly, neither diverges.

def _drift(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    days = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit(_SLOPE_ANCHOR).cast("date"))
        .cast("long").alias("x"),
    )
    rng = days.agg(
        F.min("x").alias("x_min"), F.max("x").alias("x_max"))
    halved = days.crossJoin(F.broadcast(rng)).select(
        "event_type",
        (F.col("x") <= F.floor((F.col("x_min") + F.col("x_max")) / 2))
        .alias("first_half"),
    )
    per = halved.groupBy("event_type").agg(
        F.sum(F.when(F.col("first_half"), 1).otherwise(0)).alias("cnt1"),
        F.sum(F.when(~F.col("first_half"), 1).otherwise(0)).alias("cnt2"),
    )
    tot = per.agg(
        F.sum("cnt1").alias("t1"), F.sum("cnt2").alias("t2"))
    # loud ceiling + non-degenerate split (see headroom note above)
    guarded_t1 = F.coalesce(
        F.assert_true(
            (F.col("t1") > 0) & (F.col("t2") > 0)
            & (F.col("t1") * F.col("t2") < F.lit(4_600_000_000_000)),
            F.lit("events_distribution_drift: degenerate half-split "
                  "(t1 or t2 = 0) or t1*t2 exceeds sratio6 int64 "
                  "headroom (x2e6 rescale) — rescale counts to "
                  "per-thousand units or widen the day range"),
        ).cast("long"),
        F.col("t1"),
    )
    tot = tot.withColumn("t1", guarded_t1)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "event_type", "cnt1", "cnt2",
            ratio6("cnt1", "t1").alias("share1"),
            ratio6("cnt2", "t2").alias("share2"),
            sratio6("cnt1 * t2 - cnt2 * t1", "t1 * t2").alias("share_drift"),
        )
        .orderBy("event_type")
    )


_DRIFT_SQL = f"""
WITH days AS (
  SELECT event_type,
    CAST(datediff('day', DATE '{_SLOPE_ANCHOR}', CAST(ts AS DATE)) AS BIGINT) AS x
  FROM events
),
rng AS (SELECT MIN(x) AS x_min, MAX(x) AS x_max FROM days),
per AS (
  SELECT event_type,
    CAST(SUM(CASE WHEN x <= (x_min + x_max) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS cnt1,
    CAST(SUM(CASE WHEN x > (x_min + x_max) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS cnt2
  FROM days CROSS JOIN rng
  GROUP BY event_type
),
tot AS (SELECT CAST(SUM(cnt1) AS BIGINT) AS t1, CAST(SUM(cnt2) AS BIGINT) AS t2 FROM per)
SELECT event_type, cnt1, cnt2,
  {ratio6_sql("cnt1", "t1")} AS share1,
  {ratio6_sql("cnt2", "t2")} AS share2,
  {sratio6_sql("cnt1 * t2 - cnt2 * t1", "t1 * t2")} AS share_drift
FROM per CROSS JOIN tot
ORDER BY event_type
"""

register(QuerySpec(
    "events_distribution_drift", _drift, _DRIFT_SQL,
    "event-mix drift between the first and second half of the day "
    "range: exact cross-multiplied share deltas (the total-variation "
    "building block), no float share subtraction",
    ("events", "agg", "quality"),
))


# --- events_cusum_changepoint: exact CUSUM change-point detection -----------
# Per event type: the day where the cumulative sum of deviations from
# the mean daily count peaks in magnitude — the classic CUSUM
# change-point statistic. The deviation sum is kept exact by cross-
# multiplication: S_d = sum_{i<=d} (y_i * n - T) (i.e. n * the usual
# (y_i - T/n) partial sum, an integer), so the argmax day and the
# peak magnitude are bit-identical on both engines with no float
# accumulation. Scale shape: the corpus collapses to (type, day)
# grain first; the cumulative window runs per type over day order —
# hundreds of rows per partition regardless of event volume.

def _cusum(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("y"))
    pts = daily.select(
        "event_type",
        F.datediff("day", F.lit(_SLOPE_ANCHOR).cast("date"))
        .cast("long").alias("x"),
        "y",
    )
    per = Window.partitionBy("event_type")
    cum = (
        pts.withColumn("n", F.count(F.lit(1)).over(per))
        .withColumn("t", F.sum("y").over(per))
        .withColumn(
            "s",
            F.sum(F.col("y") * F.col("n") - F.col("t")).over(
                per.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    best = cum.groupBy("event_type").agg(
        F.max("n").alias("n_days"),
        F.max(F.struct(
            F.abs(F.col("s")).alias("a"),
            (-F.col("x")).alias("nx"),
            F.col("s").alias("sv"),
        )).alias("b"),
    )
    return best.select(
        "event_type", "n_days",
        (-F.col("b.nx")).alias("cp_day"),
        F.col("b.a").alias("cusum_peak_scaled"),
        F.when(F.col("b.sv") >= 0, F.lit(1)).otherwise(F.lit(-1))
        .alias("direction"),
    ).orderBy("event_type")


_CUSUM_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
pts AS (
  SELECT event_type,
    CAST(datediff('day', DATE '{_SLOPE_ANCHOR}', day) AS BIGINT) AS x, y
  FROM daily
),
scal AS (
  SELECT event_type, x, y,
    COUNT(*) OVER (PARTITION BY event_type) AS n,
    SUM(y) OVER (PARTITION BY event_type) AS t
  FROM pts
),
cum AS (
  SELECT event_type, x, n,
    SUM(y * n - t)
      OVER (PARTITION BY event_type ORDER BY x
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM scal
),
ranked AS (
  SELECT event_type, n, x, s,
    ROW_NUMBER() OVER (PARTITION BY event_type
                       ORDER BY abs(s) DESC, x ASC) AS rn
  FROM cum
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
  x AS cp_day,
  CAST(abs(s) AS BIGINT) AS cusum_peak_scaled,
  CAST(CASE WHEN s >= 0 THEN 1 ELSE -1 END AS INT) AS direction
FROM ranked WHERE rn = 1
ORDER BY event_type
"""

register(QuerySpec(
    "events_cusum_changepoint", _cusum, _CUSUM_SQL,
    "CUSUM change-point per event type: peak |cumulative deviation| "
    "day over exact cross-multiplied integers (S_d = sum(y*n - T)), "
    "cumulative window on the collapsed (type, day) grain",
    ("events", "window", "robust"),
))


# --- mv_rollup_serving: aggregate-navigator serving proof (round-10) --------
# The read-side contract of the MV investment (mv.py + the IVM sink):
# a month x type dashboard request is answered FROM the published
# (day, type) materialized aggregate via the functional rollup
# month = trunc(day), never from raw events — and the result is
# hash-proven EQUAL to computing from base (the DuckDB oracle goes
# straight at events), which is the SUM-reaggregation algebra the
# whole serving layer rests on. The served_from column pins WHICH
# source answered: if the navigator ever silently falls back to
# base, the literal flips and the gate hash fails even though the
# numbers would still match. mv_rows / base_rows carry the scan
# economics (serving reads |days| x |types| rows, not |events|) —
# at 100 TB that ratio is the whole point.

def _mv_serving(spark: SparkSession, sf: str) -> DataFrame:
    from ..mv import MatView, serve

    ev = load_table(spark, sf, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
            .cast("long").alias("sum_cents"),
        )
        .localCheckpoint(eager=True)  # the "published" MV
    )
    mv = MatView(
        "daily_type", ("day", "event_type"), ("n", "sum_cents"), daily,
        {"month": "trunc(day, 'month')"},
    )

    def base() -> DataFrame:  # pragma: no cover — navigator must hit the MV
        return (
            ev.groupBy(
                F.trunc(F.to_date("ts"), "month").alias("month"),
                "event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.expr(
                     "CAST(floor(value * 100 + 0.5) AS BIGINT)"))
                 .cast("long").alias("sum_cents"))
        )

    served, src = serve(("month", "event_type"), [mv], base)
    mv_rows = daily.agg(F.count(F.lit(1)).cast("long").alias("mv_rows"))
    base_rows = ev.agg(F.count(F.lit(1)).cast("long").alias("base_rows"))
    return (
        served
        .withColumn("served_from", F.lit(src))
        .crossJoin(F.broadcast(mv_rows))
        .crossJoin(F.broadcast(base_rows))
        .select("month", "event_type", "n", "sum_cents", "served_from",
                "mv_rows", "base_rows")
    )


_MV_SERVING_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS sum_cents
  FROM events GROUP BY 1, 2
)
SELECT CAST(date_trunc('month', day) AS DATE) AS month, event_type,
  CAST(SUM(n) AS BIGINT) AS n,
  CAST(SUM(sum_cents) AS BIGINT) AS sum_cents,
  'daily_type' AS served_from,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS mv_rows,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS base_rows
FROM daily GROUP BY 1, 2
"""

register(QuerySpec(
    "mv_rollup_serving", _mv_serving, _MV_SERVING_SQL,
    "materialized-view rollup serving: month x type dashboard "
    "answered from the published (day, type) aggregate via the "
    "functional month rollup (mv.py navigator), hash-proven equal "
    "to base with the serving source and scan economics pinned in "
    "the result",
    ("events", "agg", "mv", "bench"),
))
