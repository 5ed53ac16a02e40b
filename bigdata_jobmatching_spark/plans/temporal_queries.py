"""Temporal-join + skew-mitigation workload over ``events``.

As-of and range joins are the operators Spark lacks natively (SURVEY
§2.3 notes the reference has none either, but any serious analytics
engine needs them); both are composed from stock DataFrame ops so
Catalyst plans them (union+window / bucketed hash join). Timestamps
are truncated to milliseconds on BOTH engines so ordering ties agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import skew
from ..operators.temporal import asof_join, range_join
from ..sources.io import load_table
from .catalog import QuerySpec, register


def _events_ms(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return ev.withColumn("ts", F.timestamp_millis(F.unix_millis("ts")))


# --- purchase_click_attribution: as-of join --------------------------------

def _attribution(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events_ms(spark, sf)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = asof_join(
        purchases, clicks,
        key="user_id", left_ts="ts", right_ts="click_ts",
        right_payload=["click_id"],
        tiebreak=["purchase_id"],
    )
    return joined.select(
        "user_id", "purchase_id",
        F.col("click_id_asof").alias("click_id"),
    )


# DuckDB twin: running last_value(click ignore nulls) over the merged
# per-user timeline; clicks sort before purchases at equal ts.
_ATTRIBUTION_SQL = """
WITH u AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ms,
    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag
  FROM events WHERE event_type IN ('click', 'purchase')
),
carried AS (
  SELECT user_id, event_id, event_type,
    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ms, tag, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id
  FROM u
)
SELECT user_id, event_id AS purchase_id, click_id
FROM carried WHERE event_type = 'purchase'
"""

register(QuerySpec(
    "purchase_click_attribution", _attribution, _ATTRIBUTION_SQL,
    "as-of join (latest click at-or-before each purchase) via union+window — no native asof in Spark",
    ("temporal", "asof", "window", "bench"),
))


# --- signup_followup_counts: bounded range join ----------------------------

def _followups(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events_ms(spark, sf)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), "ts"
    )
    others = ev.filter(F.col("event_type") != "signup").select(
        F.col("user_id"), F.col("event_id").alias("other_id"), F.col("ts").alias("ots")
    )
    pairs = range_join(
        signups, others,
        key="user_id", left_ts="ts", right_ts="ots",
        horizon_seconds=3600, bucket_minutes=60,
    )
    return (
        pairs.groupBy("signup_id")
        .agg(F.count(F.lit(1)).alias("n_followups"))
    )


_FOLLOWUPS_SQL = """
SELECT s.event_id AS signup_id, COUNT(*) AS n_followups
FROM events s JOIN events o
  ON s.user_id = o.user_id
 AND o.event_type != 'signup'
 AND epoch_ms(o.ts) >= epoch_ms(s.ts)
 AND epoch_ms(o.ts) <= epoch_ms(s.ts) + 3600000
WHERE s.event_type = 'signup'
GROUP BY s.event_id
"""

register(QuerySpec(
    "signup_followup_counts", _followups, _FOLLOWUPS_SQL,
    "bounded range join (events within 1h after signup) via time-bucketed equi-join",
    ("temporal", "range-join", "bench"),
))


# --- salted_event_type_stats: two-phase salted aggregation -----------------
# event_type has 5 values over N rows — the canonical aggregation-skew
# shape. The salted plan must produce byte-identical results to the
# plain GROUP BY the oracle runs.

_SALTED_SQL = """
SELECT event_type, COUNT(*) AS n_events,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
  MIN(user_id) AS min_user, MAX(user_id) AS max_user
FROM events GROUP BY event_type
"""


def _salted_stats_wrapped(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").withColumn(
        "__value_dec", F.col("value").cast("decimal(18,6)")
    )
    out = skew.salted_agg(
        ev,
        group_cols=["event_type"],
        salt_source=F.col("event_id"),
        aggs={
            "n_events": ("*", "count"),
            "total_value": ("__value_dec", "sum"),
            "min_user": ("user_id", "min"),
            "max_user": ("user_id", "max"),
        },
        n_salts=16,
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


register(QuerySpec(
    "salted_event_type_stats", _salted_stats_wrapped, _SALTED_SQL,
    "two-phase salted aggregation for hot keys — identical result to plain GROUP BY",
    ("skew", "agg"),
))


# --- open_orders_by_month: sweep-line interval aggregation ----------------
# "How many order lines were ordered but not yet shipped on each
# month-start?" — the classic interval-overlap query. Three plans,
# worst to best at 100 TB:
#   (1) nested-loop range join of every line against the date grid
#       (grid x the scan width);
#   (2) tile each interval into the month-starts it covers + groupBy
#       (fan-out = interval length — 8.5M exploded rows here, long
#       transit intervals make "bounded" fan-out 14x);
#   (3) THIS: the sweep-line / difference-array formulation — each
#       interval emits exactly TWO integer deltas (+1 at its first
#       open month, -1 at its first closed month), deltas partial-
#       aggregate map-side to ~100 month rows, and a broadcast
#       triangle cumsum turns deltas into running open counts.
# Cost is 2 tiny rows per input row regardless of interval length —
# immune to both grid size and interval duration. Month indexes are
# pure integer arithmetic (year*12+month), identical cross-engine;
# the DuckDB oracle deliberately keeps formulation (2), so the gate
# cross-checks two INDEPENDENT algorithms for the same semantics.
# Order-grain counts ride the same sweep over per-order intervals
# [o_orderdate, max(l_shipdate)).

# first month-start index >= ts (month index = year*12 + month-1)
_M_IDX = (
    "(year({c}) * 12 + month({c}) - 1"
    " + CASE WHEN date_trunc('month', {c}) = {c} THEN 0 ELSE 1 END)"
)


def _open_orders(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    # The joined interval frame feeds BOTH delta branches (line grain
    # + order grain); without the checkpoint each branch re-runs the
    # lineitem x orders join and both scans. r15 re-measured all three
    # shapes interleaved in one session (min-of-4 at sf0.1): ckpt 1.81s
    # < two-join plain 1.99s < shared o_orderkey repartition 2.48s —
    # the r14 driver's 1.76->2.06 reading was ambient load, and the
    # exchange-sharing alternative is strictly worse (a 600k-row
    # shuffle costs more than the in-memory block rebuild). Recompute
    # story at scale: the checkpointed frame is three ints per line;
    # losing an executor re-runs this one query, and the upstream is
    # a single BHJ over two scans — bounded, not a deep chain.
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "o_orderkey",
            F.expr(_M_IDX.format(c="o_orderdate")).alias("s_idx"),
            F.expr(_M_IDX.format(c="l_shipdate")).alias("e_idx"),
        )
        .localCheckpoint(eager=False)
    )

    def deltas(df: DataFrame, col: str) -> DataFrame:
        cells = F.array(
            F.struct(F.col("s_idx").alias("idx"), F.lit(1).alias("d")),
            F.struct(F.col("e_idx").alias("idx"), F.lit(-1).alias("d")),
        )
        return (
            df.filter(F.col("s_idx") < F.col("e_idx"))
            .select(F.explode(cells).alias("c"))
            .groupBy(F.col("c.idx").alias("idx"))
            .agg(F.sum("c.d").alias(col))
        )

    line_d = deltas(j, "ld")
    order_d = deltas(
        j.groupBy("o_orderkey", "s_idx").agg(F.max("e_idx").alias("e_idx")),
        "od",
    )
    d = (
        line_d.join(order_d, "idx", "full")
        .select(
            "idx",
            F.coalesce("ld", F.lit(0)).alias("ld"),
            F.coalesce("od", F.lit(0)).alias("od"),
        )
    )
    earlier = d.select(
        F.col("idx").alias("e_i"), F.col("ld").alias("e_ld"), F.col("od").alias("e_od")
    )
    cum = (
        d.join(F.broadcast(earlier), F.col("e_i") <= F.col("idx"))
        .groupBy("idx")
        .agg(
            F.sum("e_ld").alias("n_open_lines"),
            F.sum("e_od").alias("n_open_orders"),
        )
        .filter(F.col("n_open_lines") > 0)
    )
    return cum.select(
        F.expr("make_date(idx div 12, idx % 12 + 1, 1)").alias("month"),
        "n_open_lines", "n_open_orders",
    )


_OPEN_ORDERS_SQL = """
WITH j AS (
  SELECT o.o_orderkey, o.o_orderdate, l.l_shipdate
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
tiled AS (
  SELECT o_orderkey, unnest(
    CASE WHEN (CASE WHEN date_trunc('month', o_orderdate) = o_orderdate
                    THEN o_orderdate
                    ELSE date_trunc('month', o_orderdate) + INTERVAL 1 MONTH END)
              <= date_trunc('month', l_shipdate - INTERVAL 1 SECOND)
         THEN generate_series(
           CASE WHEN date_trunc('month', o_orderdate) = o_orderdate
                THEN o_orderdate
                ELSE date_trunc('month', o_orderdate) + INTERVAL 1 MONTH END,
           date_trunc('month', l_shipdate - INTERVAL 1 SECOND),
           INTERVAL 1 MONTH)
         ELSE [] END) AS m
  FROM j
)
SELECT CAST(m AS DATE) AS month,
       COUNT(*) AS n_open_lines,
       COUNT(DISTINCT o_orderkey) AS n_open_orders
FROM tiled GROUP BY 1
"""

register(QuerySpec(
    "open_orders_by_month", _open_orders, _OPEN_ORDERS_SQL,
    "order lines/orders in flight at each month-start via sweep-line "
    "integer deltas (2 rows per interval, immune to interval length; "
    "oracle cross-checks the independent tiling formulation)",
    ("temporal", "interval", "bench"),
))


# --- user_value_twa: time-weighted average ---------------------------------
# The time-series-engine staple: average of a sampled signal weighted
# by how long each sample was current. Durations are exact integer
# milliseconds (unix_millis on both engines), values are half-up
# integer cents, and the final average is a half-up integer-cent
# division — no float accumulation anywhere, so the result is
# engine-identical. Per-user window (lead over ts, event_id) keeps
# partitions user-bounded at scale.

def _twa(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "value",
        F.unix_millis("ts").alias("ms"),
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    seg = (
        ev.withColumn("next_ms", F.lead("ms").over(w))
        .filter(F.col("next_ms").isNotNull())
        .select(
            "user_id",
            (F.col("next_ms") - F.col("ms")).alias("dur_ms"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum("dur_ms").alias("total_dur_ms"),
            F.sum(F.expr("cents * dur_ms")).alias("wsum"),
        )
        .select(
            "user_id", "n_segments", "total_dur_ms",
            F.expr(
                "CAST((2 * wsum + total_dur_ms) div NULLIF(2 * total_dur_ms, 0) AS DOUBLE)"
                " / 100.0"
            ).alias("twa_value"),
        )
    )


_TWA_SQL = """
WITH ev AS (
  SELECT user_id, event_id, value, epoch_ms(ts) AS ms FROM events
),
seg AS (
  SELECT user_id,
    LEAD(ms) OVER (PARTITION BY user_id ORDER BY ms, event_id) - ms AS dur_ms,
    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM ev
)
SELECT user_id,
  COUNT(*) AS n_segments,
  CAST(SUM(dur_ms) AS BIGINT) AS total_dur_ms,
  CAST((2 * SUM(cents * dur_ms) + SUM(dur_ms)) // NULLIF(2 * SUM(dur_ms), 0) AS DOUBLE)
    / 100.0 AS twa_value
FROM seg WHERE dur_ms IS NOT NULL
GROUP BY user_id
"""

register(QuerySpec(
    "user_value_twa", _twa, _TWA_SQL,
    "per-user time-weighted average of the event value signal "
    "(exact integer ms-weighted cents, half-up cent division)",
    ("temporal", "window"),
))


# --- user_status_point_in_time: PIT lookup against the event log ----------
# "What was every user's status at time T?" — the point-in-time
# reconstruction that consumes the SCD2 intervals
# (user_status_intervals) without materializing them: per user, the
# latest status event at or before T via a single max_by aggregate
# over the pre-filtered log. Deterministic: the argmax key is the
# unique (unix_micros, event_id) pair encoded into one int64-safe
# struct ordering on both engines. Scale: filter pushes to the scan
# (ts <= T), one map-side-combinable argmax per user — no window, no
# interval join.

_PIT_T = "2024-01-15 00:00:00"


def _status_pit(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    ).filter(F.col("us") <= F.unix_micros(F.lit(_PIT_T).cast("timestamp")))
    # argmax by (us, event_id): encode as (us - base) * 2^20 + event_id
    # — rebasing to the lake's 2024-01-01 epoch keeps the composite
    # inside int64 (raw epoch-us * 2^20 overflows); event ids are far
    # below 2^20 in this lake
    base = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    key = (F.col("us") - base) * F.lit(1 << 20) + F.col("event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", key).alias("status_at_t"),
        F.timestamp_micros(F.max("us")).alias("last_change"),
    )


_PIT_SQL = f"""
SELECT user_id,
  arg_max(event_type,
    (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) * 1048576 + event_id)
    AS status_at_t,
  make_timestamp(MAX(epoch_us(ts))) AS last_change
FROM events
WHERE epoch_us(ts) <= epoch_us(TIMESTAMP '{_PIT_T}')
GROUP BY user_id
"""

register(QuerySpec(
    "user_status_point_in_time", _status_pit, _PIT_SQL,
    "point-in-time status reconstruction at a literal T: pushed-down "
    "time filter + one composite-key argmax per user (no window, no "
    "interval materialization)",
    ("temporal", "agg", "scd"),
))


# --- events_gapfill_ffill: date-spine gap fill + forward fill (r10) ---------
# The time-series operator every dashboard layer needs and Spark has
# no verb for: a SPARSE observation series densified onto a complete
# calendar spine with last-observation-carried-forward. Sparsity is
# structural (a 1-in-199 event_id subset at HOUR grain: ~0.5% of
# events over types x days x 24 slots keeps real gaps at every scale
# factor — a dense series would make the fill vacuous). The spine is
# generated per series from its own [min, max] hour index (sequence
# + explode — generated rows, not scanned rows), the fill is one
# last(ignorenulls) running window per series, and leading gaps
# before the first observation fill with 0. Hours ride as an integer
# epoch-hour index internally; the output renders (day DATE, hour
# INT) so both engines hash identical carriers. At 100 TB the spine
# is |series| x |slots| generated rows — independent of the event
# count — and the window partitions by series, never globally.

_GF_MOD = 199


def _gapfill(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(
        F.col("event_id") % _GF_MOD == 0)
    h = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long") * 24 + F.hour("ts").cast("long")
    )
    hourly = ev.groupBy("event_type", h.alias("h")).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("long").alias("cents"))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("event_type",
                F.explode(F.sequence("lo", "hi")).alias("h"))
    )
    filled = spine.join(hourly, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "event_type",
        F.expr("date_add(DATE '1970-01-01', CAST(h div 24 AS INT))")
        .alias("day"),
        F.expr("CAST(h % 24 AS INT)").alias("hour"),
        F.col("cents").isNotNull().cast("long").alias("is_observed"),
        F.coalesce(F.last("cents", ignorenulls=True).over(w), F.lit(0))
        .cast("long").alias("cents_ffill"),
    )


_GAPFILL_SQL = f"""
WITH hourly AS (
  SELECT event_type,
    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      * 24 + CAST(hour(ts) AS BIGINT) AS h,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM events WHERE event_id % {_GF_MOD} = 0
  GROUP BY 1, 2
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS h
  FROM (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi
        FROM hourly GROUP BY 1)
),
filled AS (
  SELECT s.event_type, s.h, hh.cents
  FROM spine s
  LEFT JOIN hourly hh ON hh.event_type = s.event_type AND hh.h = s.h
)
SELECT event_type,
  DATE '1970-01-01' + CAST(h // 24 AS INT) AS day,
  CAST(h % 24 AS INT) AS hour,
  CAST(CASE WHEN cents IS NULL THEN 0 ELSE 1 END AS BIGINT)
    AS is_observed,
  CAST(COALESCE(last_value(cents IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY h
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT)
    AS cents_ffill
FROM filled
"""

register(QuerySpec(
    "events_gapfill_ffill", _gapfill, _GAPFILL_SQL,
    "date-spine gap fill + forward fill: sparse hourly series "
    "densified onto a per-series generated calendar spine, "
    "last-observation-carried-forward window, leading gaps zero — "
    "the time-series densification operator at spine cost "
    "|series| x |slots|, independent of event count",
    ("temporal", "events", "window", "timeseries"),
))


# --- events_gapfill_lerp: linear-interpolated gap fill (round-10) -----------
# The interpolating sibling of events_gapfill_ffill (same sparse
# series, same generated spine): interior gaps take the straight
# line between their bracketing observations, computed as an exact
# integer lerp — prev + (next - prev) * (h - h_prev) div (h_next -
# h_prev), integer division truncating toward ZERO on both engines
# (Spark `div` on BIGINT and DuckDB `//` both truncate — verified
# -7 // 2 = -3 in DuckDB; NOT Python's floor-toward-negative-
# infinity `//`, a porting trap for any third engine; no float ever
# enters) — while leading/trailing gaps carry the nearest
# observation. The bracketing pair comes from two running windows
# (last/prev non-null backward, first/next non-null forward), so the
# plan is two window passes per series, never a self-join.

def _gapfill_lerp(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").filter(
        F.col("event_id") % _GF_MOD == 0)
    h = (
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long") * 24 + F.hour("ts").cast("long")
    )
    hourly = ev.groupBy("event_type", h.alias("h")).agg(
        F.sum(F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"))
        .cast("long").alias("cents"))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
        .select("event_type",
                F.explode(F.sequence("lo", "hi")).alias("h"))
    )
    filled = spine.join(hourly, ["event_type", "h"], "left")
    back = (
        Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    hv = F.when(F.col("cents").isNotNull(), F.col("h"))
    prev_c = F.last("cents", ignorenulls=True).over(back)
    prev_h = F.last(hv, ignorenulls=True).over(back)
    next_c = F.first("cents", ignorenulls=True).over(fwd)
    next_h = F.first(hv, ignorenulls=True).over(fwd)
    lerp = F.when(
        prev_c.isNull(), next_c
    ).when(
        next_c.isNull(), prev_c
    ).otherwise(
        prev_c + F.expr(
            "(__nc - __pc) * (h - __ph) div (__nh - __ph)")
    )
    return (
        filled
        .withColumn("__pc", prev_c).withColumn("__ph", prev_h)
        .withColumn("__nc", next_c).withColumn("__nh", next_h)
        .select(
            "event_type",
            F.expr("date_add(DATE '1970-01-01', CAST(h div 24 AS INT))")
            .alias("day"),
            F.expr("CAST(h % 24 AS INT)").alias("hour"),
            F.col("cents").isNotNull().cast("long").alias("is_observed"),
            F.when(F.col("__pc").isNull(), F.col("__nc"))
            .when(F.col("__nc").isNull(), F.col("__pc"))
            .when(F.col("__nh") == F.col("__ph"), F.col("__pc"))
            .otherwise(F.col("__pc") + F.expr(
                "(__nc - __pc) * (h - __ph) div (__nh - __ph)"))
            .cast("long").alias("cents_lerp"),
        )
    )


_GAPFILL_LERP_SQL = f"""
WITH hourly AS (
  SELECT event_type,
    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT)
      * 24 + CAST(hour(ts) AS BIGINT) AS h,
    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      AS cents
  FROM events WHERE event_id % {_GF_MOD} = 0
  GROUP BY 1, 2
),
spine AS (
  SELECT event_type, unnest(generate_series(lo, hi)) AS h
  FROM (SELECT event_type, MIN(h) AS lo, MAX(h) AS hi
        FROM hourly GROUP BY 1)
),
filled AS (
  SELECT s.event_type, s.h, hh.cents
  FROM spine s
  LEFT JOIN hourly hh ON hh.event_type = s.event_type AND hh.h = s.h
),
br AS (
  SELECT event_type, h, cents,
    last_value(cents IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pc,
    last_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
    first_value(cents IGNORE NULLS) OVER (
      PARTITION BY event_type ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
    first_value(CASE WHEN cents IS NOT NULL THEN h END IGNORE NULLS)
      OVER (PARTITION BY event_type ORDER BY h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM filled
)
SELECT event_type,
  DATE '1970-01-01' + CAST(h // 24 AS INT) AS day,
  CAST(h % 24 AS INT) AS hour,
  CAST(CASE WHEN cents IS NULL THEN 0 ELSE 1 END AS BIGINT)
    AS is_observed,
  CAST(CASE
    WHEN pc IS NULL THEN nc
    WHEN nc IS NULL THEN pc
    WHEN nh = ph THEN pc
    ELSE pc + (nc - pc) * (h - ph) // (nh - ph)
  END AS BIGINT) AS cents_lerp
FROM br
"""

register(QuerySpec(
    "events_gapfill_lerp", _gapfill_lerp, _GAPFILL_LERP_SQL,
    "linear-interpolated gap fill: interior gaps take the exact "
    "integer lerp between bracketing observations (truncating "
    "division, no float), edges carry the nearest — two window "
    "series over the generated spine, never a self-join",
    ("temporal", "events", "window", "timeseries"),
))
