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
