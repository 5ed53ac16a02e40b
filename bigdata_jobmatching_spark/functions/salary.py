"""Salary text parsing as a native expression chain.

Rebuilds ``parse_salary_comprehensive_udf`` (extract_salary.py:43-177)
— regex families with priority, range detection, currency conversion
(EUR ×655, USD ×600 → FCFA, extract_salary.py:127-142), yearly→monthly
(/12) — as `regexp_extract` + `when` chains so Catalyst can fold,
push, and codegen it. The whole parse is a single projection: zero
shuffles, scales linearly with input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .binding import let

EUR_TO_FCFA = 655.0
USD_TO_FCFA = 600.0

_NUM = r"(\d{1,3}(?:[ .,]\d{3})+|\d+)"
# Ordered regex families: ranges first (higher priority), then singles.
_RANGE_PAT = _NUM + r"\s*(?:-|à|a|et)\s*" + _NUM
_SINGLE_PAT = _NUM


def _to_number(s: Column) -> Column:
    """'1 200 000' / '1.200.000' / '1,200,000' -> 1200000 (double)."""
    return F.when(s == "", None).otherwise(
        F.regexp_replace(s, r"[ .,]", "").cast("double")
    )


def detect_currency(text: Column) -> Column:
    low = F.lower(F.coalesce(text, F.lit("")))
    return (
        F.when(low.rlike(r"(€|euro|eur\b)"), F.lit("EUR"))
        .when(low.rlike(r"(\$|usd|dollar)"), F.lit("USD"))
        .when(low.rlike(r"(fcfa|f cfa|xof|francs?)"), F.lit("FCFA"))
        .otherwise(F.lit("FCFA"))
    )


def detect_period(text: Column) -> Column:
    """month/year/day/hour detection (base_scraper.py:159-196 rules)."""
    low = F.lower(F.coalesce(text, F.lit("")))
    return (
        F.when(low.rlike(r"(/\s*an|annuel|par an|year|/yr)"), F.lit("year"))
        .when(low.rlike(r"(/\s*jour|journalier|par jour|/day)"), F.lit("day"))
        .when(low.rlike(r"(/\s*h|horaire|par heure|/hour|/hr)"), F.lit("hour"))
        .otherwise(F.lit("month"))
    )


def _to_fcfa(amount: Column, currency: Column) -> Column:
    return (
        F.when(currency == "EUR", amount * EUR_TO_FCFA)
        .when(currency == "USD", amount * USD_TO_FCFA)
        .otherwise(amount)
    )


def _to_monthly(amount: Column, period: Column) -> Column:
    """Normalize to FCFA/month: yearly/12 (extract_salary.py:144-152),
    daily ×22 workdays, hourly ×8×22."""
    return (
        F.when(period == "year", amount / 12.0)
        .when(period == "day", amount * 22.0)
        .when(period == "hour", amount * 8.0 * 22.0)
        .otherwise(amount)
    )


def parse_salary(text: Column) -> Column:
    """Parse salary text to a struct(min_fcfa, max_fcfa, avg_fcfa,
    currency, period, confidence) — all FCFA/month doubles.

    Priority: explicit range > single amount > nothing. Confidence
    mirrors the reference's tiering (range with currency 0.9, single
    with currency 0.7, bare number 0.4 — extract_salary.py:154-170).
    """
    t = F.coalesce(text, F.lit(""))
    # Bind all regex extractions once per row (a let-struct): the six
    # output fields would otherwise each re-run the regex families
    # after projection collapse.
    bound = F.struct(
        detect_currency(t).alias("cur"),
        detect_period(t).alias("per"),
        F.lower(t).rlike(r"(fcfa|f cfa|xof|€|euro|eur\b|\$|usd|francs?)").alias("hasc"),
        _to_number(F.regexp_extract(t, _RANGE_PAT, 1)).alias("lo_raw"),
        _to_number(F.regexp_extract(t, _RANGE_PAT, 2)).alias("hi_raw"),
        _to_number(F.regexp_extract(t, _SINGLE_PAT, 1)).alias("single_raw"),
    )

    def body(s: Column) -> Column:
        cur, per = s["cur"], s["per"]
        lo = _to_monthly(_to_fcfa(s["lo_raw"], cur), per)
        hi = _to_monthly(_to_fcfa(s["hi_raw"], cur), per)
        single = _to_monthly(_to_fcfa(s["single_raw"], cur), per)

        is_range = lo.isNotNull() & hi.isNotNull()
        has_single = single.isNotNull()

        min_f = F.when(is_range, F.least(lo, hi)).when(has_single, single)
        max_f = F.when(is_range, F.greatest(lo, hi)).when(has_single, single)
        avg_f = F.when(min_f.isNotNull(), (min_f + max_f) / 2.0)
        conf = (
            F.when(is_range & s["hasc"], 0.9)
            .when(is_range, 0.6)
            .when(has_single & s["hasc"], 0.7)
            .when(has_single, 0.4)
            .otherwise(0.0)
        )
        return F.struct(
            min_f.alias("min_fcfa"),
            max_f.alias("max_fcfa"),
            avg_f.alias("avg_fcfa"),
            F.when(min_f.isNotNull(), cur).alias("currency"),
            F.when(min_f.isNotNull(), per).alias("period"),
            conf.alias("confidence"),
        )

    return let(bound, body)
