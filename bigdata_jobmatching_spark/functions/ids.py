"""Deterministic surrogate-id expressions.

The reference links facts to dimensions without a join by computing
the same deterministic id on both sides (``load_to_bigquery.py:40-78``:
ENT_/LOC_/COMP_ prefixes over cleaned, uppercased, truncated names;
SURVEY §2.3 J4). Kept here as native expressions — join-free star
linkage scales trivially because it is embarrassingly parallel.

Also the stable record id: the reference's job_id embeds the scrape
date (``base_scraper.py:277-281``), so re-scrapes get new ids (SURVEY
§2.11-6); our canonical id drops the date component.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _clean_upper(c: Column, n: int) -> Column:
    return F.substring(F.regexp_replace(F.upper(F.trim(c)), r"[^A-Z0-9]", ""), 1, n)


def entreprise_id(name: Column) -> Column:
    """ENT_<CLEAN10> (load_to_bigquery.py:40-52 semantics)."""
    return F.when(
        name.isNull() | (F.trim(name) == ""), F.lit("ENT_INCONNU")
    ).otherwise(F.concat(F.lit("ENT_"), _clean_upper(name, 10)))


def localisation_id(city: Column) -> Column:
    """LOC_<CLEAN10> (load_to_bigquery.py:54-64 semantics)."""
    return F.when(
        city.isNull() | (F.trim(city) == ""), F.lit("LOC_INCONNU")
    ).otherwise(F.concat(F.lit("LOC_"), _clean_upper(city, 10)))


def competence_id(skill: Column) -> Column:
    """COMP_<CLEAN15> (load_to_bigquery.py:66-78 semantics)."""
    return F.when(
        skill.isNull() | (F.trim(skill) == ""), F.lit("COMP_INCONNU")
    ).otherwise(F.concat(F.lit("COMP_"), _clean_upper(skill, 15)))


def record_id(source: Column, source_key: Column) -> Column:
    """Stable 16-hex record id: md5('<source>_<key>')[:16].

    Same shape as base_scraper.py:277-281 but date-free so the same
    posting re-scraped later maps to the same id. NULL when either
    component is null — concat_ws silently skips nulls, which would
    give every malformed record the identical md5('') id and make
    downstream id-dedup collapse them into one survivor.
    """
    return F.when(
        source.isNotNull() & source_key.isNotNull(),
        F.substring(F.md5(F.concat_ws("_", source, source_key)), 1, 16),
    )
