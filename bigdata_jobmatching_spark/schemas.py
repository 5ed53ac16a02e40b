"""Canonical StructTypes for the job-matching domain.

One explicit schema per logical table (SURVEY §1.3: fixed schema via
``from_json`` on ingest — consume_jobs.py:39-75; warehouse DDL —
bigquery/schemas/create_tables.sql). Parquet carries schema between
stages; nothing is inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

SALARY_STRUCT = T.StructType([
    T.StructField("amount", T.LongType()),
    T.StructField("currency", T.StringType()),
    T.StructField("period", T.StringType()),
    T.StructField("original_text", T.StringType()),
])

# Kafka topic `job-offers-raw` message schema (consume_jobs.py:39-75).
JOB_RAW_SCHEMA = T.StructType([
    T.StructField("job_id", T.StringType(), False),
    T.StructField("scraped_at", T.StringType()),
    T.StructField("scraper_version", T.StringType()),
    T.StructField("country", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("company", T.StringType()),
    T.StructField("location", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("requirements", T.StringType()),
    T.StructField("salary", SALARY_STRUCT),
    T.StructField("contract_type", T.StringType()),
    T.StructField("experience_level", T.StringType()),
    T.StructField("industry", T.StringType()),
    T.StructField("skills", T.ArrayType(T.StringType())),
    T.StructField("source", T.StringType()),
    T.StructField("source_url", T.StringType()),
    T.StructField("html_content", T.StringType()),
])

# Candidate CV (declared surface: create_tables.sql:98-128; the
# reference never implemented the consumer — SURVEY intro).
CV_SCHEMA = T.StructType([
    T.StructField("cv_id", T.StringType(), False),
    T.StructField("annees_experience", T.IntegerType()),
    T.StructField("niveau_etudes", T.StringType()),
    T.StructField("domaine_etudes", T.StringType()),
    T.StructField("localisation_souhaitee_id", T.StringType()),
    T.StructField("secteur_souhaite_id", T.StringType()),
    T.StructField("salaire_souhaite", T.DoubleType()),
    T.StructField("type_contrat_souhaite", T.StringType()),
    T.StructField("teletravail_souhaite", T.BooleanType()),
    T.StructField("competences", T.ArrayType(T.StringType())),
    T.StructField("certifications", T.ArrayType(T.StringType())),
    T.StructField("langues", T.ArrayType(T.StructType([
        T.StructField("langue", T.StringType()),
        T.StructField("niveau", T.StringType()),
    ]))),
    T.StructField("source_site", T.StringType()),
    T.StructField("url_cv", T.StringType()),
    T.StructField("scraped_at", T.TimestampType()),
    T.StructField("disponibilite", T.StringType()),
    T.StructField("statut", T.StringType()),
])

# agg_matching_scores output (NEXT_STEPS.md:183-192).
MATCHING_SCHEMA = T.StructType([
    T.StructField("job_id", T.StringType(), False),
    T.StructField("candidate_id", T.StringType(), False),
    T.StructField("match_score", T.DoubleType()),
    T.StructField("skill_match_pct", T.DoubleType()),
    T.StructField("salary_match_pct", T.DoubleType()),
    T.StructField("location_match_pct", T.DoubleType()),
    T.StructField("experience_match_pct", T.DoubleType()),
])
