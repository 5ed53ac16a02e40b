"""Keyword-classification Column expressions.

Native CASE-WHEN rebuilds of the reference's classifier UDFs:
contract type (extract_contract_type_udf, parse_jobs.py:273-299),
experience level (infer_experience_level, load_to_bigquery.py:108-120),
and the sector catalog scorer (classify_sector_udf,
extract_sectors.py:48-345) as an explode-join-argmax over a broadcast
catalog.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered keyword -> class rules; first hit wins (matches the
# reference's sequential keyword checks, parse_jobs.py:283-297).
CONTRACT_RULES: tuple[tuple[str, str], ...] = (
    ("cdi", "CDI"),
    ("cdd", "CDD"),
    ("stage", "Stage"),
    ("stagiaire", "Stage"),
    ("alternance", "Alternance"),
    ("freelance", "Freelance"),
    ("mission", "Mission"),
)

EXPERIENCE_RULES: tuple[tuple[str, str], ...] = (
    ("senior", "Senior"),
    ("confirm", "Senior"),
    ("experimente", "Senior"),
    ("junior", "Débutant"),
    ("debutant", "Débutant"),
    ("stagiaire", "Débutant"),
)


def _keyword_case(text: Column, rules: tuple[tuple[str, str], ...], default: str) -> Column:
    low = F.lower(F.coalesce(text, F.lit("")))
    out = F.lit(default)
    for kw, cls in reversed(rules):
        out = F.when(low.contains(kw), F.lit(cls)).otherwise(out)
    return out


def contract_type(text: Column) -> Column:
    """First-matching contract keyword -> class, else 'Autre'."""
    return _keyword_case(text, CONTRACT_RULES, "Autre")


def experience_level(text: Column) -> Column:
    """Keyword -> Débutant/Intermédiaire/Senior, default Intermédiaire
    (the reference's default band, load_to_bigquery.py:119)."""
    return _keyword_case(text, EXPERIENCE_RULES, "Intermédiaire")


# City canonicalization map (base_scraper.py:132-157): scraped location
# variants -> canonical CI city names. Native CASE chain over the
# normalized string — a broadcast-map join at catalog scale.
CITY_CANONICAL: tuple[tuple[str, str], ...] = (
    ("abidjan", "Abidjan"), ("abj", "Abidjan"), ("cocody", "Abidjan"),
    ("plateau", "Abidjan"), ("yopougon", "Abidjan"), ("marcory", "Abidjan"),
    ("bouake", "Bouaké"), ("yamoussoukro", "Yamoussoukro"), ("yakro", "Yamoussoukro"),
    ("san pedro", "San-Pédro"), ("daloa", "Daloa"), ("korhogo", "Korhogo"),
    ("man", "Man"), ("gagnoa", "Gagnoa"), ("abengourou", "Abengourou"),
)


def canonical_city(location: Column) -> Column:
    """Map location text to its canonical city; pass through trimmed
    original when no variant matches (base_scraper.py:132-157)."""
    norm = F.lower(F.trim(F.regexp_replace(F.coalesce(location, F.lit("")), r"[-_]", " ")))
    out = F.trim(location)
    for variant, canon in reversed(CITY_CANONICAL):
        out = F.when(norm.contains(variant), F.lit(canon)).otherwise(out)
    return out


def is_remote(text: Column) -> Column:
    """Remote-work detection (emploi_ci_scraper.py:221-228 keywords)."""
    low = F.lower(F.coalesce(text, F.lit("")))
    return low.rlike(r"(télétravail|teletravail|remote|à distance|a distance|home\s*office|hybride)")


# 13-sector Ivorian catalog shape (extract_sectors.py:71-302): keyword
# hits x0.3 capped 0.8, company-name hit +0.5, title hit +0.2, argmax.
SECTOR_CATALOG: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("SECT_TIC", ("developpeur", "informatique", "logiciel", "data", "reseau")),
    ("SECT_FINANCE", ("banque", "finance", "comptable", "audit", "assurance")),
    ("SECT_COMMERCE", ("vente", "commercial", "marketing", "boutique")),
    ("SECT_BTP", ("chantier", "construction", "genie civil", "architecte")),
    ("SECT_SANTE", ("medecin", "infirmier", "pharmacie", "clinique")),
    ("SECT_EDUCATION", ("professeur", "enseignant", "formation", "ecole")),
    ("SECT_AGRO", ("agricole", "cacao", "plantation", "agroalimentaire")),
    ("SECT_TRANSPORT", ("chauffeur", "logistique", "transport", "livraison")),
)


def sector_scores(catalog_df: DataFrame, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode-join-score-argmax sector classification.

    catalog_df: (secteur_id, keyword). Returns (id, secteur_id,
    confidence) keeping the best sector per row; rows with no keyword
    hit are absent (caller coalesces to SECT_INCONNU).

    Scale: the catalog broadcasts; the doc side never shuffles until
    the per-id argmax (one shuffle on id).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))).alias("keyword")
    )
    hits = toks.join(F.broadcast(catalog_df), "keyword")
    scored = hits.groupBy(id_col, "secteur_id").agg(
        F.least(F.count(F.lit(1)) * 0.3, F.lit(0.8)).alias("confidence")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("confidence"), F.asc("secteur_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
