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


# 8-sector condensed Ivorian catalog (extract_sectors.py:71-302):
# (secteur_id, keywords, companies). Scoring follows the reference's
# full formula (extract_sectors.py:312-343): substring containment in
# the full text, min(keyword_hits x 0.3, 0.8) + 0.5 if any known
# company appears + 0.2 PER keyword appearing in the title, stored
# capped at 1.0; argmax keeps the FIRST catalog sector on ties
# (strictly-greater comparison in catalog order).
SECTOR_CATALOG: tuple[tuple[str, tuple[str, ...], tuple[str, ...]], ...] = (
    ("SECT_TIC", ("developpeur", "informatique", "logiciel", "data", "reseau"),
     ("orange", "mtn", "moov", "africa systems")),
    ("SECT_FINANCE", ("banque", "finance", "comptable", "audit", "assurance"),
     ("ecobank", "sgbci", "nsia", "bceao")),
    ("SECT_COMMERCE", ("vente", "commercial", "marketing", "boutique"),
     ("carrefour", "jumia", "kilimall", "yango market")),
    ("SECT_BTP", ("chantier", "construction", "genie civil", "architecte"),
     ("bouygues", "vinci", "eiffage", "cimaf")),
    ("SECT_SANTE", ("medecin", "infirmier", "pharmacie", "clinique"),
     ("sanofi", "pfizer", "novartis", "roche")),
    ("SECT_EDUCATION", ("professeur", "enseignant", "formation", "ecole"),
     ("universite", "inphb", "institut", "lycee")),
    ("SECT_AGRO", ("agricole", "cacao", "plantation", "agroalimentaire"),
     ("sifca", "palmci", "olam", "cargill")),
    ("SECT_TRANSPORT", ("chauffeur", "logistique", "transport", "livraison"),
     ("maersk", "dhl", "bollore", "fedex")),
)


def classify_sector(text: Column, title: Column) -> Column:
    """Full-formula sector classification as ONE native projection:
    struct(secteur_id, confidence).

    Rebuilds classify_sector_udf (extract_sectors.py:304-345) exactly,
    including its subtleties: substring containment (so multi-word
    keywords like 'genie civil' match), the company bonus fires at
    most once (+0.5), the title bonus fires PER keyword (+0.2 each),
    the stored confidence is capped at 1.0 but the comparison uses the
    raw score, and ties keep the earlier catalog sector.

    Scale: zero shuffles — ~100 codegen'd substring searches per row
    over a compile-time catalog beats an explode + join + window argmax
    (two shuffles) at any data size for a fixed-size catalog.
    """
    from .binding import let

    def raw_score(low: Column, tlow: Column, kws: tuple[str, ...], cos: tuple[str, ...]) -> Column:
        kw_hits = sum((low.contains(k).cast("int") for k in kws), start=F.lit(0))
        kw_conf = F.when(kw_hits > 0, F.least(kw_hits * 0.3, F.lit(0.8))).otherwise(F.lit(0.0))
        company_hit: Column | None = None
        for c in cos:
            h = low.contains(c)
            company_hit = h if company_hit is None else (company_hit | h)
        t_hits = sum((tlow.contains(k).cast("int") for k in kws), start=F.lit(0))
        return kw_conf + F.when(company_hit, F.lit(0.5)).otherwise(F.lit(0.0)) + t_hits * 0.2

    # The argmax is a FOLD over the catalog. Naively chaining
    # when(raw > best, ...).otherwise(best) embeds two copies of the
    # previous state per step — a ~3^n expression tree that stalls
    # Catalyst. Binding each step's (id, conf, raw) in a let-struct
    # keeps the tree linear: every state reference is a lambda
    # attribute, evaluated once.
    def fold(low: Column, tlow: Column, state_id: Column, state_conf: Column, i: int) -> Column:
        if i == len(SECTOR_CATALOG):
            return F.struct(state_id.alias("secteur_id"), state_conf.alias("confidence"))
        sid, kws, cos = SECTOR_CATALOG[i]
        step = F.struct(
            state_id.alias("id"),
            state_conf.alias("conf"),
            raw_score(low, tlow, kws, cos).alias("raw"),
            low.alias("low"),
            tlow.alias("tlow"),
        )

        def body(s: Column) -> Column:
            # the reference compares the RAW score against the stored
            # (capped) best, then stores min(raw, 1.0)
            better = s["raw"] > s["conf"]
            return fold(
                s["low"], s["tlow"],
                F.when(better, F.lit(sid)).otherwise(s["id"]),
                F.when(better, F.least(s["raw"], F.lit(1.0))).otherwise(s["conf"]),
                i + 1,
            )

        return let(step, body)

    ctx = F.struct(
        F.lower(F.coalesce(text, F.lit(""))).alias("low"),
        F.lower(F.coalesce(title, F.lit(""))).alias("tlow"),
    )
    return let(
        ctx,
        lambda c: fold(c["low"], c["tlow"], F.lit("SECT_INCONNU"), F.lit(0.0), 0),
    )


def sector_scores(catalog_df: DataFrame, docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Explode-join-score-argmax classification for DATA-DRIVEN
    catalogs (when the catalog is a table, not a compile-time constant
    — the scalable path for catalogs too large to inline).

    catalog_df: (secteur_id, keyword); keywords may be one- or
    two-word (two-word entries join against token bigrams — 'genie
    civil' matches; 3+-word entries are not supported). Returns (id,
    secteur_id, confidence) keeping the best sector per row; rows with
    no keyword hit are absent (caller coalesces to SECT_INCONNU).

    Scale: the catalog broadcasts; the doc side never shuffles until
    the per-id argmax (one shuffle on id).
    """
    from pyspark.sql import Window

    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    terms = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.concat(toks, bigrams))).alias("keyword"),
    )
    hits = terms.join(F.broadcast(catalog_df), "keyword")
    scored = hits.groupBy(id_col, "secteur_id").agg(
        F.least(F.count(F.lit(1)) * 0.3, F.lit(0.8)).alias("confidence")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("confidence"), F.asc("secteur_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
