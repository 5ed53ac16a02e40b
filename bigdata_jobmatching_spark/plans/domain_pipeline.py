"""The job-matching domain pipeline, Spark-first.

Rebuilds the reference's batch chain (parse -> skills -> salary ->
dedup -> sectors -> warehouse, airflow/dags/processing_spark_dag.py:159)
as composable DataFrame stage functions with zero Python row-UDFs.
Every stage is a projection/join/window over native expressions, so
Catalyst keeps pushdown and whole-stage codegen end to end.

Stage map (reference file -> here):
- consume_jobs.py transforms   -> normalize_offers
- parse_jobs.py blob parsing   -> split_blobs + parse_html_fields
- extract_skills.py            -> extract_skills (broadcast catalog join)
- extract_salary.py            -> enrich_salary (functions.salary)
- deduplicate.py               -> dedup_offers (declared keep-best rule)
- extract_sectors.py           -> enrich_sectors (explode-join-argmax)
- load_to_bigquery.py          -> build_warehouse (deterministic ids)
- matching (declared only)     -> operators.matching
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import classify
from ..functions import ids as I
from ..functions import salary as SAL
from ..functions import similarity as S
from ..functions import skills as SK
from ..functions import text as X
from ..operators import dedup as D

# ~40-term skill catalog (keyword -> category), the shape of the
# reference's catalog (parse_jobs.py:309-339, classify_skill_category_udf
# extract_skills.py:200-242). Broadcast-joined, never a Python UDF.
SKILL_CATALOG: tuple[tuple[str, str], ...] = (
    ("python", "Programmation"), ("java", "Programmation"), ("javascript", "Programmation"),
    ("php", "Programmation"), ("sql", "Data"), ("spark", "Data"), ("hadoop", "Data"),
    ("kafka", "Data"), ("airflow", "Data"), ("excel", "Bureautique"), ("word", "Bureautique"),
    ("powerpoint", "Bureautique"), ("docker", "DevOps"), ("kubernetes", "DevOps"),
    ("linux", "DevOps"), ("git", "DevOps"), ("react", "Web"), ("angular", "Web"),
    ("django", "Web"), ("comptabilite", "Finance"), ("audit", "Finance"),
    ("marketing", "Commerce"), ("vente", "Commerce"), ("negociation", "Commerce"),
    ("communication", "Soft skills"), ("management", "Soft skills"),
    ("anglais", "Langues"), ("francais", "Langues"),
)

# Declared source priority for dedup keep-best (deduplicate.py:158-165).
SOURCE_PRIORITY: tuple[tuple[str, int], ...] = (
    ("educarriere_ci", 4), ("macarrierepro_net", 3), ("goafricaonline", 2), ("linkedin_ci", 1),
)


# --------------------------------------------------------------- ingest --

def normalize_offers(raw: DataFrame) -> DataFrame:
    """Typed, cleaned offer rows (consume_jobs.py:105-139 semantics):
    date derivations, whitespace squeeze, null defaults, salary struct
    flatten, stable record id (date-free, fixing SURVEY §2.11-6)."""
    ts = F.to_timestamp("scraped_at")
    clean = lambda c: F.trim(F.regexp_replace(c, r"\s+", " "))  # noqa: E731
    return raw.select(
        I.record_id(F.col("source"), F.col("source_url")).alias("offer_id"),
        F.col("job_id").alias("scraper_job_id"),
        ts.alias("scraped_ts"),
        F.to_date(ts).alias("scraped_date"),
        F.year(ts).alias("scraped_year"),
        F.month(ts).alias("scraped_month"),
        clean(F.col("title")).alias("title"),
        clean(F.coalesce(F.col("company"), F.lit("Entreprise confidentielle"))).alias("company"),
        classify.canonical_city(
            clean(F.coalesce(F.col("location"), F.lit("Non spécifié")))
        ).alias("location"),
        classify.is_remote(F.concat_ws(" ", "title", "description")).alias("teletravail"),
        F.col("description"),
        F.col("requirements"),
        F.col("salary.amount").alias("salary_amount"),
        F.col("salary.currency").alias("salary_currency"),
        F.col("salary.period").alias("salary_period"),
        F.col("salary.original_text").alias("salary_text"),
        F.coalesce(F.col("contract_type"), F.lit("Non spécifié")).alias("contract_type"),
        F.col("experience_level"),
        F.coalesce(F.col("skills"), F.array().cast("array<string>")).alias("declared_skills"),
        F.col("source"),
        F.col("source_url"),
    )


def normalize_cvs(raw: DataFrame) -> DataFrame:
    """Typed, cleaned candidate-CV rows — the ingest normalize stage
    for the reference's declared-but-never-written CV consumer
    (create_tables.sql:98-128 schema; PLAN_REALISATION.md:260-271
    lists consume_cvs.py as missing). Same discipline as
    :func:`normalize_offers`: date derivations from scraped_at,
    whitespace/case normalization on the skill vocabulary, loud-null
    defaults, and a stable date-free record id when the producer sent
    none (md5(source_site_url_cv)[:16], fixing SURVEY §2.11-6 on this
    path too)."""
    ts = F.to_timestamp("scraped_at")
    norm_arr = lambda c: F.array_distinct(  # noqa: E731
        F.transform(F.coalesce(c, F.array().cast("array<string>")),
                    lambda s: F.lower(F.trim(s)))
    )
    return raw.select(
        F.coalesce(
            F.col("cv_id"), I.record_id(F.col("source_site"), F.col("url_cv"))
        ).alias("cv_id"),
        ts.alias("scraped_ts"),
        F.to_date(ts).alias("scraped_date"),
        F.greatest(
            F.coalesce(F.col("annees_experience"), F.lit(0)), F.lit(0)
        ).alias("annees_experience"),
        F.coalesce(
            F.trim(F.col("niveau_etudes")), F.lit("Non spécifié")
        ).alias("niveau_etudes"),
        F.col("domaine_etudes"),
        F.col("localisation_souhaitee_id"),
        F.col("secteur_souhaite_id"),
        F.col("salaire_souhaite"),
        F.coalesce(F.col("type_contrat_souhaite"), F.lit("Non spécifié")).alias(
            "type_contrat_souhaite"
        ),
        F.coalesce(F.col("teletravail_souhaite"), F.lit(False)).alias(
            "teletravail_souhaite"
        ),
        norm_arr(F.col("competences")).alias("competences"),
        norm_arr(F.col("certifications")).alias("certifications"),
        F.size(F.coalesce(
            F.col("langues"),
            F.array().cast("array<struct<langue:string,niveau:string>>"),
        )).alias("n_langues"),
        F.col("source_site"),
        F.col("url_cv"),
        F.coalesce(F.col("statut"), F.lit("actif")).alias("statut"),
    )


# ---------------------------------------------------------- blob parsing --

BLOB_META_PATTERNS = {
    "job_id": r'"job_id"\s*:\s*"([^"]+)"',
    "source": r'"source"\s*:\s*"([^"]+)"',
    "scraped_at": r'"scraped_at"\s*:\s*"([^"]+)"',
}

# Inside an open tag, skip attribute junk without crossing the real
# tag close: quoted values may contain '>' (title="a > b"), so the
# scan consumes quoted strings whole — the bs4/browser tolerance a
# bare [^>]* lacks.
_ATTRS = "(?:[^>\"']|\"[^\"]*\"|'[^']*')*"


def _hook(cls: str, tag: str = "[a-z][a-z0-9]*") -> tuple[str, int]:
    """Class-selector pattern tolerant of real-world markup: any
    attribute order, single or double quotes, multiple classes in the
    attribute, whitespace around '=', '>' inside quoted attribute
    values; the closing tag is backref'd to whatever tag actually
    opened. Content is capture group 2."""
    return (
        rf'(?s)<({tag})\b{_ATTRS}?class\s*=\s*["\'][^"\']*'
        rf'(?<![\w-]){cls}(?![\w-])'
        rf'[^"\']*["\']{_ATTRS}>\s*(.*?)\s*</\1\s*>',
        2,
    )


def _plain(tag: str) -> tuple[str, int]:
    return (rf"(?s)<({tag})\b{_ATTRS}>\s*(.*?)\s*</\1\s*>", 2)


def _hook_nested(cls: str, tag: str = "[a-z][a-z0-9]*") -> tuple[str, int]:
    """:func:`_hook` variant tolerating ONE level of same-tag nesting
    (`<div class="job-description"> ... <div>inner</div> tail </div>`):
    the lazy `.*?</tag>` form stops at the INNER close and silently
    truncates the tail — the bs4 tolerance (parse_jobs.py builds a
    tree, so nesting is free) hardest to reproduce with regex.
    Content pieces are either non-boundary characters, a tag that
    isn't this element, or one COMPLETE nested same-tag element
    (itself nesting-free). Deeper nesting falls through to the next
    cascade step / page-text fallback via the min-length gate."""
    piece = rf"(?:[^<]+|<(?!/?\1\b)|<\1\b{_ATTRS}>(?:[^<]+|<(?!/?\1\b))*</\1\s*>)*?"
    return (
        rf'(?s)<({tag})\b{_ATTRS}?class\s*=\s*["\'][^"\']*'
        rf'(?<![\w-]){cls}(?![\w-])'
        rf'[^"\']*["\']{_ATTRS}>\s*({piece})\s*</\1\s*>',
        2,
    )


# Selector cascades mirroring the reference's BeautifulSoup lists —
# same order, same min-length validation (parse_jobs.py: title 50-58
# len>5, company 83-89 len>2, description 124-131 len>50,
# requirements 161-166 len>10, location 203-207 len>2, salary 242-246
# non-empty). Each entry: (pattern, capture_group, min_len).
HTML_FIELD_CASCADES: dict[str, tuple[tuple[str, int, int], ...]] = {
    "title": tuple(
        (p, g, 5) for p, g in (
            _hook("job-title", "h1"), _hook("title", "h1"), _hook("offer-title"),
            _plain("h1"), _plain("title"),
        )
    ),
    "company": tuple(
        (p, g, 2) for p, g in (
            _hook("company-name"), _hook("employer"), _hook("company"),
        )
    ) + (
        # textual fallback (parse_jobs.py:95-107); IGNORECASE like the
        # reference, which also makes its [A-Z] match any case
        (r"(?i)(?:chez|pour|company|entreprise)\s*:?\s*([A-Z][A-Za-z\s&\-\.]+)", 1, 2),
    ),
    "description": tuple(
        (p, g, 50) for p, g in (
            # nesting-aware first: description is the one block-level
            # field where real pages nest same-name containers
            _hook_nested("job-description"), _hook_nested("description"),
            _hook("job-description"), _hook("description"), _hook("offer-description"),
            _hook("job-content"), _hook("content"), _hook("main-content"),
        )
    ),
    "requirements": tuple(
        (p, g, 10) for p, g in (
            _hook("requirements"), _hook("qualifications"), _hook("skills"),
            _hook("competences"), _hook("profile"),
        )
    ),
    "location": tuple(
        (p, g, 2) for p, g in (
            _hook("location"), _hook("place"), _hook("city"), _hook("address"),
        )
    ),
    "salary_text": tuple(
        (p, g, 0) for p, g in (
            _hook("salary"), _hook("remuneration"), _hook("compensation"), _hook("pay"),
        )
    ) + (
        # FCFA regex fallbacks over the page text (parse_jobs.py:249-253)
        (r"(\d+(?:[\s\.,]\d+)*\s*(?:FCFA|CFA|XOF|francs?|€|\$))", 1, 0),
        (r"(?i)(?:salaire|rémunération|paye)\s*:?\s*(\d+(?:[\s\.,]\d+)*[^\n,<]*)", 1, 0),
    ),
}

# city-list fallback for location (parse_jobs.py:209-218), tried in
# list order against the lowered page, canonical capitalization kept
CI_CITIES = (
    "Abidjan", "Bouaké", "Daloa", "Yamoussoukro", "San-Pédro",
    "Korhogo", "Man", "Gagnoa", "Divo", "Soubré", "Côte d'Ivoire",
)


def split_blobs(blobs: DataFrame) -> DataFrame:
    """'{json meta}\\n\\n{html}' whole-file rows -> (metadata, html)
    plus regex-extracted meta fields (parse_jobs.py:383-399 intent,
    with the wholetext fix from SURVEY §2.11-2)."""
    parts = F.split(F.col("value"), r"\n\n", 2)
    # F.get (not getItem): a malformed blob without the separator has a
    # 1-element split, and ANSI mode makes out-of-bounds indexing throw.
    df = blobs.select(
        F.get(parts, 0).alias("metadata"),
        F.get(parts, 1).alias("html"),
    )
    for name, pat in BLOB_META_PATTERNS.items():
        df = df.withColumn(name, F.regexp_extract("metadata", pat, 1))
    return df


# bs4's get_text() decodes HTML entities; the named ones below cover
# what French job markup actually uses, plus decimal escapes for the
# same repertoire. All literal replaces — stays in codegen.
_HTML_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", " "), ("&#160;", " "),
    ("&lt;", "<"), ("&#60;", "<"), ("&gt;", ">"), ("&#62;", ">"),
    ("&quot;", '"'), ("&#34;", '"'), ("&apos;", "'"), ("&#39;", "'"),
    ("&eacute;", "é"), ("&#233;", "é"), ("&egrave;", "è"), ("&#232;", "è"),
    ("&ecirc;", "ê"), ("&#234;", "ê"), ("&agrave;", "à"), ("&#224;", "à"),
    ("&ccedil;", "ç"), ("&#231;", "ç"), ("&ocirc;", "ô"), ("&#244;", "ô"),
    ("&ucirc;", "û"), ("&#251;", "û"), ("&icirc;", "î"), ("&#238;", "î"),
    ("&euro;", "€"), ("&#8364;", "€"),
    ("&ndash;", "–"), ("&#8211;", "–"), ("&mdash;", "—"), ("&#8212;", "—"),
    ("&rsquo;", "'"), ("&#8217;", "'"), ("&laquo;", "«"), ("&raquo;", "»"),
    # ampersand LAST so freshly-decoded entities aren't re-decoded
    ("&amp;", "&"), ("&#38;", "&"),
)


def _strip_tags(c: Column) -> Column:
    """get_text(strip=True) analog: drop tags, decode entities,
    squeeze whitespace. U+FFFD replacement characters (mojibake from
    ISO-8859-1 bytes force-read as UTF-8 upstream — bs4's
    UnicodeDammit would have re-decoded the raw bytes, but a string
    column has already lost them) are removed rather than leaked into
    extracted fields."""
    txt = F.regexp_replace(c, rf"<{_ATTRS}>", "")
    for ent, ch in _HTML_ENTITIES:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    txt = F.regexp_replace(txt, "�", "")
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def _drop_comments(c: Column) -> Column:
    """Remove the page's DEAD ZONES the way html.parser/bs4 do before
    any selector can see them: comments, CDATA sections, and raw-text
    elements (<script>/<style>, whose content is character data, not
    markup — a hook inside a JS template string must never win a
    cascade). Unterminated openers kill the rest of the page, exactly
    like html.parser's tokenizer."""
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", "")
    c = F.regexp_replace(c, r"(?s)<!\[CDATA\[.*?\]\]>", "")
    c = F.regexp_replace(c, r"(?s)<!--.*$", "")
    c = F.regexp_replace(c, r"(?s)<!\[CDATA\[.*$", "")
    c = F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    return F.regexp_replace(c, r"(?is)<(script|style)\b[^>]*>.*$", " ")


def parse_html_fields(df: DataFrame) -> DataFrame:
    """Selector-cascade extraction with fallbacks + parsing quality
    score (parse_jobs.py:41-260 semantics, native regexp_extract).

    Each field tries its cascade in the reference's selector order:
    the first candidate whose TAG-STRIPPED text passes the min-length
    validation wins (coalesce over null-if-invalid steps — one
    projection, no Python). Hardened against real markup: attribute
    reorder, single quotes, multi-class attributes, nested inline
    tags, and whitespace all extract correctly (see the adversarial
    fixtures in tests). Comments/CDATA are dropped up front so a
    commented-out hook never wins a cascade and comment text never
    leaks into fields."""
    out = df.withColumn("__html", _drop_comments(F.col("html")))
    for name, steps in HTML_FIELD_CASCADES.items():
        candidates = []
        for pat, grp, mn in steps:
            txt = _strip_tags(F.regexp_extract("__html", pat, grp))
            cond = (F.length(txt) > mn) if mn else (txt != "")
            candidates.append(F.when(cond, txt))
        out = out.withColumn(name, F.coalesce(*candidates))
    # location city-list fallback + country default (parse_jobs.py:209-221)
    low = F.lower(F.col("__html"))
    city_fb = F.coalesce(
        *[F.when(low.contains(c.lower()), F.lit(c)) for c in CI_CITIES]
    )
    out = out.withColumn("location", F.coalesce(F.col("location"), city_fb, F.lit("Côte d'Ivoire")))
    # description final fallback: page text minus chrome, >100 chars,
    # first 2000 (parse_jobs.py:138-145)
    page_txt = _strip_tags(
        F.regexp_replace(
            F.col("__html"),
            r"(?s)<(script|style|nav|header|footer|aside)\b.*?</\1\s*>",
            " ",
        )
    )
    out = out.withColumn(
        "description",
        F.coalesce(
            F.col("description"),
            F.when(F.length(page_txt) > 100, F.substring(page_txt, 1, 2000)),
        ),
    )
    # requirements bullet-list fallback from the description text
    # (parse_jobs.py:180-186: first 10 items, space-joined)
    bullets = F.array_join(
        F.slice(
            F.regexp_extract_all(F.col("description"), F.lit(r"[•\-\*]\s*([^\n•\-\*]+)"), F.lit(1)),
            1, 10,
        ),
        " ",
    )
    out = out.withColumn(
        "requirements",
        F.coalesce(F.col("requirements"), F.when(bullets != "", bullets)),
    )
    quality = (
        F.when(F.col("title").isNotNull(), 1.0).otherwise(0.0)
        + F.when(F.col("company").isNotNull(), 1.0).otherwise(0.0)
        + F.when(F.col("description").isNotNull(), 1.0).otherwise(0.0)
        + F.when(F.col("location").isNotNull(), 1.0).otherwise(0.0)
    ) / F.lit(4.0)
    return out.withColumn("parsing_quality_score", quality).drop("__html")


# ------------------------------------------------------------ enrichment --

def extract_skills(spark: SparkSession, offers: DataFrame) -> DataFrame:
    """Skills from free text via broadcast catalog join, unioned with
    scraper-declared skills (array_union+array_distinct, U2 —
    extract_skills.py:300-306) and the NLP-ish three-pass extractor
    (extract_skills.py:61-197 rebuild in functions/skills.py), plus
    per-skill (category, confidence) metadata structs
    (extract_skills.py:310-326).

    Deviation from the reference: its NLP source string is built with
    ``col + " " + col`` — numeric addition on strings, which yields
    NULL on Spark 3 non-ANSI, silently disabling the feature; we use
    concat_ws so the extractor actually sees text."""
    catalog = spark.createDataFrame(list(SKILL_CATALOG), "skill string, skill_category string")
    text = F.concat_ws(" ", "title", "description", "requirements")
    toks = offers.select(
        "offer_id",
        F.explode(F.array_distinct(X.tokens(text))).alias("skill"),
    )
    found = (
        toks.join(F.broadcast(catalog), "skill")
        .groupBy("offer_id")
        .agg(F.array_sort(F.collect_set("skill")).alias("text_skills"))
    )
    nlp_src = F.concat_ws(" ", "description", "requirements")
    return (
        offers.join(found, "offer_id", "left")
        .withColumn("nlp_skills", SK.extract_skills_nlp(nlp_src))
        .withColumn(
            "skills",
            F.array_sort(F.array_distinct(F.array_union(
                F.array_union(
                    F.coalesce(F.col("text_skills"), F.array().cast("array<string>")),
                    F.col("nlp_skills"),
                ),
                F.transform(F.col("declared_skills"), lambda s: F.lower(F.trim(s))),
            ))),
        )
        .withColumn(
            "skills_with_metadata",
            F.transform(
                F.col("skills"),
                lambda s: F.struct(
                    s.alias("skill"),
                    SK.classify_skill_category(s).alias("category"),
                    SK.skill_confidence(s, nlp_src).alias("confidence"),
                ),
            ),
        )
        .drop("text_skills")
    )


def enrich_salary(offers: DataFrame) -> DataFrame:
    """Salary struct from explicit salary text, else from description,
    else inferred from title/location/contract context
    (extract_salary.py priority: structured > text > inferred;
    inference grid at extract_salary.py:180-250, confidence 0.3)."""
    src = F.coalesce(F.col("salary_text"), F.col("description"))
    explicit = F.col("salary_amount").cast("double")
    return (
        offers.withColumn("parsed_salary", SAL.parse_salary(src))
        .withColumn(
            "inferred_salary",
            SAL.infer_salary_range(
                F.col("title"), F.col("location"), F.col("contract_type")
            ),
        )
        .withColumn(
            "salaire_min",
            F.coalesce(explicit, F.col("parsed_salary.min_fcfa"), F.col("inferred_salary.min_fcfa")),
        )
        .withColumn(
            "salaire_max",
            F.coalesce(explicit, F.col("parsed_salary.max_fcfa"), F.col("inferred_salary.max_fcfa")),
        )
        .withColumn(
            "salary_confidence",
            F.when(
                explicit.isNotNull() | F.col("parsed_salary.min_fcfa").isNotNull(),
                F.col("parsed_salary.confidence"),
            ).otherwise(F.col("inferred_salary.confidence")),
        )
        .withColumn(
            "salary_source",
            F.when(explicit.isNotNull(), F.lit("structured"))
            .when(F.col("parsed_salary.min_fcfa").isNotNull(), F.lit("parsed"))
            .otherwise(F.col("inferred_salary.source")),
        )
        .drop("parsed_salary", "inferred_salary")
    )


def enrich_sectors(spark: SparkSession, offers: DataFrame) -> DataFrame:
    """Sector via the full scoring formula (classify_sector_udf
    rebuild, extract_sectors.py:304-345): keyword hits x0.3 capped
    0.8, +0.5 company-name hit, +0.2 per title keyword hit — one
    zero-shuffle projection over the compile-time catalog."""
    best = classify.classify_sector(
        F.concat_ws(" ", "title", "description", "company"), F.col("title")
    )
    return (
        offers.withColumn("__sector", best)
        .withColumn("secteur_id", F.col("__sector.secteur_id"))
        .withColumn("sector_confidence", F.col("__sector.confidence"))
        .drop("__sector")
    )


# ----------------------------------------------------------------- dedup --

def completeness_score(df: DataFrame) -> Column:
    """6-field completeness in [0,1] (deduplicate.py:127-139)."""
    fields = ["title", "company", "location", "description", "salaire_min", "contract_type"]
    score = sum(
        (F.when(F.col(f).isNotNull() & (F.col(f).cast("string") != ""), 1.0).otherwise(0.0) for f in fields),
        start=F.lit(0.0),
    )
    return score / F.lit(len(fields))


def dedup_offers(offers: DataFrame, threshold: float = 0.7) -> DataFrame:
    """Cross-source near-dup removal per the DECLARED rule
    (deduplicate.py:142-167), not the reference's drop-both bug:
    blocking key -> in-block pairwise weighted similarity
    (0.5 Jaccard(title) + 0.3 eq(company) + 0.2 eq(location), >= 0.7)
    -> min-id groups -> keep best (completeness, recency, source
    priority)."""
    prio = F.lit(0)
    for src, p in SOURCE_PRIORITY:
        prio = F.when(F.col("source") == src, p).otherwise(prio)
    enriched = (
        offers.withColumn("__blk", D.blocking_key(F.col("title"), F.col("company"), F.col("location")))
        .withColumn("__title_toks", X.content_tokens(F.col("title")))
        .withColumn("__company_n", X.normalize_text(F.col("company")))
        .withColumn("__location_n", X.normalize_text(F.col("location")))
        .withColumn("__completeness", completeness_score(offers))
        .withColumn("__prio", prio)
    )
    cand = D.pairwise_candidates(
        enriched.select("__blk", "offer_id", "__title_toks", "__company_n", "__location_n"),
        "__blk", "offer_id", ["__title_toks", "__company_n", "__location_n"],
    )
    dup_pairs = cand.withColumn(
        "sim",
        S.weighted_record_similarity(
            F.col("__title_toks_a"), F.col("__title_toks_b"),
            F.col("__company_n_a"), F.col("__company_n_b"),
            F.col("__location_n_a"), F.col("__location_n_b"),
        ),
    ).filter(F.col("sim") >= threshold)
    kept = D.keep_best(
        enriched, dup_pairs, "offer_id",
        [F.desc("__completeness"), F.desc("scraped_ts"), F.desc("__prio"), F.asc("offer_id")],
    )
    return kept.drop("__blk", "__title_toks", "__company_n", "__location_n", "__completeness", "__prio")


# ------------------------------------------------------------- warehouse --

def build_warehouse(spark: SparkSession, offers: DataFrame) -> dict[str, DataFrame]:
    """Star schema with join-free deterministic surrogate ids
    (load_to_bigquery.py:40-78,159-249): fact_offres + 3 dims,
    registered as temp views for spark.sql analytics."""
    fact = offers.select(
        F.col("offer_id").alias("offre_id"),
        F.col("title").alias("titre_poste"),
        I.entreprise_id(F.col("company")).alias("entreprise_id"),
        I.localisation_id(F.col("location")).alias("localisation_id"),
        F.col("secteur_id"),
        F.col("contract_type").alias("type_contrat"),
        F.col("experience_level").alias("niveau_experience"),
        "salaire_min", "salaire_max", "skills",
        F.transform(F.col("skills"), I.competence_id).alias("competences_ids"),
        F.col("source").alias("source_site"),
        F.col("scraped_date").alias("date_publication"),
        F.col("scraped_ts").alias("scraped_at"),
    )
    dim_entreprise = (
        offers.select(
            I.entreprise_id(F.col("company")).alias("entreprise_id"),
            F.col("company").alias("nom_entreprise"),
        ).dropDuplicates(["entreprise_id"])
    )
    dim_localisation = (
        offers.select(
            I.localisation_id(F.col("location")).alias("localisation_id"),
            F.col("location").alias("ville"),
        ).dropDuplicates(["localisation_id"])
    )
    # Deduplicate on competence_id, not the raw name: the id truncates
    # the cleaned name to 15 chars, so two distinct names sharing a
    # prefix must collapse to ONE dim row (star-join key uniqueness).
    # groupBy+min keeps the representative name deterministic.
    dim_competence = (
        offers.select(F.explode("skills").alias("nom_competence"))
        .select(
            I.competence_id(F.col("nom_competence")).alias("competence_id"),
            "nom_competence",
        )
        .groupBy("competence_id")
        .agg(F.min("nom_competence").alias("nom_competence"))
    )
    out = {
        "fact_offres": fact,
        "dim_entreprise": dim_entreprise,
        "dim_localisation": dim_localisation,
        "dim_competence": dim_competence,
    }
    for name, df in out.items():
        df.createOrReplaceTempView(name)
    return out


def write_warehouse(tables: dict[str, DataFrame], out_dir: str) -> None:
    """Persist the star schema as the parquet warehouse (the engine's
    stand-in for the BigQuery sink, SURVEY S8): fact partitioned by
    publication date — the BigQuery DDL's PARTITION BY
    (create_tables.sql:91-92) — and CLUSTER BY emulated with
    sortWithinPartitions on the cluster keys; dims unpartitioned."""
    from ..sources.io import write_stage

    for name, df in tables.items():
        if name == "fact_offres":
            (
                df.sortWithinPartitions("entreprise_id", "localisation_id", "secteur_id")
                .write.mode("overwrite")
                .partitionBy("date_publication")
                .parquet(f"{out_dir}/{name}")
            )
        else:
            write_stage(df, f"{out_dir}/{name}")


# ---------------------------------------------------------- full pipeline --

def run_pipeline(spark: SparkSession, raw_offers: DataFrame) -> dict[str, DataFrame]:
    """parse -> skills -> salary -> dedup -> sectors -> warehouse, the
    reference's chain order (processing_spark_dag.py:159)."""
    normalized = normalize_offers(raw_offers)
    with_skills = extract_skills(spark, normalized)
    with_salary = enrich_salary(with_skills)
    deduped = dedup_offers(with_salary)
    with_sectors = enrich_sectors(spark, deduped)
    wh = build_warehouse(spark, with_sectors)
    return {"offers_enriched": with_sectors, **wh}
