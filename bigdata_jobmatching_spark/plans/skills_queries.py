"""NLP-ish skill extraction / categorization / confidence as gate
queries.

Spark runs the real native-expression rebuilds from
``functions/skills.py`` (extract_skills.py:61-263 semantics); the
DuckDB oracles are GENERATED from the same compile-time catalogs, so
both engines score from one constant — any drift in the expression
logic (not the data) fails the hash.

Array outputs are emitted as comma-joined strings: the gate
canonicalizer cannot hash raw list cells (round-1 lesson from
customer_order_history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import skills as SK
from ..functions.binding import let
from ..sources.io import fan_out, load_table
from .catalog import QuerySpec, register

# ---------------------------------------------------------------- helpers --

_CLEAN_SQL = (
    "trim(regexp_replace(regexp_replace(lower(coalesce({src}, '')), "
    "'[^\\w\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
)


def _contains_any(col: str, needles: tuple[str, ...]) -> str:
    return " OR ".join(f"contains({col}, '{n}')" for n in needles)


# --- skills_nlp_extraction: three-pass extractor over documents -----------

def _nlp_extract(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    return docs.select(
        "doc_id",
        let(
            SK.extract_skills_nlp(F.col("text")),
            lambda arr: F.struct(
                F.array_join(arr, ",").alias("skills_csv"),
                F.size(arr).cast("long").alias("n_skills"),
            ),
        ).alias("s"),
    ).select("doc_id", "s.skills_csv", "s.n_skills")


def _build_nlp_oracle() -> str:
    cat_cells = ",\n      ".join(
        f"CASE WHEN {_contains_any('clean', variants)} "
        f"THEN '{category.replace('_', ' ')}' END"
        for category, variants in SK.SKILLS_CATALOG
    )
    re_cells = ",\n      ".join(
        f"CASE WHEN regexp_extract(clean, '{pat}', 1) <> '' "
        f"THEN replace(regexp_extract(clean, '{pat}', 1), '.', '') END"
        for pat in SK.ADDITIONAL_PATTERNS
    )
    stop = ", ".join(f"'{w}'" for w in SK.FUNCTION_WORDS + SK.GENERIC_TERMS)
    nounish = (
        "length({w}) > 2 AND regexp_matches({w}, '^[a-z]+$') "
        "AND NOT list_contains([" + stop + "], {w})"
    )
    clean = _CLEAN_SQL.format(src="text")
    return f"""
WITH c AS (
  SELECT doc_id, text AS raw, {clean} AS clean FROM documents
),
feat AS (
  SELECT doc_id, raw,
    list_filter([
      {cat_cells}
    ], x -> x IS NOT NULL) AS cat_hits,
    list_filter([
      {re_cells}
    ], x -> x IS NOT NULL) AS re_hits,
    string_split(clean, ' ') AS toks
  FROM c
),
cmp AS (
  SELECT doc_id, raw, cat_hits, re_hits,
    list_slice(list_transform(
      list_filter(
        list_zip(list_slice(toks, 1, len(toks) - 1), list_slice(toks, 2, len(toks))),
        p -> {nounish.format(w='p[1]')} AND {nounish.format(w='p[2]')}
      ),
      p -> p[1] || ' ' || p[2]), 1, 5) AS compounds
  FROM feat
),
u AS (
  SELECT doc_id, raw,
    list_sort(list_distinct(cat_hits || re_hits || compounds)) AS sk
  FROM cmp
)
SELECT doc_id,
  CASE WHEN length(trim(coalesce(raw, ''))) < 10 THEN '' ELSE array_to_string(sk, ',') END AS skills_csv,
  CASE WHEN length(trim(coalesce(raw, ''))) < 10 THEN 0 ELSE len(sk) END AS n_skills
FROM u
"""


register(QuerySpec(
    "skills_nlp_extraction", _nlp_extract, _build_nlp_oracle(),
    "three-pass skill extraction: catalog + regex + compound heuristic "
    "(extract_skills_nlp_udf, extract_skills.py:61-197)",
    ("domain", "skills", "bench"),
))


# --- skill_category_tags: the category CASE chain -------------------------
# Planted skill names cover every category, the 'Technique' fallback,
# the 'Autre' empty case, and the reference's first-hit-wins quirks
# ('terraform' contains 'r' -> Programmation, 'mongodb' contains 'go').

_SKILL_NAMES: tuple[str, ...] = (
    "python", "terraform", "mongodb", "sql", "kafka", "hive", "excel",
    "html", "vue", "tdd", "machine learning", "jenkins", "linux", "xml", "",
)


def _category_tags(spark: SparkSession, sf: str) -> DataFrame:
    p = fan_out(load_table(spark, sf, "part"))
    name = F.element_at(
        F.array(*[F.lit(s) for s in _SKILL_NAMES]),
        (F.col("p_partkey") % len(_SKILL_NAMES) + 1).cast("int"),
    )
    return p.select(
        "p_partkey",
        name.alias("skill"),
        SK.classify_skill_category(name).alias("category"),
    )


def _build_category_oracle() -> str:
    n = len(_SKILL_NAMES)
    name_case = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(_SKILL_NAMES)
    )
    whens = "\n    ".join(
        f"WHEN {_contains_any('lower(skill)', variants)} THEN '{cat}'"
        for cat, variants in SK.SKILL_CATEGORIES
    )
    return f"""
WITH s AS (
  SELECT p_partkey, CASE p_partkey % {n} {name_case} END AS skill FROM part
)
SELECT p_partkey, skill,
  CASE WHEN skill IS NULL OR skill = '' THEN 'Autre'
       ELSE CASE
    {whens}
    ELSE 'Technique' END
  END AS category
FROM s
"""


register(QuerySpec(
    "skill_category_tags", _category_tags, _build_category_oracle(),
    "skill category CASE chain, first-hit-wins with the reference's "
    "substring quirks (classify_skill_category_udf, extract_skills.py:200-242)",
    ("domain", "skills"),
))


# --- skill_confidence_scores: frequency + marker bonus --------------------
# Context is the document text, one third of which gets a planted
# marker suffix; the skill rotates through vocabulary tokens with
# different frequencies so min(0.9, 0.6 + 0.1*freq) actually varies.

_CONF_SKILLS: tuple[str, ...] = ("value", "data", "spark", "row")


def _confidence_scores(spark: SparkSession, sf: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf, "documents"))
    skill = F.element_at(
        F.array(*[F.lit(s) for s in _CONF_SKILLS]),
        (F.col("doc_id") % len(_CONF_SKILLS) + 1).cast("int"),
    )
    context = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.col("text"), F.lit(" compétences techniques")),
    ).otherwise(F.col("text"))
    return docs.select(
        "doc_id",
        skill.alias("skill"),
        F.round(SK.skill_confidence(skill, context), 6).alias("confidence"),
    )


_CONF_SQL = f"""
WITH s AS (
  SELECT doc_id,
    CASE doc_id % {len(_CONF_SKILLS)} {' '.join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(_CONF_SKILLS))} END AS skill,
    CASE WHEN doc_id % 3 = 0 THEN text || ' compétences techniques' ELSE text END AS context
  FROM documents
),
f AS (
  SELECT doc_id, skill, lower(context) AS ctx, lower(skill) AS sk FROM s
),
g AS (
  SELECT doc_id, skill, ctx, sk,
    CAST((length(ctx) - length(replace(ctx, sk, ''))) / length(sk) AS INT) AS freq
  FROM f
)
SELECT doc_id, skill,
  round(
    CASE WHEN skill IS NULL OR trim(sk) = '' OR ctx IS NULL OR trim(ctx) = '' THEN CAST(0.5 AS DOUBLE)
         ELSE least(CAST(0.9 AS DOUBLE), CAST(0.6 AS DOUBLE) + freq * CAST(0.1 AS DOUBLE))
              + CASE WHEN contains(ctx, 'compétences') OR contains(ctx, 'skills')
                       OR contains(ctx, 'technologies') OR contains(ctx, 'outils')
                     THEN CAST(0.1 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
    END, 6) AS confidence
FROM g
"""

register(QuerySpec(
    "skill_confidence_scores", _confidence_scores, _CONF_SQL,
    "skill confidence: min(0.9, 0.6 + 0.1*freq) + list-marker bonus "
    "(calculate_skill_confidence_udf, extract_skills.py:245-263)",
    ("domain", "skills"),
))
