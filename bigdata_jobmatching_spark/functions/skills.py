"""NLP-ish skill extraction as native column expressions.

Rebuilds ``extract_skills_nlp_udf`` (extract_skills.py:61-197) and
``calculate_skill_confidence_udf`` (extract_skills.py:245-263) without
spaCy (not in the container) and without Python-per-row:

1. **Catalog pass** (extract_skills.py:76-146): substring containment
   of each variant in the cleaned text emits the category's canonical
   name. Bug-compatible with the reference: variants containing
   punctuation (``c#``, ``.net``, ``node.js``, ``ci/cd``) can never
   match because the text is cleaned first, and one-letter variants
   (``r``) match almost everything — both faithfully reproduced.
2. **Regex pass** (extract_skills.py:148-167): the 10 additional
   word-boundary patterns over the cleaned text.
3. **Compound pass** (extract_skills.py:169-188): the spaCy
   NOUN/PROPN compound extraction is approximated heuristically —
   adjacent alphabetic tokens, both longer than 2 chars and neither a
   function word, form a candidate compound; generics filtered, first
   5 kept. Deterministic, hence oracle-checkable; pinned-fixture
   tests document the approximation.

Deviation from the reference: canonical names are emitted LOWERCASE
and the result array is sorted — the reference title-cases and then
destroys order via ``list(set(...))``, which is nondeterministic; a
distributed engine needs a stable output contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .binding import let
from .text import FRENCH_STOPWORDS

# category -> variants, verbatim from extract_skills.py:76-128 (the
# canonical name is the key with '_' -> ' ').
SKILLS_CATALOG: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("python", ("python", "py", "pandas", "numpy", "django", "flask", "fastapi")),
    ("java", ("java", "spring", "hibernate", "maven", "gradle")),
    ("javascript", ("javascript", "js", "node.js", "react", "vue", "angular", "typescript")),
    ("csharp", ("c#", ".net", "asp.net", "entity framework")),
    ("php", ("php", "laravel", "symfony", "wordpress")),
    ("ruby", ("ruby", "rails", "ror")),
    ("go", ("go", "golang")),
    ("rust", ("rust",)),
    ("scala", ("scala", "akka")),
    ("kotlin", ("kotlin", "android")),
    ("swift", ("swift", "ios")),
    ("r", ("r", "rstudio", "shiny")),
    ("matlab", ("matlab",)),
    ("sas", ("sas",)),
    ("sql", ("sql", "mysql", "postgresql", "oracle", "sqlite", "tsql")),
    ("nosql", ("mongodb", "cassandra", "redis", "elasticsearch", "dynamodb")),
    ("bigdata", ("hadoop", "spark", "kafka", "hive", "pig", "flume", "sqoop")),
    ("aws", ("aws", "ec2", "s3", "lambda", "rds", "cloudformation")),
    ("azure", ("azure", "blob storage", "azure functions")),
    ("gcp", ("gcp", "google cloud", "bigquery", "cloud storage")),
    ("docker", ("docker", "container", "kubernetes", "k8s")),
    ("terraform", ("terraform", "infrastructure as code")),
    ("jenkins", ("jenkins", "ci/cd", "gitlab ci", "github actions")),
    ("linux", ("linux", "bash", "shell", "ubuntu", "centos")),
    ("tableau", ("tableau", "tableau desktop", "tableau server")),
    ("powerbi", ("power bi", "powerbi", "dax")),
    ("qlik", ("qlik", "qlikview", "qliksense")),
    ("excel", ("excel", "vba", "macros")),
    ("sap", ("sap", "sap hana", "abap")),
    ("agile", ("agile", "scrum", "kanban", "sprint")),
    ("devops", ("devops", "ci/cd", "continuous integration")),
    ("tdd", ("tdd", "test driven development")),
    ("bdd", ("bdd", "behavior driven development")),
    ("frontend", ("html", "css", "bootstrap", "tailwind", "sass")),
    ("backend", ("api", "rest", "graphql", "microservices", "soap")),
    ("machine_learning", ("machine learning", "ml", "tensorflow", "pytorch", "scikit-learn")),
    ("deep_learning", ("deep learning", "neural networks", "cnn", "rnn")),
    ("data_science", ("data science", "statistics", "probability", "data analysis")),
)

# extract_skills.py:149-160 — applied to the CLEANED text, so the
# dotted alternates are inert (faithful to the reference).
ADDITIONAL_PATTERNS: tuple[str, ...] = (
    r"\b(c\+\+|cpp)\b",
    r"\b(react\.js|reactjs)\b",
    r"\b(node\.js|nodejs)\b",
    r"\b(express\.js|expressjs)\b",
    r"\b(jquery)\b",
    r"\b(bootstrap)\b",
    r"\b(tailwind)\b",
    r"\b(sass|scss)\b",
    r"\b(webpack)\b",
    r"\b(gulp|grunt)\b",
)

# generic terms the reference excludes from compound skills
# (extract_skills.py:185) plus function words the POS heuristic uses
# to reject non-noun tokens.
GENERIC_TERMS: tuple[str, ...] = ("experience", "years", "skills", "knowledge", "ability")
FUNCTION_WORDS: tuple[str, ...] = FRENCH_STOPWORDS + (
    "the", "and", "for", "with", "our", "you", "are", "this", "that",
    "nous", "vous", "notre", "votre", "est", "sont", "recherchons",
)

COMPOUND_LIMIT = 5

# category -> variants, verbatim from classify_skill_category_udf
# (extract_skills.py:207-242). Substring containment in catalog order,
# first hit wins, fallback 'Technique', empty input 'Autre'. Faithful
# to the reference's quirks: the one-letter variant 'r' makes any
# skill containing the letter r land in 'Programmation' (e.g.
# 'terraform' never reaches 'Cloud'), and 'go' matches 'django'.
SKILL_CATEGORIES: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("Programmation", ("python", "java", "javascript", "csharp", "php", "ruby", "go",
                       "rust", "scala", "kotlin", "swift", "r", "matlab", "sas", "c++", "cpp")),
    ("Base de Données", ("sql", "nosql", "mysql", "postgresql", "mongodb", "redis", "elasticsearch")),
    ("Big Data", ("hadoop", "spark", "kafka", "hive", "bigquery", "data science")),
    ("Cloud", ("aws", "azure", "gcp", "docker", "kubernetes", "terraform")),
    ("DevOps", ("jenkins", "linux", "bash", "ci/cd", "devops")),
    ("BI & Analytics", ("tableau", "powerbi", "qlik", "excel", "sap")),
    ("Web", ("html", "css", "react", "vue", "angular", "bootstrap", "tailwind")),
    ("IA & ML", ("machine learning", "deep learning", "tensorflow", "pytorch")),
    ("Méthodologies", ("agile", "scrum", "kanban", "tdd", "bdd")),
)


def classify_skill_category(skill: Column) -> Column:
    """Category for a skill name (classify_skill_category_udf,
    extract_skills.py:200-242): first catalog category with any
    variant substring-contained in the lowered name; 'Technique' if
    none, 'Autre' for null/empty. One codegen'd CASE chain."""
    low = F.lower(skill)
    chain: Column | None = None
    for cat, variants in SKILL_CATEGORIES:
        hit: Column | None = None
        for v in variants:
            h = low.contains(v)
            hit = h if hit is None else (hit | h)
        chain = F.when(hit, F.lit(cat)) if chain is None else chain.when(hit, F.lit(cat))
    chain = chain.otherwise(F.lit("Technique"))
    return F.when(skill.isNull() | (skill == ""), F.lit("Autre")).otherwise(chain)


def clean_text(text: Column) -> Column:
    """lower + strip punctuation to spaces + squeeze (extract_skills.py:131-135)."""
    c = F.lower(F.coalesce(text, F.lit("")))
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def _catalog_hits(clean: Column) -> Column:
    """array<string> of canonical category names whose any variant is
    a substring of the cleaned text (extract_skills.py:139-146)."""
    cells = []
    for category, variants in SKILLS_CATALOG:
        hit: Column | None = None
        for v in variants:
            h = clean.contains(v)
            hit = h if hit is None else (hit | h)
        cells.append(F.when(hit, F.lit(category.replace("_", " "))))
    return F.filter(F.array(*cells), lambda x: x.isNotNull())


def _regex_hits(clean: Column) -> Column:
    """array<string> of pattern group-1 matches, dots stripped
    (extract_skills.py:162-167)."""
    cells = [
        let(
            F.regexp_extract(clean, pat, 1),
            lambda m: F.when(m != "", F.replace(m, F.lit("."), F.lit(""))),
        )
        for pat in ADDITIONAL_PATTERNS
    ]
    return F.filter(F.array(*cells), lambda x: x.isNotNull())


def compound_terms(text: Column, limit: int = COMPOUND_LIMIT) -> Column:
    """Heuristic analog of the spaCy compound/amod extraction
    (extract_skills.py:169-188): adjacent alphabetic tokens, both
    longer than 2 chars, neither a function word nor a generic term,
    joined as 'w1 w2'; first ``limit`` distinct compounds kept.
    """
    def body(toks: Column) -> Column:
        n = F.size(toks)
        pairs = F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        )
        stop = F.array(*[F.lit(w) for w in FUNCTION_WORDS + GENERIC_TERMS])

        def noun_ish(w: Column) -> Column:
            return (F.length(w) > 2) & w.rlike("^[a-z]+$") & ~F.array_contains(stop, w)

        # first `limit` RAW compounds, like the reference's
        # technical_terms[:5] — dedup happens only in the final union
        good = F.filter(pairs, lambda p: noun_ish(p["a"]) & noun_ish(p["b"]))
        terms = F.transform(good, lambda p: F.concat_ws(" ", p["a"], p["b"]))
        return F.slice(terms, 1, limit)

    return let(F.split(clean_text(text), " "), body)


def extract_skills_nlp(text: Column) -> Column:
    """Full three-pass extraction (extract_skills.py:61-197): catalog
    + regex + compound heuristic, deduplicated and sorted; empty for
    texts shorter than 10 chars (extract_skills.py:66-67)."""
    def body(clean: Column) -> Column:
        all_hits = F.concat(_catalog_hits(clean), _regex_hits(clean), compound_terms(clean))
        return F.array_sort(F.array_distinct(all_hits))

    guard = F.length(F.trim(F.coalesce(text, F.lit("")))) < 10
    return F.when(guard, F.array().cast("array<string>")).otherwise(
        let(clean_text(text), body)
    )


def skill_confidence(skill: Column, context: Column) -> Column:
    """Confidence for an extracted skill (extract_skills.py:245-263):
    min(0.9, 0.6 + 0.1 x substring frequency) + 0.1 when the context
    mentions a skill-list marker; 0.5 when either input is missing."""
    sk = F.lower(skill)
    ctx = F.lower(context)
    freq = (
        (F.length(ctx) - F.length(F.replace(ctx, sk, F.lit(""))))
        / F.length(sk)
    ).cast("int")
    base = F.least(F.lit(0.9), 0.6 + freq * 0.1)
    marker = (
        ctx.contains("compétences") | ctx.contains("skills")
        | ctx.contains("technologies") | ctx.contains("outils")
    )
    conf = base + F.when(marker, F.lit(0.1)).otherwise(F.lit(0.0))
    missing = (
        skill.isNull() | (F.trim(sk) == "") | context.isNull() | (F.trim(ctx) == "")
    )
    return F.when(missing, F.lit(0.5)).otherwise(conf)
