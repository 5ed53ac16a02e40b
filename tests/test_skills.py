"""Pinned-fixture tests for the NLP-ish skill extraction rebuild
(functions/skills.py vs reference extract_skills.py:61-263).

The compound pass is a heuristic approximation of the spaCy
NOUN/PROPN extraction — these fixtures PIN its behavior so any drift
is a deliberate, reviewed change.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_jobmatching_spark.functions import skills as SK


def _extract(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(SK.extract_skills_nlp(F.col("t")).alias("s")).head().s


def test_catalog_pass_substring_and_bug_compat(spark):
    out = _extract(spark, "Nous cherchons un expert Python avec Django et Kubernetes")
    assert "python" in out and "docker" in out  # kubernetes -> docker category
    # 'r' one-letter variant matches nearly everything (bug-compatible
    # with extract_skills.py:139-146: 'r' in 'cherchons')
    assert "r" in out
    # punctuation variants can never match the cleaned text: 'c#'
    # stripped to 'c ' (bug-compatible)
    out2 = _extract(spark, "développement C# et .NET uniquement ici")
    assert "csharp" not in out2


def test_regex_pass_extracts_and_strips_dots(spark):
    out = _extract(spark, "profil maitrisant cpp et reactjs pour mission")
    assert "cpp" in out and "reactjs" in out


def test_compound_pass_limit_and_stopwords(spark):
    out = _extract(spark, "ingenieur logiciel senior backend distribue scalable")
    # adjacent noun-ish pairs, first 5 kept
    assert "ingenieur logiciel" in out and "logiciel senior" in out
    compounds = [s for s in out if " " in s]
    assert len(compounds) <= SK.COMPOUND_LIMIT
    # function words break compounds: 'et' never appears in one
    out2 = _extract(spark, "ingenieur et logiciel")
    assert all("et" not in c.split() for c in out2 if " " in c)


def test_short_text_guard_and_sorted_distinct(spark):
    assert _extract(spark, "python") == []
    assert _extract(spark, None) == []
    out = _extract(spark, "python python python et encore python ici")
    assert out == sorted(set(out))


def test_classify_skill_category_first_hit_wins(spark):
    df = spark.createDataFrame(
        [("python",), ("terraform",), ("mongodb",), ("sql",), ("kafka",),
         ("excel",), ("html",), ("tdd",), ("xml",), ("",), (None,)],
        "s string",
    )
    out = [r.c for r in df.select(SK.classify_skill_category(F.col("s")).alias("c")).collect()]
    # 'terraform' contains 'r', 'mongodb' contains 'go' -> both land in
    # Programmation (faithful to the reference's substring check)
    assert out == [
        "Programmation", "Programmation", "Programmation", "Base de Données",
        "Big Data", "BI & Analytics", "Web", "Méthodologies", "Technique",
        "Autre", "Autre",
    ]


def test_skill_confidence_formula(spark):
    df = spark.createDataFrame(
        [
            ("spark", "spark et spark et spark"),          # freq 3 -> 0.9 cap
            ("spark", "du spark ici"),                     # freq 1 -> 0.7
            ("spark", "compétences: spark"),               # 0.7 + 0.1 marker
            ("spark", "rien du tout"),                     # freq 0 -> 0.6
            ("", "contexte"),                              # missing -> 0.5
            ("spark", None),                               # missing -> 0.5
        ],
        "sk string, ctx string",
    )
    out = [
        round(r.c, 6)
        for r in df.select(
            SK.skill_confidence(F.col("sk"), F.col("ctx")).alias("c")
        ).collect()
    ]
    assert out == [0.9, 0.7, 0.8, 0.6, 0.5, 0.5]


def test_pipeline_skills_with_metadata(spark):
    from bigdata_jobmatching_spark.plans import domain_pipeline as P
    from bigdata_jobmatching_spark.schemas import JOB_RAW_SCHEMA

    from tests.fixtures import make_raw_offers

    raw = spark.createDataFrame(make_raw_offers(), JOB_RAW_SCHEMA)
    offers = P.extract_skills(spark, P.normalize_offers(raw))
    row = offers.filter(F.size("skills_with_metadata") > 0).head()
    assert row is not None
    meta = {m.skill: m for m in row.skills_with_metadata}
    assert set(meta) == set(row.skills)
    for m in meta.values():
        assert m.category and 0.5 <= m.confidence <= 1.0
    # nlp_skills merged into skills
    nlp_row = offers.filter(F.size("nlp_skills") > 0).head()
    assert nlp_row is not None
    assert set(nlp_row.nlp_skills) <= set(nlp_row.skills)
