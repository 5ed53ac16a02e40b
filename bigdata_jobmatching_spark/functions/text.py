"""Text-analysis Column expressions — all native (JVM-side, codegen'd).

Replaces the reference's row-at-a-time Python UDFs (SURVEY §2.8):
``normalize_text_udf`` (``deduplicate.py:45-70``) becomes
lower+regexp+array ops; quality/confidence scoring becomes column
arithmetic. Also provides the training-data-pipeline text ops:
language-ID heuristic, quality scoring, token counting, and document
fingerprinting — each expressible identically in ANSI SQL so the
DuckDB oracle can verify them.

Everything here returns a ``Column``; nothing touches Python per row,
so filters composed from these still reach the parquet scan and stay
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# French stopwords the reference strips during dedup normalization
# (deduplicate.py:58-63) plus the short-token rule (len > 2).
FRENCH_STOPWORDS = (
    "le", "la", "les", "de", "du", "des", "un", "une", "et", "ou",
    "pour", "avec", "sans", "sur", "dans", "par", "au", "aux", "en",
)

# Tiny per-language stopword profiles for the n-gram/stopword
# language-ID heuristic (public-knowledge word lists).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "des", "du", "est"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "que", "en", "es"),
    "de": ("der", "die", "das", "und", "ein", "eine", "von", "zu", "ist", "den"),
}


def normalize_text(c: Column) -> Column:
    """lowercase, strip non-alphanumerics to spaces, squeeze whitespace.

    Native rebuild of ``normalize_text_udf`` (deduplicate.py:45-57).
    """
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def tokens(c: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>).

    Empty input must give an empty array, not [''] — guard with a
    CASE; ``split('')`` returns a single empty token otherwise.
    """
    norm = normalize_text(c)
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(F.split(norm, " "))


def content_tokens(c: Column, stopwords: tuple[str, ...] = FRENCH_STOPWORDS, min_len: int = 3) -> Column:
    """Tokens minus stopwords and short tokens (deduplicate.py:64-67:
    keep words with len > 2 that are not stopwords)."""
    toks = F.array_except(tokens(c), F.array(*[F.lit(s) for s in stopwords]))
    return F.filter(toks, lambda t: F.length(t) >= min_len)


def token_count(c: Column) -> Column:
    """Whitespace token count — the cheap tokenizer for doc stats."""
    return F.size(tokens(c)).cast("long")


def bpe_ish_token_count(c: Column) -> Column:
    """Approximate subword-token count via a BPE-ish regex: words and
    digit runs count once per ~4 chars (ceil), punctuation counts one
    each. A deterministic, SQL-expressible stand-in for a real BPE
    vocab (the actual tokenizer is external to the engine)."""
    pieces = F.split(normalize_text(c), " ")
    per_word = F.transform(pieces, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long"))
    return F.when(normalize_text(c) == "", F.lit(0).cast("long")).otherwise(
        F.aggregate(per_word, F.lit(0).cast("long"), lambda acc, x: acc + x)
    )


def char_count(c: Column) -> Column:
    return F.length(c).cast("long")


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords — a core quality signal."""
    toks = tokens(c)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_length(c: Column) -> Column:
    toks = tokens(c)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(c: Column, stopwords: tuple[str, ...] = LANG_PROFILES["en"]) -> Column:
    """Composite document-quality score in [0, 1].

    Same shape as the reference's parsing_quality_score — a sum of
    bounded indicator terms over 4 signals (parse_jobs.py:437-441) —
    applied to free text: length band, mean word length band,
    stopword presence, low punctuation noise.
    """
    n_tok = token_count(c)
    mwl = mean_word_length(c)
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    sw_ok = F.when(stopword_ratio(c, stopwords) >= 0.05, 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.2, 1.0).otherwise(0.0)
    return (length_ok + mwl_ok + sw_ok + punct_ok) / F.lit(4.0)


def lang_scores(c: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratios (the lang-ID signal)."""
    toks = tokens(c)
    out: dict[str, Column] = {}
    for lang, words in LANG_PROFILES.items():
        sw = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        out[lang] = F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))
    return out


def detect_language(c: Column) -> Column:
    """Argmax language over the stopword profiles; 'und' when no
    profile scores > 0. Deterministic tie-break: profile order
    en > fr > es > de (strict > comparison keeps the earlier)."""
    scores = lang_scores(c)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    for lang, s in scores.items():
        is_better = s > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, s).otherwise(best_score)
    return best_lang


def fingerprint(c: Column) -> Column:
    """Canonical document fingerprint: md5 of sorted unique content
    tokens. Robust to token order and duplication — the exact-dedup
    key for near-identical documents (reference id-hashing intent:
    md5 ids, base_scraper.py:277-281 / load_to_bigquery.py:17)."""
    canon = F.array_join(F.array_sort(F.array_distinct(tokens(c))), " ")
    return F.md5(canon)


def rolling_hash_fingerprint(c: Column, window: int = 8, keep: int = 4) -> Column:
    """Winnowing-style fingerprint: polynomial rolling hash of each
    ``window``-gram shingle, keep the ``keep`` smallest hashes, md5 the
    concatenation. All native array ops (shingle via sequence+slice).
    """
    toks = tokens(c)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(0)))
    shingles = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, window), " "))
    hashes = F.transform(shingles, lambda s: F.abs(F.xxhash64(s)))
    kept = F.slice(F.array_sort(hashes), 1, keep)
    return F.md5(F.array_join(F.transform(kept, lambda h: h.cast("string")), "_"))
