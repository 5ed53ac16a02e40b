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

from .binding import let

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
    The normalized string is let-bound (guard + split share it).
    """
    return let(
        normalize_text(c),
        lambda norm: F.when(norm == "", F.array().cast("array<string>")).otherwise(F.split(norm, " ")),
    )


def bigram_zip(c: Column) -> Column:
    """Adjacent-token pairs of ``c``'s text as ``array<struct<0,1>>``:
    arrays_zip of the token array with its shift-by-one self.

    The token array is let-bound (binding.let): the zip shape
    references it four times (two sizes, two slices), and inlining
    the tokenize chain would re-run the regex normalize+split 4x per
    row — the constant-factor cousin of the per-shingle HOF trap
    (SCALING.md round-7 addendum 3).
    """
    return let(tokens(c), lambda tk: F.arrays_zip(
        F.slice(tk, 1, F.greatest(F.size(tk) - 1, F.lit(0))),
        F.slice(tk, 2, F.greatest(F.size(tk) - 1, F.lit(0))),
    ))


def content_tokens(c: Column, stopwords: tuple[str, ...] = FRENCH_STOPWORDS, min_len: int = 3) -> Column:
    """Tokens minus stopwords and short tokens (deduplicate.py:64-67:
    keep words with len > 2 that are not stopwords)."""
    toks = F.array_except(tokens(c), F.array(*[F.lit(s) for s in stopwords]))
    return F.filter(toks, lambda t: F.length(t) >= min_len)


def shingle_starts(cnt: Column, n: int) -> Column:
    """1-based start indexes of ``n``-token shingles; empty when cnt < n.

    The guard matters: ``sequence(1, 0)`` produces a DESCENDING [1, 0]
    array (Spark auto-steps -1 when start > stop) and ``slice(toks, 0,
    n)`` then throws INVALID_PARAMETER_VALUE.START under ANSI mode —
    short/empty documents must yield an empty shingle set instead
    (matching the DuckDB oracle twin's empty-list behavior).
    """
    return F.when(cnt >= n, F.sequence(F.lit(1), cnt - n + 1)).otherwise(
        F.array().cast("array<int>")
    )


def token_count(c: Column) -> Column:
    """Whitespace token count — the cheap tokenizer for doc stats."""
    return F.size(tokens(c)).cast("long")


def bpe_ish_token_count(c: Column) -> Column:
    """Approximate subword-token count via a BPE-ish regex: words and
    digit runs count once per ~4 chars (ceil), punctuation counts one
    each. A deterministic, SQL-expressible stand-in for a real BPE
    vocab (the actual tokenizer is external to the engine)."""
    def body(norm: Column) -> Column:
        per_word = F.transform(F.split(norm, " "), lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long"))
        return F.when(norm == "", F.lit(0).cast("long")).otherwise(
            F.aggregate(per_word, F.lit(0).cast("long"), lambda acc, x: acc + x)
        )

    return let(normalize_text(c), body)


def char_count(c: Column) -> Column:
    return F.length(c).cast("long")


def punct_ratio(c: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(F.lit(0.0))


def _stopword_hits(toks: Column, stopwords: tuple[str, ...]) -> Column:
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def _mean_word_length(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(c: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords — a core quality signal."""
    return let(
        tokens(c),
        lambda toks: F.when(
            F.size(toks) > 0, _stopword_hits(toks, stopwords) / F.size(toks)
        ).otherwise(F.lit(0.0)),
    )


def mean_word_length(c: Column) -> Column:
    return let(tokens(c), _mean_word_length)


def _quality_from_tokens(toks: Column, c: Column, stopwords: tuple[str, ...]) -> Column:
    n_tok = F.size(toks)
    mwl = _mean_word_length(toks)
    swr = F.when(F.size(toks) > 0, _stopword_hits(toks, stopwords) / F.size(toks)).otherwise(F.lit(0.0))
    length_ok = F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
    mwl_ok = F.when((mwl >= 2.0) & (mwl <= 12.0), 1.0).otherwise(0.0)
    sw_ok = F.when(swr >= 0.05, 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) <= 0.2, 1.0).otherwise(0.0)
    return (length_ok + mwl_ok + sw_ok + punct_ok) / F.lit(4.0)


def quality_score(c: Column, stopwords: tuple[str, ...] = LANG_PROFILES["en"]) -> Column:
    """Composite document-quality score in [0, 1].

    Same shape as the reference's parsing_quality_score — a sum of
    bounded indicator terms over 4 signals (parse_jobs.py:437-441) —
    applied to free text: length band, mean word length band,
    stopword presence, low punctuation noise. Tokens are let-bound so
    the tokenize chain runs once per row across all four signals.
    """
    return let(tokens(c), lambda tk: _quality_from_tokens(tk, c, stopwords))


def quality_token_struct(c: Column, stopwords: tuple[str, ...] = LANG_PROFILES["en"]) -> Column:
    """``struct(score, n_tokens)`` from ONE let-bound tokenize.

    For band-then-budget queries that need both signals: calling
    quality_score and token_count separately runs the normalize+split
    chain twice per row, and at corpus scale those regex passes ARE
    the query cost (SCALING.md round-7 addendum 4). Consume through an
    exploded one-element struct so the two fields stay one evaluation.
    """
    return let(tokens(c), lambda tk: F.struct(
        _quality_from_tokens(tk, c, stopwords).alias("score"),
        F.size(tk).cast("long").alias("n_tokens"),
    ))


def doc_stat_struct(c: Column) -> Column:
    """The five doc_stats signals from ONE normalize + ONE split —
    ``struct(n_tokens, n_chars, n_bpe_tokens, punct_ratio,
    mean_word_len)``.

    The standalone helpers each re-run the two-regex normalize chain
    (token_count + bpe_ish_token_count + mean_word_length cost three
    normalizes and three splits per row); fused, the row costs two
    normalize regexes + one split + the punct regex. Values are
    bit-identical: same guarded-split tokens, same aggregates.
    """
    def from_toks(tk: Column) -> Column:
        bpe = F.aggregate(
            F.transform(tk, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long")),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        )
        return F.struct(
            F.size(tk).cast("long").alias("n_tokens"),
            char_count(c).alias("n_chars"),
            bpe.alias("n_bpe_tokens"),
            punct_ratio(c).alias("punct_ratio"),
            _mean_word_length(tk).alias("mean_word_len"),
        )

    return let(tokens(c), from_toks)


def lang_scores(c: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratios (the lang-ID signal)."""
    out: dict[str, Column] = {}
    for lang, words in LANG_PROFILES.items():
        out[lang] = let(
            tokens(c),
            lambda toks, words=words: F.when(
                F.size(toks) > 0, _stopword_hits(toks, words) / F.size(toks)
            ).otherwise(F.lit(0.0)),
        )
    return out


def detect_language(c: Column) -> Column:
    """Argmax language over the stopword profiles; 'und' when no
    profile scores > 0. Deterministic tie-break: profile order
    en > fr > es > de (strict > comparison keeps the earlier).
    Tokens let-bound once across all language profiles."""
    def body(toks: Column) -> Column:
        best_lang = F.lit("und")
        best_score = F.lit(0.0)
        n = F.size(toks)
        for lang, words in LANG_PROFILES.items():
            s = F.when(n > 0, _stopword_hits(toks, words) / n).otherwise(F.lit(0.0))
            is_better = s > best_score
            best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(is_better, s).otherwise(best_score)
        return best_lang

    return let(tokens(c), body)


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
    def body(toks: Column) -> Column:
        idx = shingle_starts(F.size(toks), window)
        shingles = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, window), " "))
        hashes = F.transform(shingles, lambda s: F.abs(F.xxhash64(s)))
        kept = F.slice(F.array_sort(hashes), 1, keep)
        return F.md5(F.array_join(F.transform(kept, lambda h: h.cast("string")), "_"))

    return let(tokens(c), body)


# Gopher-rule document filter thresholds (Rae et al. 2021,
# arXiv:2112.11446, Table A1 — public paper). The repetition signal is
# adapted to single-line docs: fraction of the (capped) bigram list
# taken by its most frequent bigram, vs the paper's top-2-gram
# character fraction.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_TOP_BIGRAM_FRAC = 0.18
# bounded work per doc: the O(distinct x len) repetition scan runs on
# at most this many bigrams, so a 1M-token document costs the same as
# a 257-token one — the cap is what makes the rule safe at 100 TB.
GOPHER_REPETITION_CAP = 256


def gopher_stats(c: Column, stopwords: tuple[str, ...] = LANG_PROFILES["en"]) -> Column:
    """struct(n_words, mean_word_len, alpha_word_ratio, stop_hits,
    top_bigram_frac, passes) — the Gopher quality-filter signals as
    ONE native projection (tokens let-bound, zero shuffles).

    ``passes`` is the conjunction of all five rules; short docs with
    no bigrams fail (they are below GOPHER_MIN_WORDS anyway).
    """
    def body(toks: Column) -> Column:
        n = F.size(toks)
        mwl = _mean_word_length(toks)
        alpha = F.when(
            n > 0,
            F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))) / n,
        ).otherwise(F.lit(0.0))
        stop_hits = _stopword_hits(toks, stopwords)
        bigrams = F.slice(
            F.zip_with(
                F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            1, GOPHER_REPETITION_CAP,
        )

        def rep(bg: Column) -> Column:
            top = F.array_max(
                F.transform(
                    F.array_distinct(bg),
                    lambda d: F.size(F.filter(bg, lambda x: x == d)),
                )
            )
            return F.when(F.size(bg) > 0, top / F.size(bg))

        top_frac = let(bigrams, rep)
        passes = (
            (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS)
            & (mwl >= GOPHER_MIN_MEAN_WORD_LEN) & (mwl <= GOPHER_MAX_MEAN_WORD_LEN)
            & (alpha >= GOPHER_MIN_ALPHA_RATIO)
            & (stop_hits >= GOPHER_MIN_STOP_HITS)
            & F.coalesce(top_frac <= GOPHER_MAX_TOP_BIGRAM_FRAC, F.lit(False))
        )
        return F.struct(
            n.cast("long").alias("n_words"),
            F.round(mwl, 6).alias("mean_word_len"),
            F.round(alpha, 6).alias("alpha_word_ratio"),
            stop_hits.cast("long").alias("stop_hits"),
            F.round(top_frac, 6).alias("top_bigram_frac"),
            passes.alias("passes"),
        )

    return let(tokens(c), body)
