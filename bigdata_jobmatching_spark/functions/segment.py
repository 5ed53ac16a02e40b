"""Sentence segmentation as a Python UDTF — the table-function
surface (SURVEY §2.8's UDTF row: the reference's per-row extractors
that EXPAND rows, e.g. its pair-explode and multi-record parsers,
re-expressed on Spark 4's `udtf` API).

Why a UDTF and not expressions: sentence boundaries need an
imperative scanner — a dot ends a sentence only if it is not an
abbreviation ("Dr.", "e.g."), not a decimal point (3.14), and is
followed by a plausible sentence start; tracking that context is a
character-state machine, the same "per-row imperative logic"
class as the FFD packer, and the repo's one UDTF (everything
regex-expressible stays native — see functions/text.py).

Determinism: pure function of the input string — byte-identical
across partitionings and engines. The invariant suite
(tests/test_segment.py) pins lossless coverage: spans are monotone,
non-overlapping, and concatenate back to the exact input.

Scale: UDTFs evaluate per input row inside executors (no shuffle of
their own); the lateral join fans out rows in place. At 100 TB the
cost model is identical to any per-row projection — embarrassingly
parallel, no state across rows.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

# dot-terminated tokens that do NOT end a sentence (lowercased,
# dot-free form); an imperative scanner needs these — a regex
# lookbehind cannot bind "the token before this dot" in general
_ABBREVIATIONS = frozenset({
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st",
    "vs", "etc", "e.g", "i.e", "cf", "al", "inc", "ltd", "co",
    "fig", "no", "vol", "pp", "approx",
})

_TERMINATORS = frozenset(".!?")


def split_sentences(text: str) -> list[tuple[int, int, int, str]]:
    """(sent_idx, start, end, sentence) spans covering ``text``
    exactly: 0 <= start < end <= len, spans abut (next.start ==
    prev.end), ``text[start:end]`` concatenated over all spans is
    ``text``. Pure Python so the UDTF and the tests share one
    implementation."""
    if not text:
        return []
    spans: list[tuple[int, int, int, str]] = []
    n = len(text)
    start = 0
    i = 0
    while i < n:
        ch = text[i]
        if ch in _TERMINATORS:
            # scan the terminator run (e.g. "?!" / "...")
            j = i + 1
            while j < n and text[j] in _TERMINATORS:
                j += 1
            boundary = True
            if ch == "." and j - i == 1:
                before = text[start:i]
                # token preceding the dot, lowercased, dots kept so
                # "e.g" survives from "e.g."
                tok = before.rsplit(None, 1)[-1].lstrip("(\"'").lower() if before.strip() else ""
                if tok in _ABBREVIATIONS or (len(tok) == 1 and tok.isalpha()):
                    boundary = False  # "Dr." / middle initial "J."
                elif i + 1 < n and text[i + 1].isdigit() and i > start and text[i - 1].isdigit():
                    boundary = False  # decimal 3.14
            if boundary:
                # a sentence must be followed by end-of-text or
                # whitespace; mid-token dots (file.txt) never split
                if j >= n or text[j].isspace():
                    # extend through trailing whitespace so spans abut
                    while j < n and text[j].isspace():
                        j += 1
                    spans.append((len(spans), start, j, text[start:j]))
                    start = j
                    i = j
                    continue
            i = j
        else:
            i += 1
    if start < n:
        spans.append((len(spans), start, n, text[start:n]))
    return spans


@udtf(returnType="sent_idx int, start int, end int, sentence string")
class SentenceSplitter:
    def eval(self, text: str):  # noqa: D102 - UDTF contract
        yield from split_sentences(text)


def register_sentence_udtf(spark) -> None:
    spark.udtf.register("split_sentences", SentenceSplitter)
