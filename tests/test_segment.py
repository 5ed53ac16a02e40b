"""Sentence-segmentation UDTF invariants — the rows-only registry
entry's correctness contract."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bigdata_jobmatching_spark.functions.segment import (
    register_sentence_udtf,
    split_sentences,
)


def _cover(text: str) -> None:
    spans = split_sentences(text)
    if not text:
        assert spans == []
        return
    # abutting, monotone, lossless
    assert spans[0][1] == 0
    assert spans[-1][2] == len(text)
    for k, (idx, start, end, sent) in enumerate(spans):
        assert idx == k
        assert start < end
        assert text[start:end] == sent
        if k:
            assert start == spans[k - 1][2]
    assert "".join(s for _, _, _, s in spans) == text


def test_segment_basic_and_abbreviations():
    spans = split_sentences("Dr. Smith arrived. He met Mr. Jones! Was it 3.14 pm? Yes.")
    _cover("Dr. Smith arrived. He met Mr. Jones! Was it 3.14 pm? Yes.")
    sents = [s.strip() for _, _, _, s in spans]
    assert sents == [
        "Dr. Smith arrived.",
        "He met Mr. Jones!",
        "Was it 3.14 pm?",
        "Yes.",
    ]


def test_segment_tricky_dots():
    # mid-token dots, initials, e.g., terminator runs
    for text, n in [
        ("See file.txt for details. Then stop.", 2),
        ("J. R. Tolkien wrote it. True!", 2),
        ("Use e.g. apples. Or i.e. pears.", 2),
        ("Really?! No way... Fine.", 3),
        ("", 0),
        ("no terminator at all", 1),
    ]:
        _cover(text)
        assert len(split_sentences(text)) == n, text


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.sampled_from(" .!?aBc3\n\t\"'()"), max_size=80))
def test_segment_lossless_on_arbitrary_text(text):
    _cover(text)


def test_segment_udtf_matches_python(spark):
    register_sentence_udtf(spark)
    texts = [
        (1, "Dr. Smith arrived. He left."),
        (2, "One. Two! Three?"),
        (3, "nothing here"),
    ]
    spark.createDataFrame(texts, "doc_id long, text string").createOrReplaceTempView(
        "seg_t"
    )
    got = spark.sql(
        "SELECT doc_id, sent_idx, start, end, sentence FROM seg_t, "
        "LATERAL split_sentences(text)"
    ).collect()
    want = [
        (d, *span) for d, t in texts for span in split_sentences(t)
    ]
    assert sorted(tuple(r) for r in got) == sorted(want)


def test_segment_covers_corpus(spark, sf_dir):
    # every document reassembles exactly from its spans
    from bigdata_jobmatching_spark.sources.io import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    for text in docs.values():
        _cover(text)
