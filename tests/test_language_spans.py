"""Sentence-level language segmentation (language/spans.py)."""

from tika_spark.language.corpus import SEED_TEXT
from tika_spark.language.spans import language_spans, sentence_split


def _first(lang):
    return sentence_split(SEED_TEXT[lang])[0]


def test_sentence_split():
    assert sentence_split("One. Two!  Three? Four") == \
        ["One.", "Two!", "Three?", "Four"]
    assert sentence_split("") == []
    assert sentence_split("No terminal punct") == \
        ["No terminal punct"]


def test_spans_merge_and_switch(spark):
    text = " ".join([_first("en"), _first("en"), _first("fr"),
                     _first("de"), _first("de"), _first("de")])
    df = spark.createDataFrame([(1, text), (2, "")],
                               "doc_id long, text string")
    out = [(r.span_idx, r.lang, r.n_sentences, r.n_chars)
           for r in language_spans(df).collect() if r.id == 1]
    assert [(i, lg, ns) for i, lg, ns, _ in out] == [
        (0, "en", 2), (1, "fr", 1), (2, "de", 3)]
    assert out[0][3] == 2 * len(_first("en"))
    # empty doc -> no span rows
    assert all(r.id == 1 for r in language_spans(df).collect())
