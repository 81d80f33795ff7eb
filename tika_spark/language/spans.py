"""Sentence-level language segmentation (code-switching spans).

Document-level language ID (language/identifier.py, the reference's
G2 tier) assigns ONE label per document, but web text is frequently
mixed — quoted passages, boilerplate in a second language, genuine
code-switching. A training pipeline wants the per-language SPANS so
it can route each region to the right per-language corpus (or drop
documents whose mix is too fragmented).

``language_spans``: split into sentences (terminal-punctuation rule),
classify each sentence with the same 27-profile 3-gram model the
document tier uses, and merge consecutive same-language sentences
into spans. Emits one row per span:
``(id, span_idx, lang, n_sentences, n_chars)``.

Scale: one mapInPandas over the documents, model shipped per
executor exactly as the extraction chain ships it; no shuffle.
Reference parity: extends `language/LanguageIdentifier.java`'s
whole-profile classification to sub-document granularity (no
counterpart — pipeline extension).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


def sentence_split(text: str) -> list[str]:
    """Terminal-punctuation sentence split; empty chunks dropped."""
    return [s for s in _SENT_SPLIT.split(text or "") if s.strip()]


def language_spans(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_chars: int = 1000) -> DataFrame:
    """Per-document language spans. Each sentence is classified on
    its first ``max_chars`` chars; consecutive sentences agreeing on
    a language merge into one span."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from tika_spark.language.identifier import default_model
        model = default_model()
        for pdf in batches:
            rows = []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                spans: list[list] = []   # [lang, n_sent, n_chars]
                for s in sentence_split(str(text or "")):
                    lang, _ = model.identify(s[:max_chars])
                    if spans and spans[-1][0] == lang:
                        spans[-1][1] += 1
                        spans[-1][2] += len(s)
                    else:
                        spans.append([lang, 1, len(s)])
                for k, (lang, ns, nc) in enumerate(spans):
                    rows.append((int(i), k, lang, ns, nc))
            yield pd.DataFrame(rows, columns=[
                "id", "span_idx", "lang", "n_sentences", "n_chars"])

    return docs.select(id_col, text_col).mapInPandas(
        run, schema="id long, span_idx int, lang string, "
                    "n_sentences long, n_chars long")
