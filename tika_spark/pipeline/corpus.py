"""One-call batch corpus build: the end-to-end composition.

``build_corpus`` chains the pipeline a training-corpus job actually
runs — extraction (detect → route → parse), token gating, exact
dedup with keep-first election, and deterministic split assignment —
into one DataFrame expression, so "crawl table in, training corpus
out" is a single call (the batch sibling of
streaming/ingest.curate_stream).

Every stage is an operator that already exists and is oracle-checked
on its own (pipeline/job.extract, textstats.token_count,
textstats.assign_splits); this module contributes the composition
and its plan shape:

- extraction and gating ride the mapInPandas scan stage (no
  exchange beyond extract()'s own size-bucket repartition);
- dedup keep-first is ONE hash shuffle on the 16-byte text
  fingerprint (row_number window, first by url — retry-stable);
- split assignment is a zero-shuffle md5-band projection.

So the whole build is the extract job plus exactly one extra
exchange — the shape that survives a 100 TB input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def build_corpus(pages: DataFrame, mode: str = "text",
                 min_words: int = 20, max_words: int = 100_000,
                 fractions: dict[str, float] | None = None,
                 salt: str = "") -> DataFrame:
    """pages (url, html, ...) → deduplicated, split-assigned corpus
    rows (url, title, n_tokens, fingerprint, split, text).

    Gates: extraction status 'ok', non-empty text, ``min_words <=
    n_tokens <= max_words``. Dedup: exact by md5(text), keeping the
    lexicographically first url (deterministic under retries).
    Splits: md5-band assignment keyed on url (salt re-rolls).
    """
    from tika_spark.analysis.textstats import assign_splits, token_count
    from tika_spark.pipeline.job import extract

    ex = extract(pages, mode=mode)
    gated = (ex.filter((F.col("status") == "ok")
                       & (F.length("text") > 0))
             .withColumn("n_tokens",
                         token_count(F.col("text")).cast("long"))
             .filter((F.col("n_tokens") >= min_words)
                     & (F.col("n_tokens") <= max_words))
             .withColumn("fingerprint", F.md5("text")))
    w = Window.partitionBy("fingerprint").orderBy(F.asc("url"))
    deduped = (gated.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1).drop("__rn"))
    out = assign_splits(deduped, fractions or DEFAULT_SPLITS,
                        key_col="url", salt=salt)
    return out.select("url", "title", "n_tokens", "fingerprint",
                      "split", "text")
