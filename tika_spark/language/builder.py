"""Corpus-scale language-profile builder (SURVEY.md §2 G3).

The reference's LanguageProfilerBuilder (tika-core/.../language/
LanguageProfilerBuilder.java, 767 LoC; CLI ``--create-profile=``)
builds ``.ngp`` profiles from a corpus: extract char 3-grams, count,
sort by frequency, cut at the top 1000. At crawl scale that is a pure
Spark aggregation — normalization, word split and the sliding window
are native column expressions (no UDF), so the whole job is
scan → project → explode → partial-agg → shuffle-on-ngram → final agg,
with map-side combine for free.

ProfilingWriter semantics (ProfilingWriter.java:66-94, pinned by
``profile_text``): lowercase, words are maximal letter runs, each word
contributes the 3-gram windows of ``_word_`` — the counter resets at
separators, so no gram spans two words.

``profile_to_counter`` turns a collected profile back into the
in-memory Counter shape the identifier consumes, closing the loop:
profiles trained by this job are directly loadable into
LanguageIdentifierModel.
"""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

TOP_K = 1000  # LanguageProfilerBuilder's profile cut


def build_profiles(df: DataFrame, text_col: str = "text",
                   lang_col: str | None = "lang",
                   top_k: int = TOP_K) -> DataFrame:
    """Aggregate per-language 3-gram profiles over a corpus DataFrame.

    Returns (lang, ngram, n, rank) rows, rank 1..top_k per language —
    the distributed equivalent of one ``.ngp`` file per language.
    With ``lang_col=None`` a single unlabeled profile is built.
    """
    cols = [F.col(lang_col).alias("lang")] if lang_col else \
        [F.lit("und").alias("lang")]
    words = (df.select(*cols,
                       F.explode(F.split(F.regexp_replace(
                           F.lower(F.col(text_col)), r"[^\p{L}]+", " "),
                           " ")).alias("w"))
             .filter(F.col("w") != ""))
    padded = words.select("lang", F.concat(F.lit("_"), F.col("w"),
                                           F.lit("_")).alias("p"))
    grams = padded.select("lang", F.explode(F.expr(
        "transform(sequence(1, length(p) - 2), i -> substring(p, i, 3))"
    )).alias("ngram"))
    counted = (grams.groupBy("lang", "ngram")
               .agg(F.count("*").cast("long").alias("n")))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("ngram"))
    return (counted.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("lang", "ngram", "n", "rank"))


def profile_to_counter(rows) -> Counter:
    """Collected profile rows (for one language) → identifier Counter."""
    return Counter({r["ngram"]: int(r["n"]) for r in rows})
