"""Text analysis over a documents table — 100% native Spark SQL functions.

Counterpart intent: the reference's text post-processing/classifier layer
(outlink regex + summary, parser/ParserPostProcessor.java:51-69;
3-gram language profiling, language/ProfilingWriter.java:66-94), widened
to the quality/token/fingerprint features a training-data pipeline needs.

Scale notes (100 TB):
- Every function here is a narrow per-row projection (no shuffle) except
  the corpus profiles, which are a single partial-aggregatable groupBy —
  map-side combine keeps the shuffle at |vocab| not |corpus|.
- No Python UDFs anywhere in this module: everything stays inside
  whole-stage codegen, so the scan → project pipeline is one JVM stage
  with full predicate pushdown and column pruning.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# small default stopword list (deterministic; mirrors the spirit of the
# reference's per-language ngram profiles without shipping a model)
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "on")

_WS = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the reference's word-boundary notion in
    ProfilingWriter: runs of non-separator chars)."""
    return F.split(F.trim(col), _WS)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", token_count(F.col(text_col)))


def quality_features(df: DataFrame, text_col: str = "text",
                     stopwords=STOPWORDS) -> DataFrame:
    """Integer quality-signal columns (exact, hash-stable — no float
    ratios; ratios are derivable downstream).

    n_chars_text  length in characters
    n_bytes_text  length in UTF-8 bytes (CJK-aware size signal)
    n_tokens      whitespace tokens
    n_alpha       ascii-letter chars
    n_digit       digit chars
    n_punct       ascii punctuation chars
    n_stopwords   tokens in the stopword list
    max_token_len longest token (gibberish / base64 blob signal)
    """
    text = F.col(text_col)
    toks = tokens(text)
    sw = F.array([F.lit(s) for s in stopwords])
    return (df
            .withColumn("n_chars_text", F.length(text))
            .withColumn("n_bytes_text", F.octet_length(text))
            .withColumn("n_tokens", F.size(toks))
            .withColumn("n_alpha", F.length(
                F.regexp_replace(text, "[^A-Za-z]", "")))
            .withColumn("n_digit", F.length(
                F.regexp_replace(text, "[^0-9]", "")))
            .withColumn("n_punct", F.length(F.regexp_replace(
                text, r"[^!-/:-@\[-`{-~]", "")))
            .withColumn("n_stopwords", F.size(
                F.filter(toks, lambda t: F.array_contains(sw, t))))
            .withColumn("max_token_len", F.coalesce(
                F.array_max(F.transform(toks, F.length)), F.lit(0))))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints:

    fp_md5  content hash of the whitespace-normalized text (exact-dup key)
    fp_64   64-bit xxhash of the same (compact join/bucket key at scale —
            8 bytes shuffled instead of 32)
    """
    norm = F.regexp_replace(F.trim(F.col(text_col)), _WS, " ")
    return (df.withColumn("fp_md5", F.md5(norm))
              .withColumn("fp_64", F.xxhash64(norm)))


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column (native, no UDF).

    Building block for n-gram Jaccard dedup and MinHash signatures.
    Documents with fewer than k tokens yield an **empty** array (not a
    singleton whole-text shingle) so Jaccard over shingle sets agrees
    with the standard SQL n-gram formulation: two short docs share no
    shingles and never pair.
    """
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.size(toks) - k)

    def make(i):
        return F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int"))
                                  for j in range(k)])
    return F.when(F.size(toks) >= k,
                  F.array_distinct(F.transform(idx, make))
                  ).otherwise(F.array().cast("array<string>"))


def word_topk(df: DataFrame, k: int = 20, text_col: str = "text",
              by: str | None = None) -> DataFrame:
    """Corpus word-frequency profile (the reference's profile-builder
    aggregation, language/LanguageProfilerBuilder.java, mapped to words):
    explode → groupBy → count → top-k, deterministic tie-break on word.

    Scale: partial aggregation (map-side combine) bounds the shuffle at
    vocabulary size; the top-k is a single reduction over |vocab| rows.
    """
    words = df.select(
        *( [F.col(by)] if by else [] ),
        F.explode(tokens(F.col(text_col))).alias("word"))
    keys = ([by] if by else []) + ["word"]
    counts = words.groupBy(*keys).agg(F.count("*").alias("n"))
    order = [F.desc("n"), F.asc("word")]
    if by:
        w = Window.partitionBy(by).orderBy(*order)
        return (counts.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k).drop("rank"))
    return counts.orderBy(*order).limit(k)


def outlinks(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Outlink harvest over plain text — the reference's post-processor
    regex (utils/RegexUtils.java:40-48) as a native regexp_extract_all."""
    pat = r"(https?://[^\s\"<>]+)"
    return df.withColumn("outlinks",
                         F.regexp_extract_all(F.col(text_col), F.lit(pat), 1))


def summary(df: DataFrame, text_col: str = "text",
            n: int = 500) -> DataFrame:
    """First-n-chars summary (ParserPostProcessor.java:62-64)."""
    return df.withColumn("summary", F.substring(F.col(text_col), 1, n))


def cap_per_group(df: DataFrame, group_col: str, k: int,
                  order_by: list | None = None) -> DataFrame:
    """Per-group document cap — the crawl-curation "at most k pages
    per host" rule (no reference counterpart; standard training-data
    curation over Common-Crawl-style tables).

    Deterministic: rows ranked inside each group by ``order_by``
    (default: descending n_chars, then doc_id for a total order) and
    rows ranked > k dropped.

    Scale: one hash-partition shuffle on ``group_col`` + a window
    row_number — no global sort. Hosts are high-cardinality on a real
    crawl so the shuffle is well-spread; a pathological single-host
    skew is bounded by AQE skew-join splitting or a pre-filter on
    approx counts (count-min over hosts) before the exact window.
    """
    from pyspark.sql import Window
    order = order_by or [F.desc("n_chars"), F.asc("doc_id")]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (df.withColumn("rank", F.row_number().over(w))
              .filter(F.col("rank") <= k)
              .drop("rank"))


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict, key_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Deterministic per-stratum sampling — language/domain quota
    sampling for training-data mixes.

    Instead of rand() (irreproducible across retries — a correctness
    hazard for resumable 100 TB jobs), the sampling decision is a pure
    function of the row key: the first 8 hex digits of md5(key) as a
    uniform draw in [0, 1). A row survives iff draw < rate[stratum].

    Scale: zero shuffles — a narrow filter the optimizer pushes to the
    scan; rates broadcast in the plan as a literal CASE.
    """
    draw = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")),
                               1, 8), 16, 10).cast("double")
            / F.lit(float(0x100000000)))
    rate = F.lit(default_rate)
    for stratum, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == stratum,
                      F.lit(float(r))).otherwise(rate)
    return df.filter(draw < rate)


def assign_splits(df: DataFrame, fractions: dict[str, float],
                  key_col: str = "doc_id", salt: str = "") -> DataFrame:
    """Deterministic train/val/test assignment — the corpus-
    finalization step before packing/export.

    The split is a pure function of md5(key || salt): the first 8 hex
    digits as a 32-bit draw, compared against INTEGER cumulative
    thresholds floor(cum_fraction × 2^32) in the given band order —
    exact and engine-independent (no float comparison), reproducible
    across retries/partitionings, and re-rollable by changing
    ``salt``. Rows beyond the bands (fractions summing < 1) get
    'unassigned'.

    Scale: zero shuffles — a narrow per-row projection in the scan
    stage; downstream per-split reads filter on the column
    (partition the written table by it).
    """
    draw = F.conv(F.substring(
        F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt))),
        1, 8), 16, 10).cast("long")
    expr = None
    for name, thresh in split_thresholds(fractions):
        cond = draw < F.lit(thresh)
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    expr = (F.lit("unassigned") if expr is None
            else expr.otherwise(F.lit("unassigned")))
    return df.withColumn("split", expr)


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """The integer 32-bit band thresholds `assign_splits` compares
    against — exported so an oracle/replay can embed the IDENTICAL
    literals (float cumulation happens exactly once, here)."""
    cum = 0.0
    out = []
    for name, frac in fractions.items():
        cum += frac
        out.append((name, min(int(cum * 0x100000000), 0x100000000)))
    return out


# GPT-2-style pre-tokenizer pattern, ASCII form: contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs. Kept to
# RE2-compatible syntax (no lookaround) so the same pattern runs in
# Spark (Java regex) and the DuckDB oracle byte-for-byte.
BPE_TOKEN_PATTERN = (
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+")


def bpe_tokens(col: Column) -> Column:
    """BPE-ish pre-tokenization (whitespace attaches to the following
    token, contractions split) — the subword-budget estimator a
    training-data pipeline runs before the real tokenizer."""
    return F.regexp_extract_all(col, F.lit(BPE_TOKEN_PATTERN), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col))


def winnow_fingerprints(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        w: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    MOSS): hash every positional k-word shingle, slide a w-wide window
    over the hash sequence, keep each window's minimum — a rolling
    fingerprint set that is robust to local edits and guarantees any
    shared run of >= w+k-1 words produces a shared fingerprint.

    All native SQL: positional shingles via transform over an index
    sequence, a 32-bit md5-prefix hash (the same cross-engine hash the
    sampling operator uses), window-min per document. Only full
    windows select (standard winnowing); docs shorter than k+w-1
    tokens contribute nothing.

    Scale: ZERO shuffles before the final distinct — the whole
    winnowing computation (shingle, hash, sliding window-min, dedup)
    is one per-row array expression, so the plan is scan → project →
    explode → distinct. The alternative posexplode+window formulation
    would shuffle every shingle of every document on ``id_col``; at
    crawl scale that is the corpus token count. Fingerprints are
    8-byte ints — the text never shuffles. Downstream near-dup
    candidate generation is a groupBy(fp) equi-join, same shape as
    the MinHash band join.
    """
    toks = tokens(F.col(text_col))
    idx = F.when(
        F.size(toks) >= k,
        F.sequence(F.lit(0), F.size(toks) - k)
    ).otherwise(F.array().cast("array<int>"))

    def shingle(i):
        return F.concat_ws(" ", *[
            F.element_at(toks, (i + j + 1).cast("int"))
            for j in range(k)])

    hashes = F.transform(
        idx, lambda i: F.conv(F.substring(F.md5(shingle(i)), 1, 8),
                              16, 10).cast("long"))
    # stage the hash array so Catalyst doesn't re-derive the shingles
    # per window (the MinHash CollapseProject lesson)
    staged = df.select(F.col(id_col), hashes.alias("hs"))
    n = F.size(F.col("hs"))
    windows = F.when(
        n >= w,
        F.sequence(F.lit(1), n - w + 1)
    ).otherwise(F.array().cast("array<int>"))
    fps = F.array_distinct(F.transform(
        windows,
        lambda j: F.array_min(F.slice(F.col("hs"), j, w))))
    return (staged.select(F.col(id_col), F.explode(fps).alias("fp"))
            .distinct())


def bm25_scores(df: DataFrame, query: str, k1: float = 1.2,
                b: float = 0.75, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Corpus BM25 relevance scores for a query string (Robertson /
    Sparck Jones probabilistic relevance, the Okapi BM25 form) — the
    retrieval scorer a curation pipeline uses to mine domain-relevant
    subsets ("pages about X") out of a crawl.

      idf_t  = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)
      s(d)   = sum_t idf_t * tf / (tf + k1*(1 - b + b*dl/avgdl))
               * (k1 + 1)

    Emits (id, score_micro) for documents matching >= 1 query term.

    Plan shape: per-doc term frequencies are per-row array
    expressions over the handful of query terms (no explode of the
    corpus vocabulary); the corpus statistics (N, avgdl, one df per
    query term) are ONE partial-aggregatable agg row, broadcast back
    by a cross join; scoring is then a map-only projection. Nothing
    but the stats row ever shuffles — at 100 TB this is one scan +
    one scalar-sized exchange. Scores are micro-rounded longs so the
    cross-engine oracle compares exactly.
    """
    terms = []
    for t in query.lower().split():
        if t and t not in terms:
            terms.append(t)
    if not terms:  # empty query matches nothing
        return (df.select(F.col(id_col).alias("id"),
                          F.lit(0).cast("long").alias("score_micro"))
                .filter(F.lit(False)))
    low = F.transform(tokens(F.col(text_col)), F.lower)

    def tf_of(term):
        # one-arg lambda: a second parameter would be read by
        # F.filter as the element INDEX, not a closure slot
        return F.size(F.filter(low, lambda x: x == F.lit(term)))

    d = df.select(
        F.col(id_col).alias("id"),
        F.size(low).cast("double").alias("dl"),
        *[tf_of(t).cast("double").alias(f"tf_{i}")
          for i, t in enumerate(terms)])
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf_{i}") > 0).cast("double"))
          .alias(f"df_{i}") for i in range(len(terms))])

    scored = d.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl"))
    score = F.lit(0.0)
    for i in range(len(terms)):
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5)) + F.lit(1.0))
        score = score + idf * (F.col(f"tf_{i}") * F.lit(k1 + 1.0)
                               / (F.col(f"tf_{i}") + norm))
    return (scored
            .filter(sum((F.col(f"tf_{i}") > 0).cast("int")
                        for i in range(len(terms))) > 0)
            .select("id", F.round(score * 1_000_000).cast("long")
                    .alias("score_micro")))


def tfidf_keywords(df: DataFrame, k: int = 5, id_col: str = "doc_id",
                   text_col: str = "text",
                   min_len: int = 3) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf — the
    per-document complement of :func:`word_topk` (corpus-level) and
    :func:`bm25_scores` (query-level): document fingerprint keywords
    for clustering labels, dedup explanation, and topic census.

      idf_t        = ln((N + 1) / (df_t + 1))        (smoothed)
      score(d, t)  = tf(d, t) * round(idf_t * 1e6)   (BIGINT)

    Rank within a document is (score desc, term asc) — fully
    deterministic; the float ln is micro-rounded once per TERM before
    the integer multiply, the same cross-engine hazard class (1-ulp
    ln) the bm25/lm oracles pin.

    Emits (id, term, tf, score_micro, rk), rk = 1..k.

    Plan shape: one explode + groupBy(id, term) for tf; document
    frequencies are a groupBy(term) over the tf table (already one
    row per (id, term)); N folds back as a one-row crossJoin; the
    final per-doc top-k is a row_number window partitioned by id —
    three key-partitioned shuffles, no driver collect, no all-pairs
    anything. At 100 TB the vocabulary join is term-keyed and
    AQE-broadcastable when the vocab is small.
    """
    low = F.filter(F.transform(tokens(F.col(text_col)), F.lower),
                   lambda x: F.length(x) >= min_len)
    tf = (df.select(F.col(id_col).alias("id"),
                    F.explode(low).alias("term"))
          .groupBy("id", "term")
          .agg(F.count("*").cast("long").alias("tf")))
    dft = tf.groupBy("term").agg(F.count("*").cast("long").alias("dft"))
    n = df.agg(F.count("*").cast("long").alias("n_docs"))
    idf = (dft.crossJoin(F.broadcast(n))
           .select("term",
                   F.round(F.log((F.col("n_docs") + F.lit(1.0))
                                 / (F.col("dft") + F.lit(1.0)))
                           * 1_000_000).cast("long")
                   .alias("idf_micro")))
    scored = (tf.join(idf, "term")
              .select("id", "term", "tf",
                      (F.col("tf") * F.col("idf_micro"))
                      .cast("long").alias("score_micro")))
    w = Window.partitionBy("id").orderBy(
        F.desc("score_micro"), F.asc("term"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("id", "term", "tf", "score_micro", "rk"))


def corpus_report(df: DataFrame, text_col: str = "text",
                  lang_col: str = "lang",
                  source_col: str = "source") -> DataFrame:
    """Corpus datasheet (Gebru et al. 2021, "Datasheets for
    Datasets" — the composition section, mechanized): one tidy
    (metric, grp, value) table holding the global counts and the
    per-language / per-source breakdowns every corpus release
    documents:

      docs_total/chars_total/tokens_total   ('all')
      docs_by_lang, chars_by_lang,
      avg_chars_by_lang_micro               (per language)
      docs_by_source, tokens_by_source      (per source)

    Averages are integer micro-units via div, so the report is
    engine-exact. Scale: three partial-aggregatable groupBys over
    scalar projections; output is breakdown-table sized.
    """
    base = df.select(
        F.col(lang_col).alias("lang"),
        F.col(source_col).alias("source"),
        F.length(text_col).cast("long").alias("nc"),
        F.size(tokens(F.col(text_col))).cast("long").alias("nt"))

    def rows(metric, grp, value):
        return (metric.alias("metric"), grp.alias("grp"),
                value.cast("long").alias("value"))

    tot = base.agg(F.count("*").alias("d"), F.sum("nc").alias("c"),
                   F.sum("nt").alias("t"))
    g_all = (tot.select(*rows(F.lit("docs_total"), F.lit("all"),
                             F.col("d")))
             .unionByName(tot.select(*rows(F.lit("chars_total"),
                                          F.lit("all"),
                                          F.col("c"))))
             .unionByName(tot.select(*rows(F.lit("tokens_total"),
                                          F.lit("all"),
                                          F.col("t")))))
    by_lang = base.groupBy("lang").agg(
        F.count("*").alias("d"), F.sum("nc").alias("c"))
    g_lang = (by_lang.select(*rows(F.lit("docs_by_lang"),
                                  F.col("lang"), F.col("d")))
              .unionByName(by_lang.select(*rows(
                  F.lit("chars_by_lang"), F.col("lang"),
                  F.col("c"))))
              .unionByName(by_lang.select(*rows(
                  F.lit("avg_chars_by_lang_micro"), F.col("lang"),
                  F.expr("c * 1000000 div d")))))
    by_src = base.groupBy("source").agg(
        F.count("*").alias("d"), F.sum("nt").alias("t"))
    g_src = (by_src.select(*rows(F.lit("docs_by_source"),
                                F.col("source"), F.col("d")))
             .unionByName(by_src.select(*rows(
                 F.lit("tokens_by_source"), F.col("source"),
                 F.col("t")))))
    return g_all.unionByName(g_lang).unionByName(g_src)


def inverted_index(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text"
                   ) -> tuple[DataFrame, DataFrame]:
    """Build-once search index: ``(postings, doclens)`` with
    postings = (term, id, tf) and doclens = (id, dl). One corpus
    scan; the postings groupBy shuffles (term, id) pairs with
    map-side combine — the standard inverted-index build. Persist
    both (e.g. into the snapshot table layer, bucketed by term) and
    :func:`bm25_indexed` answers queries WITHOUT rescanning the
    corpus — the index-once / query-many shape
    :func:`bm25_scores`'s single-scan form deliberately avoids."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens(F.col(text_col)), F.lower).alias("w"))
    doclens = base.select("id", F.size("w").cast("long").alias("dl"))
    postings = (base.select("id", F.explode("w").alias("term"))
                .filter(F.col("term") != "")
                .groupBy("term", "id")
                .agg(F.count("*").cast("long").alias("tf")))
    return postings, doclens


def bm25_indexed(postings: DataFrame, doclens: DataFrame,
                 query: str, k1: float = 1.2,
                 b: float = 0.75) -> DataFrame:
    """BM25 over a prebuilt :func:`inverted_index`: only the query
    terms' postings rows move (predicate pushdown on ``term``), the
    corpus text is never touched. Per-term contributions round to
    integer micro-units BEFORE the per-doc sum, so the aggregation
    is order-independent and cross-engine exact (the lm_perplexity
    discipline; consequently scores can differ from
    :func:`bm25_scores` by ±1 micro per term — a documented
    rounding-order choice, not a formula difference).

    Emits (id, n_terms_hit, score_micro) for docs hitting >= 1 term.
    """
    terms = []
    for t in query.lower().split():
        if t and t not in terms:
            terms.append(t)
    if not terms:
        return (doclens.select(
            "id", F.lit(0).cast("long").alias("n_terms_hit"),
            F.lit(0).cast("long").alias("score_micro"))
            .filter(F.lit(False)))
    p = postings.filter(F.col("term").isin(terms))
    stats = doclens.agg(F.count("*").cast("double").alias("n_docs"),
                        F.avg("dl").alias("avgdl"))
    dfs = p.groupBy("term").agg(
        F.count("*").cast("double").alias("df_t"))
    scored = (p.join(doclens, "id")
              .join(F.broadcast(dfs), "term")
              .crossJoin(F.broadcast(stats)))
    idf = F.log((F.col("n_docs") - F.col("df_t") + F.lit(0.5))
                / (F.col("df_t") + F.lit(0.5)) + F.lit(1.0))
    norm = F.lit(k1) * (F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl"))
    contrib = F.round(
        idf * (F.col("tf") * F.lit(k1 + 1.0)
               / (F.col("tf") + norm)) * 1_000_000).cast("long")
    return (scored.select("id", contrib.alias("c"))
            .groupBy("id")
            .agg(F.count("*").cast("long").alias("n_terms_hit"),
                 F.sum("c").cast("long").alias("score_micro")))


def hash_embed(df: DataFrame, dim: int = 16, n: int = 3,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Model-free text embeddings by the hashing trick (signed
    random projection of character n-gram counts): one md5 per
    n-gram, dimension j's sign = parity of digest byte j, embedding
    = integer sign-sums. Output one row per (id, dim) with the exact
    integer value, so the result is hash-checkable cross-engine (the
    oracle recomputes the same md5 parities in SQL).

    This is the embedding GENERATOR for corpora that arrive without
    vectors: deterministic, vocabulary-free, map-only (no shuffle
    before the per-doc aggregation), and the output feeds the
    existing ANN / SemDeDup operators. Signed n-gram hashing
    approximates n-gram-profile cosine (the feature space of G1's
    language profiles) at fixed dimensionality — the standard
    hashing-trick construction (Weinberger et al. 2009, feature
    hashing; SimHash's signed-sum is the 1-bit special case).
    ``dim`` <= 16 keeps one digest per gram."""
    if not 1 <= dim <= 16:
        raise ValueError("dim must be 1..16 (one md5 digest)")
    import hashlib
    from collections.abc import Iterator

    slim = df.select(F.col(id_col).alias("id"),
                     F.col(text_col).alias("text"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dims, vals = [], [], []
            for i, text in zip(pdf["id"], pdf["text"]):
                text = text or ""
                acc = [0] * dim
                for p in range(len(text) - n + 1):
                    dg = hashlib.md5(
                        text[p:p + n].encode("utf-8")).digest()
                    for j in range(dim):
                        acc[j] += 1 if dg[j] & 1 else -1
                for j in range(dim):
                    ids.append(i)
                    dims.append(j)
                    vals.append(acc[j])
            yield pd.DataFrame({"id": ids, "dim": dims, "val": vals})

    return slim.mapInPandas(run, schema="id long, dim int, val long")
