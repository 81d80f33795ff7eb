"""Web-corpus curation operators — repetition signals, paragraph-level
corpus dedup, URL canonicalization, PII scrubbing, benchmark
contamination checks.

These are the filters a Common-Crawl-scale training-data pipeline runs
after extraction (the Gopher/C4/CCNet-published recipe), expressed as
native Spark SQL so the whole pack stays inside whole-stage codegen —
no Python UDFs anywhere in this module.

Scale notes (100 TB):
- ``repetition_features`` is a pure per-row projection (zero shuffle).
  The duplicate-line and top-bigram statistics are computed with
  sorted-array run-length expressions — O(n log n) per document, no
  explode, no per-doc groupBy.
- ``paragraph_dedup`` shuffles (hash64, position) pairs plus one copy
  of each paragraph's text for reassembly — never the full document
  twice. The counting groupBy is partial-aggregatable (map-side
  combine on 8-byte keys); the membership join is on the 8-byte hash.
- ``contamination_check`` broadcasts the benchmark n-gram set (a
  benchmark suite is ~10^5-10^6 grams — megabytes), so the corpus
  side is a map-only semi-join probe.
- ``canonical_url`` / ``pii_scrub`` are regexp projections (per-row,
  codegen'd, shuffle-free).
- ``snapshot_delta_dedup`` joins fingerprints only (8/16-byte keys) —
  the recurring-crawl path that never re-reads old text.
- ``normalize_text`` is a regexp chain with a single Arrow-batch NFC
  hop gated behind an ASCII fast-path.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import LongType, StructField, StructType

from tika_spark.analysis.textstats import fingerprint, tokens, word_shingles

# ----------------------------------------------------- repetition --


def _nonempty_lines(col: Column) -> Column:
    return F.filter(F.split(col, "\n"), lambda x: x != F.lit(""))


def repetition_features(df: DataFrame, text_col: str = "text"
                        ) -> DataFrame:
    """Gopher-style repetition signals, exact-integer columns:

    n_lines            non-empty lines
    n_uniq_lines       distinct non-empty lines
    dup_line_chars     chars in lines whose text occurs >= 2x in the
                       doc (all occurrences counted — the numerator of
                       Gopher's duplicate-line-character fraction)
    top_2gram          most frequent token bigram (ties: smallest)
    top_2gram_n        its occurrence count
    top_2gram_chars    count * chars(bigram) (numerator of the
                       top-n-gram character fraction)

    Implementation: sort the line/bigram arrays once, then run-length
    expressions over adjacent equal elements — per-row, shuffle-free.
    """
    text = F.col(text_col)
    out = df.withColumn("_lines", F.sort_array(_nonempty_lines(text)))
    out = out.withColumn("n_lines",
                         F.size("_lines").cast("long"))
    out = out.withColumn("n_uniq_lines",
                         F.size(F.array_distinct("_lines"))
                         .cast("long"))
    # char mass of elements equal to a neighbour in the sorted array
    out = out.withColumn("dup_line_chars", F.expr(
        "aggregate(transform(_lines, (e, i) -> CASE WHEN "
        "(i > 0 AND element_at(_lines, i) = e) OR "
        "(i < size(_lines) - 1 AND element_at(_lines, i + 2) = e) "
        "THEN length(e) ELSE 0 END), 0L, (acc, x) -> acc + x)"))
    toks = tokens(text)
    out = out.withColumn("_grams", F.sort_array(F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b))))
    # longest run in the sorted bigram array; first (= smallest) on ties
    out = out.withColumn("_top", F.expr(
        "aggregate(_grams, "
        "struct(cast('' as string) AS prev, 0L AS run, "
        "       0L AS best_n, cast('' as string) AS best_g), "
        "(s, g) -> CASE WHEN g = s.prev "
        "  THEN CASE WHEN s.run + 1L > s.best_n "
        "    THEN struct(g AS prev, s.run + 1L AS run, "
        "                s.run + 1L AS best_n, g AS best_g) "
        "    ELSE struct(g AS prev, s.run + 1L AS run, "
        "                s.best_n AS best_n, s.best_g AS best_g) END "
        "  ELSE CASE WHEN 1L > s.best_n "
        "    THEN struct(g AS prev, 1L AS run, 1L AS best_n, "
        "                g AS best_g) "
        "    ELSE struct(g AS prev, 1L AS run, s.best_n AS best_n, "
        "                s.best_g AS best_g) END END)"))
    out = (out
           .withColumn("top_2gram", F.col("_top.best_g"))
           .withColumn("top_2gram_n", F.col("_top.best_n"))
           .withColumn("top_2gram_chars",
                       (F.col("_top.best_n") *
                        F.length("_top.best_g")).cast("long"))
           .drop("_lines", "_grams", "_top"))
    return out


# ------------------------------------------- paragraph-level dedup --


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """CCNet-style corpus-level paragraph dedup.

    Splits each document into non-empty lines ("paragraphs"), counts
    how many documents each paragraph appears in across the whole
    corpus, and rebuilds the text keeping only paragraphs unique to a
    single document. Emits, per document:

    n_paras     paragraphs before dedup
    n_shared    paragraphs that also occur in some other document
    text_clean  the surviving paragraphs, original order, LF-joined

    Shuffle profile: the count groupBy moves (hash64, doc-distinct)
    8-byte keys with map-side combine; the membership join is
    hash-to-hash; paragraph text travels exactly once into the
    reassembly groupBy. (xxhash64 collisions would merge unrelated
    paragraphs; at 2^64 that is negligible against corpus sizes.)
    """
    paras = (df
             .select(F.col(id_col),
                     F.posexplode(_nonempty_lines(F.col(text_col)))
                     .alias("pos", "para"))
             .withColumn("h", F.xxhash64("para")))
    # docs-per-paragraph (count each doc once even on repeats inside it)
    counts = (paras.select(id_col, "h").distinct()
              .groupBy("h").agg(F.count("*").alias("n_docs")))
    joined = paras.join(counts, "h")
    return (joined
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_paras"),
                 F.sum((F.col("n_docs") > 1).cast("long"))
                 .alias("n_shared"),
                 F.concat_ws("\n", F.transform(
                     F.array_sort(F.collect_list(F.when(
                         F.col("n_docs") == 1,
                         F.struct("pos", "para")))),
                     lambda s: s["para"])).alias("text_clean")))


def host_boilerplate_removal(df: DataFrame, id_col: str = "doc_id",
                             host_col: str = "source",
                             text_col: str = "text",
                             min_docs: int = 3) -> DataFrame:
    """Host-conditioned boilerplate line removal — the within-site
    complement of :func:`paragraph_dedup`: a line appearing on
    ``min_docs``+ distinct pages OF THE SAME HOST is site furniture
    (nav, cookie banner, footer) and is stripped from every page of
    that host; the same line on another host is untouched (a
    genuine quotation shared across sites is not furniture).

    Emits (id, n_lines, n_boiler, text_clean) with surviving lines
    in original order. Shuffle profile mirrors paragraph_dedup with
    (host, hash64) keys: counts move 8-byte hashes with map-side
    combine, the membership join is hash-to-hash, line text travels
    once into the reassembly groupBy — never the full corpus twice.
    """
    paras = (df
             .select(F.col(id_col), F.col(host_col).alias("__host"),
                     F.posexplode(_nonempty_lines(F.col(text_col)))
                     .alias("pos", "para"))
             .withColumn("h", F.xxhash64("para")))
    counts = (paras.select(id_col, "__host", "h").distinct()
              .groupBy("__host", "h")
              .agg(F.count("*").alias("n_docs")))
    joined = paras.join(counts, ["__host", "h"])
    boiler = F.col("n_docs") >= min_docs
    return (joined
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_lines"),
                 F.sum(boiler.cast("long")).alias("n_boiler"),
                 F.concat_ws("\n", F.transform(
                     F.array_sort(F.collect_list(F.when(
                         ~boiler, F.struct("pos", "para")))),
                     lambda s: s["para"])).alias("text_clean")))


# --------------------------------------------- URL canonicalization --

_TRACKING = "(utm_[A-Za-z0-9]+|fbclid|gclid|msclkid|mc_eid)"


def canonical_url(col: Column) -> Column:
    """Crawl-frontier URL canonicalization:

    - drop the fragment,
    - drop tracking query params (utm_*, fbclid, gclid, ...),
    - lowercase scheme and host,
    - strip default ports (:80 for http, :443 for https),
    - collapse the artifacts ("?&", "&&", trailing "?"/"&").

    Pure regexp chain — stays in codegen, no UDF.
    """
    u = F.regexp_replace(col, "#.*$", "")
    u = F.regexp_replace(u, "([?&])" + _TRACKING + "=[^&#]*", "$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, "&&+", "&")
    u = F.regexp_replace(u, "[?&]$", "")
    # lowercase scheme://host[:port] (authority only, never the path)
    head = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://"
                                       "[^/?#]*)", 1))
    tail = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*",
                            "")
    u = F.concat(head, tail)
    u = F.regexp_replace(u, "^(http://[^/?#:]*):80(?=[/?#]|$)", "$1")
    u = F.regexp_replace(u, "^(https://[^/?#:]*):443(?=[/?#]|$)", "$1")
    return u


def url_host(col: Column) -> Column:
    """Registered host of a canonical URL (port stripped, lowercase)."""
    return F.regexp_replace(
        F.lower(F.regexp_extract(col, "^[A-Za-z][A-Za-z0-9+.-]*://"
                                      "([^/?#]*)", 1)),
        ":[0-9]+$", "")


def host_rollup(df: DataFrame, url_col: str = "url",
                chars_col: str = "n_chars") -> DataFrame:
    """Per-host corpus stats (the crawl-politeness / domain-quality
    aggregate): doc count + total chars. One partial-aggregatable
    groupBy on the host string."""
    return (df
            .withColumn("host", url_host(F.col(url_col)))
            .groupBy("host")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(chars_col).cast("long").alias("total_chars")))


# ------------------------------------------------------ PII scrub --

_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_IPV4 = r"\b((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}" \
        r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace emails / IPv4 literals with placeholder tokens and
    count what was removed (the FineWeb-style PII pass):

    n_emails, n_ipv4   occurrences removed
    text_scrubbed      text with <EMAIL> / <IP> placeholders
    """
    text = F.col(text_col)
    return (df
            .withColumn("n_emails",
                        F.regexp_count(text, F.lit(_EMAIL))
                        .cast("long"))
            .withColumn("n_ipv4",
                        F.regexp_count(text, F.lit(_IPV4)).cast("long"))
            .withColumn("text_scrubbed", F.regexp_replace(
                F.regexp_replace(text, _EMAIL, "<EMAIL>"),
                _IPV4, "<IP>")))


_PHONE = r"\+[0-9]{1,3}([ -][0-9]{2,4}){2,4}"
_CARD = r"[0-9]{4}([ -]?[0-9]{4}){3}"


def _luhn_valid(cand: Column) -> Column:
    """Luhn checksum as a native array expression: strip separators,
    double every second digit from the right (−9 overflow), sum
    mod 10 == 0. No UDF — rides in codegen and replays in SQL."""
    s = F.regexp_replace(cand, "[ -]", "")
    n = F.length(s)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc + F.when(
            (n - i) % 2 == 1,
            F.when((F.ascii(s.substr(i.cast("int"), F.lit(1)))
                    - 48) * 2 > 9,
                   (F.ascii(s.substr(i.cast("int"), F.lit(1)))
                    - 48) * 2 - 9)
            .otherwise((F.ascii(s.substr(i.cast("int"), F.lit(1)))
                        - 48) * 2))
        .otherwise(F.ascii(s.substr(i.cast("int"), F.lit(1))) - 48))
    return total % 10 == 0


def pii_scrub_extended(df: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """:func:`pii_scrub` plus international phone numbers and
    Luhn-verified payment-card numbers — the card gate is the point:
    a 16-digit string only scrubs when its Luhn checksum passes, so
    order ids and timestamps that merely LOOK card-shaped survive.
    Phones are the conservative ``+CC``-prefixed form (RE2-safe — no
    lookarounds, so the oracle replays the exact pattern).

    Emits n_emails, n_ipv4, n_phones, n_cards, text_scrubbed with
    <EMAIL>/<IP>/<PHONE>/<CARD> placeholders. All native regexp +
    array-fold expressions: zero UDFs, zero shuffle.
    """
    text = F.col(text_col)
    after_basic = F.regexp_replace(
        F.regexp_replace(text, _EMAIL, "<EMAIL>"), _IPV4, "<IP>")
    after_phone = F.regexp_replace(after_basic, _PHONE, "<PHONE>")
    cards = F.array_distinct(
        F.regexp_extract_all(after_phone, F.lit(_CARD), 0))
    valid = F.filter(cards, _luhn_valid)
    scrubbed = F.aggregate(
        valid, after_phone,
        lambda acc, c: F.replace(acc, c, F.lit("<CARD>")))
    n_cards = F.aggregate(
        valid, F.lit(0),
        lambda acc, c: acc + F.size(F.split(after_phone, c)) - 1)
    return (df
            .withColumn("n_emails",
                        F.regexp_count(text, F.lit(_EMAIL))
                        .cast("long"))
            .withColumn("n_ipv4",
                        F.regexp_count(text, F.lit(_IPV4))
                        .cast("long"))
            .withColumn("n_phones",
                        F.regexp_count(after_basic, F.lit(_PHONE))
                        .cast("long"))
            .withColumn("n_cards", n_cards.cast("long"))
            .withColumn("text_scrubbed", scrubbed))


# -------------------------------------- incremental snapshot dedup --


def snapshot_delta_dedup(new_df: DataFrame, seen: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Incremental crawl-snapshot dedup: which documents of snapshot
    N+1 are genuinely new against the accumulated corpus.

    ``seen`` is the prior corpus's fingerprint index — one row per
    already-kept document carrying (fp_64, fp_md5) as produced by
    :func:`tika_spark.analysis.textstats.fingerprint`. This is how a
    recurring crawl dedups without ever re-scanning old text: the
    index is ~24 bytes/doc (16 TB at 10^12 docs, vs the 100 TB+
    corpus), stored bucketed by fp_64 so the anti-join needs no
    index-side shuffle. Two passes, both on fingerprint keys only:

    1. drop snapshot rows whose fingerprint already exists in ``seen``
       (left_anti join — no text ever shuffles),
    2. exact-dedup within the snapshot itself (lowest id wins, same
       window as :func:`tika_spark.analysis.dedup.exact_dedup`).

    Emits (id, fp_md5, fp_64) for the survivors — exactly the rows to
    append to the index before snapshot N+2.
    """
    fp = fingerprint(new_df.select(id_col, text_col), text_col)
    fresh = fp.join(seen.select("fp_64", "fp_md5"),
                    ["fp_64", "fp_md5"], "left_anti")
    w = Window.partitionBy("fp_64", "fp_md5").orderBy(F.asc(id_col))
    return (fresh.withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") == 1)
                 .select(id_col, "fp_md5", "fp_64"))


# ------------------------------------------- text normalization --

# C0 controls except TAB/LF, plus DEL — removed outright
_CTRL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode + whitespace normalization — the pre-tokenization
    cleanup pass between extraction and dedup/tokenize (composed
    NFC so 'e'+COMBINING ACUTE and 'é' fingerprint identically):

    - NFC composition,
    - CRLF / CR → LF,
    - C0 control chars (except TAB and LF) and DEL removed,
    - TAB and space runs → a single space,
    - spaces trimmed around newlines,
    - 3+ consecutive newlines → 2 (one blank line),
    - leading/trailing whitespace trimmed.

    Emits ``text_norm`` alongside the input columns.

    Scale: everything except NFC is a codegen'd regexp chain. NFC
    needs Python (no JVM-side normalizer in Spark SQL), so the input
    is **filter-split**: the ASCII rows (NFC is the identity there —
    the overwhelming majority of a web corpus) take a pure-JVM leg,
    and only the non-ASCII leg pays the Arrow→Python hop, unioned
    back after. A ``when(ascii, text).otherwise(nfc(text))``
    formulation would NOT achieve this: Spark's ExtractPythonUDFs
    rule hoists the UDF below the projection and evaluates it for
    every row, with the CASE merely choosing which result to keep —
    the split is the only way to keep ASCII rows out of Python. Cost:
    the (column-pruned) text column is scanned once per leg, which
    beats Arrow-transferring 100% of it.
    """
    @F.pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda t: None if t is None
                     else unicodedata.normalize("NFC", t))

    text = F.col(text_col)
    is_ascii = text.isNull() | text.rlike("^[\\x00-\\x7f]*$")
    jvm_leg = df.filter(is_ascii).withColumn("__nfc", text)
    py_leg = df.filter(~is_ascii).withColumn("__nfc", _nfc(text))
    out = jvm_leg.unionByName(py_leg)
    t = F.col("__nfc")
    t = F.regexp_replace(t, "\r\n?", "\n")
    t = F.regexp_replace(t, _CTRL, "")
    t = F.regexp_replace(t, "[ \t]+", " ")
    t = F.regexp_replace(t, " ?\n ?", "\n")
    t = F.regexp_replace(t, "\n{3,}", "\n\n")
    t = F.regexp_replace(t, "^\\s+|\\s+$", "")
    return out.withColumn("text_norm", t).drop("__nfc")


# --------------------------------------- importance reweighting --


def hashed_grams(col: Column) -> Column:
    """Unigrams + word bigrams of a text column (the DSIR feature
    set), as one array — native, no UDF."""
    toks = tokens(col)
    k = F.greatest(F.size(toks) - 1, F.lit(0))
    bis = F.zip_with(F.slice(toks, 1, k), F.slice(toks, 2, k),
                     lambda a, b: F.concat(a, F.lit(" "), b))
    return F.concat(toks, bis)


def _gram_bucket(g: Column, buckets: int) -> Column:
    # md5-prefix hashing so the oracle can replay it exactly:
    # conv(hex, 16, 10) here == ('0x' || hex)::BIGINT in DuckDB
    return F.conv(F.substring(F.md5(g), 1, 8), 16, 10) \
        .cast("long") % buckets


def dsir_scores(raw: DataFrame, target: DataFrame,
                id_col: str = "doc_id", text_col: str = "text",
                buckets: int = 8192) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram profile is,

        log w(x) = sum over gram occurrences g of
                   log p_target[bucket(g)] - log p_raw[bucket(g)]

    with Laplace-smoothed bucket probabilities fit on the two corpora.
    Downstream selection is then a threshold or Gumbel top-k over
    ``dsir_micro`` (micro-units, exact integers so results hash
    identically everywhere).

    Scale: the fit is two partial-aggregatable groupBys over 8-byte
    bucket keys; the log-ratio table is ``buckets`` rows (KBs —
    broadcast); scoring is a map-only broadcast join + one groupBy on
    the doc id. Each corpus's grams are exploded exactly once for the
    fit (the corpus totals come from summing the tiny persisted
    bucket tables, not from separate count() passes) plus once more
    on the raw side for scoring. Raw text shuffles zero times.
    """
    from pyspark import StorageLevel

    def gram_buckets(df):
        return (df.select(
            F.col(id_col),
            F.explode(hashed_grams(F.col(text_col))).alias("g"))
            .select(id_col, _gram_bucket(F.col("g"), buckets)
                    .alias("b")))

    gt, gr = gram_buckets(target), gram_buckets(raw)
    ct = gt.groupBy("b").agg(F.count("*").alias("ct")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    cr = gr.groupBy("b").agg(F.count("*").alias("cr")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    n_t = ct.agg(F.sum("ct")).first()[0] or 0
    n_r = cr.agg(F.sum("cr")).first()[0] or 0
    ratio = (ct.join(cr, "b", "full")
             .select("b",
                     (F.log((F.coalesce("ct", F.lit(0)) + 1)
                            / F.lit(float(n_t + buckets)))
                      - F.log((F.coalesce("cr", F.lit(0)) + 1)
                              / F.lit(float(n_r + buckets))))
                     .alias("lw")))
    return (gr.join(F.broadcast(ratio), "b")
            .groupBy(id_col)
            .agg(F.round(F.sum("lw") * 1_000_000).cast("long")
                 .alias("dsir_micro")))


# ------------------------------------------- contamination checks --


def contamination_check(df: DataFrame, bench: DataFrame,
                        id_col: str = "doc_id",
                        text_col: str = "text", k: int = 8
                        ) -> DataFrame:
    """Benchmark-contamination scan: for every corpus document, how
    many of its distinct word k-grams appear in the benchmark set
    (the n-gram-overlap decontamination step of every published LLM
    data pipeline; k=8 is the GPT-3/PaLM convention).

    Emits per document: n_grams (distinct k-grams), n_hit (grams also
    in the benchmark). The benchmark gram set is ``broadcast`` — the
    corpus side stays a map-only probe; grams are compared as xxhash64
    (8 bytes), never as strings.
    """
    def grams(frame, idc):
        return (frame.select(
            F.col(idc),
            F.explode(F.array_distinct(
                word_shingles(F.col(text_col), k))).alias("g"))
            .select(idc, F.xxhash64("g").alias("h")))

    bench_grams = F.broadcast(
        grams(bench, id_col).select("h").distinct())
    doc_grams = grams(df, id_col)
    hits = (doc_grams.join(bench_grams, "h", "left_semi")
            .groupBy(id_col).agg(F.count("*").cast("long")
                                 .alias("n_hit")))
    totals = doc_grams.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"))
    return (totals.join(hits, id_col, "left")
            .withColumn("n_hit", F.coalesce("n_hit", F.lit(0))
                        .cast("long")))


# --------------------------------------------- sequence packing --


def pack_sequences(df: DataFrame, group_col: str = "source",
                   id_col: str = "doc_id", text_col: str = "text",
                   budget: int = 2048) -> DataFrame:
    """Greedy next-fit packing of documents into fixed-token training
    chunks — the step that turns a curated corpus into context-window
    sized examples. Documents are taken in ``id_col`` order within
    each ``group_col`` shard; a document that would overflow the
    running chunk starts the next one (a document longer than
    ``budget`` occupies a chunk alone). Emits one row per document:

      group, doc_id, n_tok, chunk   (chunk is 1-based per group)

    Packing is inherently a sequential scan (the chunk id of doc i
    depends on every token count before it), so this is the module's
    one ``applyInPandas`` stage: one shuffle on ``group_col``, then a
    linear numpy pass per group. Determinism: the (group, doc_id)
    sort makes output independent of partitioning/retries.

    Scale: groups are the packing shards (in production: one shard per
    input file / crawl segment, ~10^4-10^6 docs each), so no group
    outgrows an executor; a skewed mega-group is sub-sharded upstream
    by packing within (group, hash(id) % S) instead — packing quality
    is unaffected because chunk locality is per-shard anyway. Only
    (group, id, n_tok) rows shuffle — the text never moves.
    """
    counts = df.select(
        F.col(group_col).alias("grp"), F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"))
    # derive the grp/id field types from the input — hardcoding
    # "grp string, id long" would break any corpus with a string
    # doc_id or a non-string group column
    out_schema = StructType(list(counts.schema.fields)
                            + [StructField("chunk", LongType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        chunks = []
        chunk, acc = 0, budget  # force a new chunk on the first doc
        for nt in pdf["n_tok"]:
            if acc + nt <= budget:
                acc += nt
            else:
                chunk += 1
                acc = nt
            chunks.append(chunk)
        pdf["chunk"] = pd.Series(chunks, dtype="int64")
        return pdf

    return (counts.groupBy("grp").applyInPandas(pack, schema=out_schema)
        .select(F.col("grp").alias(group_col), F.col("id").alias(id_col),
                "n_tok", "chunk"))


# ------------------------------------------- token-budget selection --


def select_token_budget(df: DataFrame, budget: int, score_col: str,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        partitions: int | None = None) -> DataFrame:
    """Global greedy corpus selection under a token budget: take
    documents in (score desc, id asc) order while the running token
    total stays within ``budget`` — "the best N tokens of the crawl",
    the selection step after quality scoring/DSIR. A document is
    selected iff the cumulative token count through it is <= budget.

    The textbook formulation is one global window
    (``sum(n_tok) OVER (ORDER BY score DESC)``) — which Spark executes
    as a SINGLE task at any scale. This is the scalable two-phase
    prefix sum instead:

      1. range-repartition on the order key (parallel sort; each
         partition holds a contiguous score range),
      2. per-partition token subtotals — a P-row aggregate collected
         to the driver,
      3. exclusive prefix offsets broadcast back (join on pid),
      4. per-partition cumulative windows (partitionBy pid → P
         parallel windows); global cumsum = offset + local cumsum.

    Emits (id, score, n_tok, cum_tok) for the selected documents.

    The post-repartition projection is persisted before the subtotal
    action: ``spark_partition_id`` must denote the same physical rows
    in step 2 and step 4 (AQE may otherwise re-coalesce shuffle
    partitions differently per action). Only (id, score, n_tok) rows
    ever move — the text never shuffles.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    n_part = partitions or spark.sparkContext.defaultParallelism
    d = (df.select(F.col(id_col).alias("id"),
                   F.col(score_col).alias("score"),
                   F.size(tokens(F.col(text_col))).cast("long")
                   .alias("n_tok"))
         .repartitionByRange(n_part, F.desc("score"), F.asc("id"))
         .withColumn("pid", F.spark_partition_id())
         .persist(StorageLevel.MEMORY_AND_DISK))

    subtotals = {r["pid"]: r["s"] for r in
                 d.groupBy("pid").agg(F.sum("n_tok").alias("s"))
                 .collect()}
    running, offsets = 0, []
    for pid in sorted(subtotals):
        offsets.append((pid, running))
        running += subtotals[pid]
    off_df = spark.createDataFrame(offsets, "pid int, off long")

    w = (Window.partitionBy("pid")
         .orderBy(F.desc("score"), F.asc("id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.join(F.broadcast(off_df), "pid")
            .withColumn("cum_tok", F.col("off") + F.sum("n_tok").over(w))
            .filter(F.col("cum_tok") <= budget)
            .select("id", "score", "n_tok", "cum_tok"))


# --------------------------------------------- LM perplexity filter --


def lm_perplexity(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  alpha: float = 0.5) -> DataFrame:
    """CCNet-style language-model perplexity scoring (Wenzek et al.
    2020 filter corpora with a KenLM; this is the in-sandbox analog —
    a bigram LM with add-alpha smoothing, trained distributed on the
    corpus itself): documents whose token sequences the corpus LM
    finds improbable (mojibake, word salad, boilerplate soup) score a
    high negative log-likelihood and get filtered.

      P(w2|w1) = (c(w1 w2) + alpha) / (c_prefix(w1) + alpha*V)
      nll(doc) = sum over bigrams of -ln P   (micro-nats)

    Emits (id, n_bigrams, nll_micro); callers threshold
    nll_micro / n_bigrams.

    Determinism at scale: each bigram's -ln P is rounded to integer
    micro-nats BEFORE the per-document sum — integer addition is
    order-independent, so the distributed aggregation hashes
    identically on every run/engine (a double sum would depend on
    join output order).

    Shuffle profile: one explode of corpus bigrams; two count
    groupBys over (bigram) / (prefix token) string keys with map-side
    combine; two hash joins back on those keys; one per-doc sum.
    Token-count-scale shuffles — inherent to corpus LM training; the
    count tables are vocabulary-sized, never broadcast.
    """
    low = F.transform(tokens(F.col(text_col)), F.lower)
    n = F.size(low)
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)
                 ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx, lambda i: F.struct(
            F.element_at(low, (i + 1).cast("int")).alias("w1"),
            F.element_at(low, (i + 2).cast("int")).alias("w2")))
    base = df.select(F.col(id_col).alias("id"), pairs.alias("bg"))
    bg = (base.select("id", F.explode("bg").alias("p"))
          .select("id", F.col("p.w1").alias("w1"),
                  F.col("p.w2").alias("w2")))
    # bg feeds four consumers (two count tables, vocab, scoring join)
    from pyspark import StorageLevel
    bg = bg.persist(StorageLevel.MEMORY_AND_DISK)

    c_bi = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c_pre = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    v = (bg.select(F.col("w1").alias("w"))
         .union(bg.select(F.col("w2").alias("w")))
         .distinct().count())

    scored = (bg.join(c_bi, ["w1", "w2"]).join(c_pre, "w1")
              .select("id", F.round(-F.log(
                  (F.col("c2") + F.lit(alpha))
                  / (F.col("c1") + F.lit(alpha * v)))
                  * 1_000_000).cast("long").alias("nll")))
    agg = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"), F.sum("nll").alias("nll_micro"))
    return (df.select(F.col(id_col).alias("id"))
            .join(agg, "id", "left")
            .select("id",
                    F.coalesce("n_bigrams", F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    F.coalesce("nll_micro", F.lit(0)).cast("long")
                    .alias("nll_micro")))


def blocklist_filter(df: DataFrame, terms: list[str],
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """C4-style bad-word page filter (Raffel et al. 2020 §2.2 drops
    any page containing a blocklisted word; :func:`c4_rules`
    deliberately ships no wordlist — this is the slot). Terms match
    case-insensitively on word boundaries; the whole list compiles
    into ONE alternation regex evaluated inside codegen, so the scan
    stays map-only regardless of list size (a 1000-term list is one
    compiled automaton per task, not 1000 predicates).

    Emits (id, n_matches, keep): occurrence count plus the C4
    verdict (keep iff zero matches).
    """
    import re as _re
    if not terms:
        return df.select(F.col(id_col).alias("id"),
                         F.lit(0).cast("long").alias("n_matches"),
                         F.lit(True).alias("keep"))
    pat = r"\b(" + "|".join(
        _re.escape(t.lower()) for t in sorted(set(terms))) + r")\b"
    hits = F.regexp_extract_all(F.lower(F.col(text_col)),
                                F.lit(pat), 0)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(hits).cast("long").alias("n_matches"),
        (F.size(hits) == 0).alias("keep"))


def lm_perplexity_kn(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     discount: float = 0.75) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity — the smoothing the
    actual CCNet/KenLM stack uses (Kneser & Ney 1995; Chen & Goodman
    1998 eq. 4.28), upgrading :func:`lm_perplexity`'s add-alpha
    analog. For an observed bigram (every doc bigram is observed —
    the LM is trained on the scored corpus itself):

      P(w2|w1) = (c(w1,w2) - D)/c(w1)
                 + D * N1+(w1,*)/c(w1) * N1+(*,w2)/N1+(*,*)

    with D = ``discount``, N1+(w1,*) = distinct successors of w1,
    N1+(*,w2) = distinct predecessors of w2 (the continuation count
    that makes KN famously robust to "Francisco"-style words frequent
    only after one prefix), N1+(*,*) = distinct bigram types.

    Emits (id, n_bigrams, nll_micro) exactly like
    :func:`lm_perplexity`; per-bigram -ln P rounds to integer
    micro-nats before the per-doc sum, so the aggregation is
    order-independent and cross-engine exact.

    Shuffle profile: identical to lm_perplexity plus two
    vocabulary-scale groupBys over the bigram-type table (distinct
    successor / predecessor counts) and one scalar type count —
    nothing new touches document text.
    """
    low = F.transform(tokens(F.col(text_col)), F.lower)
    n = F.size(low)
    idx = F.when(n >= 2, F.sequence(F.lit(0), n - 2)
                 ).otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx, lambda i: F.struct(
            F.element_at(low, (i + 1).cast("int")).alias("w1"),
            F.element_at(low, (i + 2).cast("int")).alias("w2")))
    base = df.select(F.col(id_col).alias("id"), pairs.alias("bg"))
    bg = (base.select("id", F.explode("bg").alias("p"))
          .select("id", F.col("p.w1").alias("w1"),
                  F.col("p.w2").alias("w2")))
    from pyspark import StorageLevel
    bg = bg.persist(StorageLevel.MEMORY_AND_DISK)

    # the bigram-type table feeds four consumers (scoring join, both
    # continuation counts, the scalar type count)
    c_bi = (bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
            .persist(StorageLevel.MEMORY_AND_DISK))
    c_pre = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    n1p_suc = c_bi.groupBy("w1").agg(F.count("*").alias("n1s"))
    n1p_pre = c_bi.groupBy("w2").agg(F.count("*").alias("n1p"))
    n_types = c_bi.count()

    d = F.lit(discount)
    prob = ((F.col("c2") - d) / F.col("c1")
            + d * F.col("n1s") / F.col("c1")
            * F.col("n1p") / F.lit(float(n_types)))
    scored = (bg.join(c_bi, ["w1", "w2"]).join(c_pre, "w1")
              .join(n1p_suc, "w1").join(n1p_pre, "w2")
              .select("id", F.round(-F.log(prob) * 1_000_000)
                      .cast("long").alias("nll")))
    agg = scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("nll").alias("nll_micro"))
    return (df.select(F.col(id_col).alias("id"))
            .join(agg, "id", "left")
            .select("id",
                    F.coalesce("n_bigrams", F.lit(0)).cast("long")
                    .alias("n_bigrams"),
                    F.coalesce("nll_micro", F.lit(0)).cast("long")
                    .alias("nll_micro")))


# ----------------------------------------------- mixture weights --


def epoch_mix(df: DataFrame, budget_tokens: int,
              max_epochs: int = 4, tau: float = 0.7,
              group_col: str = "source",
              text_col: str = "text") -> DataFrame:
    """Repetition-aware data-mixing plan (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models": repeating data up to
    ~4 epochs is nearly as good as fresh data; beyond that returns
    decay fast). Allocate a token ``budget`` across source groups by
    temperature-scaled weights (:func:`mixture_weights`' recipe),
    then cap each group's allocation at ``max_epochs`` passes over
    its unique tokens. Emits per group:

      n_tokens        unique tokens held
      target_tokens   budget * weight (before the epoch cap)
      epochs_micro    min(max_epochs, target/unique) in micro-epochs
      served_tokens   epochs * unique — what the schedule actually
                      draws from this group

    All ratios round to integer micro-units at fixed points (the
    mixture_weights discipline) so the plan replays exactly. Scale:
    group-table-sized arithmetic on top of one token-count groupBy.
    """
    w = mixture_weights(df, group_col=group_col, text_col=text_col,
                        tau=tau)
    target = F.expr(f"cast({budget_tokens} as bigint) "
                    "* weight_micro div 1000000")
    epochs = F.least(
        F.lit(max_epochs * 1_000_000).cast("long"),
        F.expr("target_tokens * 1000000 div n_tokens"))
    return (w.withColumn("target_tokens", target.cast("long"))
            .withColumn("epochs_micro", epochs.cast("long"))
            .withColumn("served_tokens",
                        F.expr("epochs_micro * n_tokens "
                               "div 1000000").cast("long"))
            .select(F.col(group_col), "n_tokens", "target_tokens",
                    "epochs_micro", "served_tokens"))


def mixture_weights(df: DataFrame, group_col: str = "source",
                    text_col: str = "text",
                    tau: float = 0.7) -> DataFrame:
    """Temperature-scaled data-mixing weights (the Gopher/PaLM
    recipe): per source-group sampling weight proportional to its
    token share raised to ``tau`` — tau < 1 upweights small
    high-quality sources against the web-crawl mass, tau = 1 is
    natural sampling. Emits per group:

      n_docs, n_tokens, share_micro (natural token share),
      weight_micro (temperature-scaled, sums to ~1e6)

    Exactness: the scaled shares are rounded to integer micro-units
    BEFORE normalization, and the normalizer is their integer sum —
    no cross-engine float-summation-order hazard (sums are the
    order-sensitive operation; division is IEEE-exact). Caveat: pow
    itself is only guaranteed to 1 ulp, so a share^tau landing within
    1 ulp of an x.5 micro boundary could in principle round
    differently across engines — latent and input-dependent, pinned
    by the oracle for the observed corpus (same hazard class as the
    ln() in bm25/lm_perplexity).

    Scale: one partial-aggregatable groupBy to group-count rows, then
    a broadcast of the group-sized table onto itself — group counts
    are mixture-table sized (10s-1000s of rows), trivially
    broadcastable.
    """
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.size(tokens(F.col(text_col)))).cast("long")
        .alias("n_tokens"))
    tot = g.agg(F.sum("n_tokens").alias("t_all"))
    scaled = (g.crossJoin(F.broadcast(tot))
              .withColumn("share_micro",
                          F.round(F.col("n_tokens") / F.col("t_all")
                                  * 1_000_000).cast("long"))
              .withColumn("s_tau",
                          F.round(F.pow(F.col("n_tokens")
                                        / F.col("t_all"), F.lit(tau))
                                  * 1_000_000).cast("long")))
    norm = scaled.agg(F.sum("s_tau").alias("z"))
    return (scaled.crossJoin(F.broadcast(norm))
            .select(F.col("grp").alias(group_col), "n_docs",
                    "n_tokens", "share_micro",
                    F.round(F.col("s_tau") / F.col("z") * 1_000_000)
                    .cast("long").alias("weight_micro")))


# ------------------------------------------------- long-doc split --


def split_long_docs(df: DataFrame, max_tokens: int = 2048,
                    overlap: int = 128, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split documents over the context limit into overlapping
    token-window chunks — the complement of ``pack_sequences``
    (packing folds short docs together; this cuts long docs down).
    Chunk i starts at token i*(max_tokens-overlap); the final chunk
    is whatever remains (>= 1 token). Docs within the limit pass
    through as their own single chunk. Emits
    (id, chunk_idx, n_tok, chunk_text).

    Pure per-row array expressions (sequence -> slice -> concat_ws):
    zero shuffle, stays in the scan stage — at 100 TB this adds no
    exchange to the curation plan, only output rows.
    """
    stride = max_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than max_tokens")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(
        n <= max_tokens, F.lit(1)
    ).otherwise(F.ceil((n - F.lit(overlap)) / F.lit(stride))
                .cast("int"))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.least(n - i * stride, F.lit(max_tokens)).cast("long")
            .alias("n_tok"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, max_tokens))
            .alias("chunk_text")))
    return (df.select(F.col(id_col).alias("id"),
                      F.explode(chunks).alias("c"))
            .select("id", F.col("c.chunk_idx").alias("chunk_idx"),
                    F.col("c.n_tok").alias("n_tok"),
                    F.col("c.chunk_text").alias("chunk_text")))


# ------------------------------------------------- C4 quality rules --


def c4_rules(df: DataFrame, id_col: str = "doc_id",
             text_col: str = "text",
             min_sentences: int = 5) -> DataFrame:
    """The C4 cleaning rules (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning..." §2.2) as one composed decision
    operator — the line/page filter applied to Common Crawl before
    T5 training:

      line kept iff it ends in terminal punctuation (. ! ? or a
      closing quote), has >= 3 words, and does not mention
      "javascript";
      page kept iff the surviving text has >= ``min_sentences``
      sentences, no "lorem ipsum", and no "{".

    Emits (id, n_lines, n_kept, n_sentences, keep, text_clean) —
    per-rule observability plus the final verdict, so reweighting /
    auditing can see WHY a page dropped. (C4's bad-words list is a
    deliberate omission — we ship no wordlist; slot a broadcast set
    into the line predicate where needed.)

    Pure per-row array/regexp expressions — zero shuffle, whole plan
    stays in the scan stage at any corpus size.
    """
    lines = F.filter(F.transform(F.split(F.col(text_col), "\n"),
                                 F.trim),
                     lambda l: l != "")
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"”]$')
        & (F.size(F.split(l, r"\s+")) >= 3)
        & ~F.lower(l).contains("javascript"))
    out = (df.select(F.col(id_col).alias("id"),
                     F.col(text_col).alias("_t"),
                     lines.alias("_lines"), kept.alias("_kept"))
           .withColumn("text_clean", F.concat_ws("\n", F.col("_kept")))
           .withColumn("n_sentences",
                       F.length(F.regexp_replace("text_clean",
                                                 "[^.!?]", ""))))
    keep = ((F.col("n_sentences") >= min_sentences)
            & ~F.lower(F.col("_t")).contains("lorem ipsum")
            & ~F.col("_t").contains("{"))
    return out.select(
        "id", F.size("_lines").cast("long").alias("n_lines"),
        F.size("_kept").cast("long").alias("n_kept"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        keep.alias("keep"), "text_clean")


# --------------------------------------------- training-order shuffle --


def shuffle_order(df: DataFrame, key_col: str = "doc_id",
                  salt: str = "") -> DataFrame:
    """Deterministic global shuffle order for training export — the
    step that serializes a curated corpus so no source/crawl-segment
    run of similar documents survives into the token stream.

    The order key is md5(key || salt): uniform, reproducible across
    retries (never rand()), re-rollable per epoch by changing
    ``salt``. Adds ``shuffle_rank`` (1-based dense position).

    Scale: one global sort — Spark range-partitions by sampled md5
    quantiles, so it parallelizes like any TB-scale ORDER BY write;
    in practice the rank is computed once per corpus export and the
    writer consumes `orderBy(shuffle_key)` directly (`sortWithinPartitions`
    + range partitioning), never a single-task window. The
    row_number here runs over a range-partitioned sort with the same
    plan shape as the token-budget prefix sum.
    """
    keyed = df.withColumn(
        "_sk", F.md5(F.concat(F.col(key_col).cast("string"),
                              F.lit(salt))))
    w = Window.orderBy("_sk", F.col(key_col))
    return (keyed.withColumn("shuffle_rank",
                             F.row_number().over(w).cast("long"))
            .drop("_sk"))


# ------------------------------------------------- URL features --


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL structural quality signals — the URL-side filters web
    corpora apply before ever fetching (spam hosts run deep
    subdomains, digit-heavy hosts, long tracking-parameter tails).

    Adds (all exact integers/flags, zero shuffle — pure regexp
    projections that ride in the scan stage):

      url_host        authority (lowercased)
      n_subdomains    dot count of the host
      n_digits_host   digit chars in the host
      path_depth      '/' count of the path component
      url_len         full URL length
      has_query       '?' present
    """
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    return (df
            .withColumn("url_host", host)
            .withColumn("n_subdomains",
                        (F.length("url_host") - F.length(
                            F.replace(F.col("url_host"), F.lit("."),
                                      F.lit("")))).cast("long"))
            .withColumn("n_digits_host", F.length(
                F.regexp_replace("url_host", "[^0-9]", ""))
                .cast("long"))
            .withColumn("path_depth",
                        (F.length(path) - F.length(
                            F.regexp_replace(path, "/", "")))
                        .cast("long"))
            .withColumn("url_len", F.length(url).cast("long"))
            .withColumn("has_query", url.contains("?")))


def crawl_trap_flags(df: DataFrame, url_col: str = "url",
                     max_depth: int = 20,
                     max_query_len: int = 200) -> DataFrame:
    """Crawler-trap detection flags per URL — the frontier-side
    hygiene guards production crawlers ship (Heritrix's path-depth /
    path-repetition filters, Nutch's regex-urlfilter defaults):
    infinite URL spaces (mirror loops, calendars, session tokens)
    must be cut BEFORE fetch or a polite crawler drowns one host.

    Adds (pure regexp/array projections, zero shuffle):

      r_repeat_seg   >= 2 repeated path segments (/a/b/a/b mirror
                     loops; one segment 3x also qualifies)
      r_deep_path    more than ``max_depth`` path segments
      r_calendar     >= 2 pure-year path segments (endless calendar
                     pagination)
      r_session_id   phpsessid/jsessionid/sessionid/sid/cfid/cftoken
                     query parameter (case-insensitive)
      r_long_query   query string longer than ``max_query_len``
      is_trap        any of the above
    """
    url = F.col(url_col)
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    r_repeat = (F.size(segs) - F.size(F.array_distinct(segs))) >= 2
    r_deep = F.size(segs) > max_depth
    r_cal = F.size(F.filter(
        segs, lambda x: x.rlike(r"^(19|20)[0-9]{2}$"))) >= 2
    r_sess = F.lower(query).rlike(
        r"(^|&)(phpsessid|jsessionid|sessionid|sid|cfid|cftoken)=")
    r_longq = F.length(query) > max_query_len
    return (df
            .withColumn("r_repeat_seg", r_repeat)
            .withColumn("r_deep_path", r_deep)
            .withColumn("r_calendar", r_cal)
            .withColumn("r_session_id", r_sess)
            .withColumn("r_long_query", r_longq)
            .withColumn("is_trap",
                        F.col("r_repeat_seg") | F.col("r_deep_path")
                        | F.col("r_calendar") | F.col("r_session_id")
                        | F.col("r_long_query")))


# ------------------------------------------------- Gopher rules --

_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have",
                 "with")


def gopher_rules(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000
                 ) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, A1.1) as one
    shuffle-free decision operator — the named sibling of `c4_rules`:

      r_word_count     min_words <= words <= max_words
      r_mean_word_len  3 <= mean word length <= 10
      r_symbol_ratio   (# + ellipsis occurrences) / words <= 0.1
      r_bullet_lines   bullet-started lines <= 90% (Rae et al. 2021
                       A1.1 removes docs where MORE than 90% of
                       lines start with a bullet)
      r_ellipsis_lines lines ending in an ellipsis <= 30%
      r_alpha_words    >= 80% of words contain a letter
      r_stopwords      >= 2 distinct stop words present

    All comparisons are integer cross-multiplications (no float
    ratios), so the keep decision replays bit-exactly in SQL. Every
    rule is a per-row array expression over one tokenization + one
    line split — zero exchanges, rides in the scan stage, with
    per-rule observability for corpus tuning.
    """
    text = F.col(text_col)
    w = tokens(text)
    n_words = F.size(w)
    sum_len = F.aggregate(w, F.lit(0),
                          lambda acc, x: acc + F.length(x))
    lines = F.split(text, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(F.filter(
        lines, lambda ln: ln.startswith("•") | ln.startswith("- ")
        | ln.startswith("* ")))
    n_ell = F.size(F.filter(
        lines, lambda ln: ln.endswith("...") | ln.endswith("…")))
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
    n_sym = (F.length(text) - F.length(F.replace(text, F.lit("#"),
                                                 F.lit("")))) \
        + F.size(F.split(text, r"\.\.\.")) - 1 \
        + F.size(F.split(text, "…")) - 1
    n_stops = F.size(F.array_intersect(
        w, F.array(*[F.lit(s) for s in _GOPHER_STOPS])))
    out = (df.select(F.col(id_col), text)
           .withColumn("n_words", n_words.cast("long"))
           .withColumn("r_word_count",
                       (n_words >= min_words) & (n_words <= max_words))
           .withColumn("r_mean_word_len",
                       (sum_len >= 3 * n_words)
                       & (sum_len <= 10 * n_words))
           .withColumn("r_symbol_ratio", 10 * n_sym <= n_words)
           .withColumn("r_bullet_lines", 10 * n_bullet <= 9 * n_lines)
           .withColumn("r_ellipsis_lines", 10 * n_ell <= 3 * n_lines)
           .withColumn("r_alpha_words", 5 * n_alpha >= 4 * n_words)
           .withColumn("r_stopwords", n_stops >= 2))
    keep = (F.col("r_word_count") & F.col("r_mean_word_len")
            & F.col("r_symbol_ratio") & F.col("r_bullet_lines")
            & F.col("r_ellipsis_lines") & F.col("r_alpha_words")
            & F.col("r_stopwords"))
    return out.withColumn("keep", keep).drop(text_col)


# -------------------------------------- intra-doc paragraph dedup --


def dedup_paragraphs_intra(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           sep: str = "\n") -> DataFrame:
    """Remove repeated paragraphs WITHIN each document (scraped pages
    often repeat the same block — cookie banners, share footers —
    several times in one body). Corpus-wide paragraph dedup is
    `paragraph_dedup`; this is its per-document complement and needs
    no shuffle at all: keep a paragraph iff its position is the FIRST
    occurrence of that exact string in the document.

    Emits (id, n_paragraphs, n_removed, text_dedup). Pure per-row
    array expressions (split → indexed filter on array_position →
    rejoin) — rides in the scan stage at any corpus size.
    """
    paras = F.split(F.col(text_col), sep)
    kept = F.filter(
        paras, lambda p, i: F.array_position(paras, p) - 1 == i)
    return (df.select(
        F.col(id_col),
        F.size(paras).cast("long").alias("n_paragraphs"),
        (F.size(paras) - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, sep).alias("text_dedup")))


# --------------------------------------------- overlapping chunking --


def chunk_documents(df: DataFrame, chunk_words: int = 256,
                    overlap_words: int = 32, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Split each document into overlapping word-window chunks — the
    retrieval/pretraining chunking stage (embedding-index shards,
    fixed-context windows with continuity overlap). Chunk i covers
    words [i*step, i*step + chunk_words) with step = chunk_words -
    overlap_words; starts run while they are < n_words, so the tail
    chunk may be short but no chunk is ever empty and every word is
    covered at least once.

    Pure per-row array expressions (sequence -> transform(slice) ->
    posexplode): zero Python, zero shuffle — rides in the scan stage
    at any corpus size, exactly like the paragraph/intra-dedup ops.
    Emits (id, chunk_idx, n_chunks, n_chunk_words, chunk_text);
    documents with no tokens emit no rows (count them upstream).
    """
    if overlap_words >= chunk_words:
        raise ValueError("overlap must be smaller than the chunk")
    step = chunk_words - overlap_words
    w = tokens(F.col(text_col))
    n = F.size(F.filter(w, lambda x: x != ""))
    w = F.filter(w, lambda x: x != "")
    n_chunks = F.ceil(n / F.lit(step)).cast("int")
    # guard: sequence(0, -1) DESCENDS in Spark, so an empty document
    # must short-circuit to an empty chunk list (→ zero rows)
    chunks = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(w, i * step + 1, chunk_words), " "))
    ).otherwise(F.array().cast("array<string>"))
    return (df.select(F.col(id_col).alias("id"),
                      F.posexplode(chunks).alias("chunk_idx",
                                                 "chunk_text"),
                      n_chunks.alias("n_chunks"))
            .select("id",
                    F.col("chunk_idx").cast("long").alias("chunk_idx"),
                    F.col("n_chunks").cast("long").alias("n_chunks"),
                    F.size(F.split("chunk_text", " ")).cast("long")
                    .alias("n_chunk_words"),
                    "chunk_text"))
