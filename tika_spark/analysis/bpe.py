"""Distributed BPE merge training (Sennrich et al. 2016).

No reference counterpart (SURVEY §2.I widening): byte-pair-encoding
vocabularies are trained over exactly the corpora this engine
curates, and the classic trainer is single-machine over a word-count
dict. Here the whole loop is Spark built-ins — and exact, so a SQL
oracle can replay every merge decision:

1. word counts: one explode + groupBy (the corpus touches Python
   never; the vocabulary table is ~10^6 rows regardless of corpus
   size — BPE's classic reduction);
2. per merge step: adjacent symbol pairs via two array slices +
   arrays_zip + explode, weighted by word count; the argmax pair
   (count DESC, then lexicographic pair ASC — a total, engine-
   independent order) via a top-1 sort-limit;
3. merge application as a JVM-side higher-order fold over each
   word's symbol array (no Python, no shuffle): the accumulator is a
   '\\n'-delimited string — tokens cannot contain whitespace, so the
   delimiter is collision-free — and the fold merges greedily left
   to right, which is exactly the non-overlapping scan BPE
   specifies (a merged token can never re-match the pair's left
   side in the same pass, because left+right != left).

Word-boundary markers ('</w>') are deliberately absent: merges never
cross word boundaries here because folding happens per word; the
marker only matters for detokenization, which is out of scope.

Scale notes: the word table persists once; each merge step is one
explode+agg over it plus a broadcast of the single winning pair —
the corpus is never re-read. num_merges is a driver loop of small
jobs (vocab-sized, not corpus-sized); real 30k-merge trainings batch
differently (heap-based, single node over the SAME word-count table
this job produces — word_counts() is the distributed half that
matters at 100 TB).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from tika_spark.analysis.textstats import tokens

_SEP = "\n"  # safe: whitespace-split tokens contain no newline


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over whitespace tokens — the only corpus-sized
    stage; everything after runs on the vocabulary."""
    return (df.select(F.explode(tokens(F.col(text_col))).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol arrays."""
    z = F.arrays_zip(F.slice("syms", 1, F.size("syms") - 1),
                     F.slice("syms", 2, F.size("syms") - 1))
    return (words.select(F.explode(z).alias("p"), "cnt")
            .select(F.col("p.0").alias("left"), F.col("p.1").alias("right"),
                    "cnt")
            .groupBy("left", "right")
            .agg(F.sum("cnt").cast("long").alias("pair_count")))


def _merge_fold(a: Column, b: Column) -> Column:
    """Apply one merge (a, b) -> a||b to the `syms` array, greedy
    left-to-right, as a codegen-free but JVM-side aggregate fold."""
    def step(acc: Column, x: Column) -> Column:
        tail_is_a = (acc == a) | (
            F.right(acc, F.length(a) + 1) == F.concat(F.lit(_SEP), a))
        return (F.when(tail_is_a & (x == b), F.concat(acc, x))
                .otherwise(F.concat(acc, F.lit(_SEP), x)))
    folded = F.aggregate(F.slice("syms", 2, F.size("syms") - 1),
                         F.element_at("syms", 1), step)
    return F.split(folded, _SEP)


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 4) -> DataFrame:
    """Learn ``num_merges`` BPE merges; returns (rank, left, right,
    pair_count) with rank 1-based in learning order."""
    spark = df.sparkSession
    words = (word_counts(df, text_col)
             .withColumn("syms", F.split("word", ""))
             .select("syms", "cnt").persist())
    best_rows = []
    cur = words
    for rank in range(1, num_merges + 1):
        # eager localCheckpoint everywhere state carries across
        # iterations: each step's lineage references the previous
        # step's twice (pair counts + fold), so without truncation
        # the plan tree compounds ~2^k (same discipline as
        # webgraph.pagerank)
        best = (_adjacent_pairs(cur)
                .orderBy(F.desc("pair_count"), F.asc("left"),
                         F.asc("right"))
                .limit(1)
                .withColumn("rank", F.lit(rank).cast("long"))
                .localCheckpoint(eager=True))
        if best.count() == 0:   # vocabulary fully merged
            break
        best_rows.append(best)
        cur = (cur.crossJoin(F.broadcast(
                   best.select(F.col("left").alias("_ml"),
                               F.col("right").alias("_mr"))))
               .withColumn("syms", _merge_fold(F.col("_ml"),
                                               F.col("_mr")))
               .select("syms", "cnt")
               .localCheckpoint(eager=True))
    words.unpersist()
    if not best_rows:
        return spark.createDataFrame(
            [], "rank long, left string, right string, pair_count long")
    out = best_rows[0]
    for b in best_rows[1:]:
        out = out.unionByName(b)
    return out.select("rank", "left", "right", "pair_count")


def bpe_segment_words(words: DataFrame,
                      merges: list[tuple[str, str]]) -> DataFrame:
    """Segment each word with an already-learned merge list (applied
    in rank order — the standard encoder). ``merges`` is a driver-side
    model (like any broadcast vocabulary); the fold chain stays
    JVM-side. Adds a `bpe_syms` array column."""
    out = words.withColumn("syms", F.split("word", ""))
    for a, b in merges:
        out = out.withColumn("syms", _merge_fold(F.lit(a), F.lit(b)))
    return out.withColumnRenamed("syms", "bpe_syms")


def bpe_encode_docs(df: DataFrame, merges: list[tuple[str, str]],
                    id_col: str = "doc_id", text_col: str = "text"
                    ) -> DataFrame:
    """Per-document BPE token counts under a trained merge list —
    the APPLY half of the BPE story (token budgeting, context-length
    packing, per-source token accounting all need encoded counts,
    not whitespace words).

    Scale design: the fold chain never runs over the corpus. Words
    explode once, the DISTINCT vocabulary (Zipf-bounded: ~10^6-10^7
    rows regardless of corpus size) is segmented via the same
    JVM-side fold as training, and the per-word token counts
    broadcast-join back onto the exploded words — the corpus-sized
    stages are one explode, one broadcast join, one groupBy on the
    doc id. Emits (id, n_words, n_tokens); a document whose text
    has no tokens keeps a row with zeros.
    """
    words = (df.select(F.col(id_col).alias("id"),
                       F.explode(tokens(F.col(text_col)))
                       .alias("word"))
             .filter(F.col("word") != ""))
    vocab = words.select("word").distinct()
    seg = (bpe_segment_words(vocab, merges)
           .select("word", F.size("bpe_syms").cast("long")
                   .alias("n_toks")))
    per_doc = (words.join(F.broadcast(seg), "word")
               .groupBy("id")
               .agg(F.count(F.lit(1)).alias("n_words"),
                    F.sum("n_toks").alias("n_tokens")))
    return (df.select(F.col(id_col).alias("id"))
            .join(per_doc, "id", "left")
            .select("id",
                    F.coalesce("n_words", F.lit(0)).cast("long")
                    .alias("n_words"),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens")))


def bpe_encode_oracle_sql(source_sql: str,
                          merges: list[tuple[str, str]],
                          id_col: str = "doc_id",
                          toks_expr: str =
                          r"regexp_split_to_array(trim(text), '\s+')"
                          ) -> str:
    """DuckDB replay of ``bpe_encode_docs``: the same greedy fold
    per merge in rank order (list_reduce twin of ``_merge_fold``),
    nested once per merge, token count = segments of the final
    fold."""
    nl = "chr(10)"
    expr = "regexp_split_to_array(w, '')"
    for a, b in merges:
        la, lb = a.replace("'", "''"), b.replace("'", "''")
        expr = (f"string_split(list_reduce({expr}, (acc, x) -> "
                f"CASE WHEN (acc = '{la}' OR right(acc, "
                f"length('{la}')+1) = {nl} || '{la}') "
                f"AND x = '{lb}' THEN acc || x "
                f"ELSE acc || {nl} || x END), {nl})")
    return (
        f"WITH toks AS (SELECT {id_col} AS id, unnest({toks_expr}) "
        f"AS w FROM ({source_sql})), "
        f"seg AS (SELECT id, len({expr})::BIGINT AS n_toks "
        "FROM toks WHERE w <> ''), "
        "agg AS (SELECT id, COUNT(*)::BIGINT AS n_words, "
        "SUM(n_toks)::BIGINT AS n_tokens FROM seg GROUP BY id) "
        f"SELECT s.{id_col} AS id, "
        "COALESCE(a.n_words, 0)::BIGINT AS n_words, "
        "COALESCE(a.n_tokens, 0)::BIGINT AS n_tokens "
        f"FROM ({source_sql}) s LEFT JOIN agg a "
        f"ON a.id = s.{id_col}")


def bpe_oracle_sql(source_sql: str, num_merges: int = 4,
                   toks_expr: str =
                   r"regexp_split_to_array(trim(text), '\s+')") -> str:
    """DuckDB replay of ``bpe_train``: unrolled merge steps, each the
    same pair-count → total-order argmax → list_reduce greedy fold."""
    nl = "chr(10)"
    sql = [
        f"WITH toks AS (SELECT unnest({toks_expr}) AS w "
        f"FROM ({source_sql})), ",
        "w0 AS (SELECT w, COUNT(*)::BIGINT AS cnt FROM toks "
        "WHERE w <> '' GROUP BY w), ",
        "s0 AS (SELECT regexp_split_to_array(w, '') AS syms, cnt "
        "FROM w0), ",
    ]
    for k in range(1, num_merges + 1):
        p, s_prev, s_cur = f"p{k}", f"s{k - 1}", f"s{k}"
        m = f"m{k}"
        sql.append(
            f"{p} AS (SELECT syms[i] AS l, syms[i+1] AS r, "
            f"SUM(cnt)::BIGINT AS pc FROM {s_prev}, "
            "UNNEST(generate_series(1, len(syms)-1)) AS u(i) "
            "GROUP BY 1, 2), ")
        sql.append(
            f"{m} AS (SELECT l, r, pc FROM {p} "
            "ORDER BY pc DESC, l ASC, r ASC LIMIT 1), ")
        if k < num_merges:
            sql.append(
                f"{s_cur} AS (SELECT string_split(list_reduce(syms, "
                f"(acc, x) -> CASE WHEN (acc = {m}.l OR "
                f"right(acc, length({m}.l)+1) = {nl} || {m}.l) "
                f"AND x = {m}.r THEN acc || x "
                f"ELSE acc || {nl} || x END), {nl}) AS syms, cnt "
                f"FROM {s_prev}, {m}), ")
    joined = "".join(sql)[:-2]
    union = " UNION ALL ".join(
        f"SELECT {k}::BIGINT AS rank, l AS left, r AS right, "
        f"pc AS pair_count FROM m{k}"
        for k in range(1, num_merges + 1))
    return f"{joined} {union}"
