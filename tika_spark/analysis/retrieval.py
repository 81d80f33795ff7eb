"""Hybrid retrieval: reciprocal-rank fusion of lexical + dense lists.

The retrieval stage of a training-data pipeline rarely runs one
scorer: domain mining and RAG-style search both fuse a lexical BM25
list with a dense embedding list (Cormack et al. 2009, "Reciprocal
Rank Fusion outperforms Condorcet and individual rank learning
methods"). RRF needs only the RANKS of each input list:

    score(d) = sum over lists L of  1 / (rrf_k + rank_L(d))

which makes it robust to incomparable score scales — exactly why it
is the standard first fusion in hybrid search engines.

No reference counterpart (Tika has no retrieval tier); this extends
the pipeline layer alongside :func:`textstats.bm25_scores` /
:mod:`similarity`. Numeric determinism: contributions are integer
nano-units ``1_000_000_000 div (rrf_k + rank)`` — floor division on
longs, bit-exact in Spark and any SQL oracle, no float ties.

Scale shape: each input list is already a top-``depth`` result
(bounded rows), so the fusion works on at most ``n_lists × depth``
candidate rows — the groupBy/window here are over a provably tiny
set no matter the corpus size behind the lists. The expensive parts
(corpus scan for BM25, embedding scan for cosine) keep their own
scale paths; fusion adds no full-table shuffle.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

# integer nano-unit numerator: 1e9 div (rrf_k + rank) stays exact and
# distinct for every rank the fusion can meet (depth <= a few 1000)
_NANO = 1_000_000_000


def rrf_fuse(rankings: list[DataFrame], k: int = 20, rrf_k: int = 60,
             id_col: str = "id", rank_col: str = "rank") -> DataFrame:
    """Fuse ranked lists by reciprocal-rank fusion.

    Each input DataFrame carries (``id_col``, ``rank_col``) with
    1-based ranks (its own top-``depth`` — callers bound the lists,
    see module docstring). A document missing from a list simply
    contributes nothing (the standard RRF convention). Emits
    ``(id, rrf_nano, n_lists, rank)`` — the fused top-``k``, ranked
    by score desc then id asc.
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranked list")
    contribs = [
        r.select(
            F.col(id_col).cast("long").alias("id"),
            F.expr(f"{_NANO} div ({rrf_k} + cast({rank_col} as bigint))")
            .alias("contrib"))
        for r in rankings]
    allc = reduce(DataFrame.unionByName, contribs)
    fused = allc.groupBy("id").agg(
        F.sum("contrib").cast("long").alias("rrf_nano"),
        F.count("*").cast("long").alias("n_lists"))
    # candidate set <= n_lists * depth rows: a single-partition
    # window here is the cheap, correct choice (not a scale smell)
    w = Window.orderBy(F.desc("rrf_nano"), F.asc("id"))
    return (fused.withColumn("rank", F.row_number().over(w)
                             .cast("long"))
            .filter(F.col("rank") <= k))


def bm25_topk(docs: DataFrame, query: str, depth: int = 50,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``depth`` lexical list for :func:`rrf_fuse`: BM25 scores
    (textstats.bm25_scores — one scan + one scalar stats exchange)
    cut to ``depth`` with orderBy+limit, which Spark executes as
    TakeOrderedAndProject (distributed per-partition top-k merged on
    the driver — no global sort shuffle). Ranks are assigned after
    the cut, over ``depth`` rows."""
    from tika_spark.analysis.textstats import bm25_scores

    scored = (bm25_scores(docs, query, id_col=id_col,
                          text_col=text_col)
              .orderBy(F.desc("score_micro"), F.asc("id"))
              .limit(depth))
    w = Window.orderBy(F.desc("score_micro"), F.asc("id"))
    return scored.select(
        "id", F.row_number().over(w).cast("long").alias("rank"))


def hybrid_topk(docs: DataFrame, emb: DataFrame, query: str,
                query_vec_id: int, k: int = 20, depth: int = 50,
                rrf_k: int = 60) -> DataFrame:
    """BM25 + exact-cosine hybrid search fused by RRF.

    The dense list is brute-force cosine against the embedding row
    ``query_vec_id`` (similarity.brute_force_topk — Arrow matmul,
    query side broadcast); swap in lsh_topk/ivfpq_topk for the ANN
    scale path, the fusion is rank-only and does not care. Document
    ids are assumed aligned between ``docs.doc_id`` and
    ``emb.vec_id`` (the corpus and its embedding table).
    """
    from tika_spark.analysis import similarity

    lex = bm25_topk(docs, query, depth=depth)
    dense = (similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == query_vec_id), k=depth)
        .select(F.col("vec_id").alias("id"),
                F.col("rank").cast("long").alias("rank")))
    return rrf_fuse([lex, dense], k=k, rrf_k=rrf_k)


def best_passage(docs: DataFrame, query: str, window_words: int = 64,
                 stride: int = 32, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Query-biased best-passage (snippet) extraction: per document,
    the ``window_words``-token window (every ``stride`` tokens) with
    the highest idf-weighted query-term mass — the search-engine
    snippet / RAG passage-selection operator on top of the corpus.

      idf_t          = round(ln((N + 1) / (df_t + 1)) * 1e6)
      score(d, off)  = sum_t idf_t * tf_t(window(d, off))
      winner         = max by (score, -off)        (BIGINT, exact)

    Emits (id, off, score_micro, passage) for documents whose best
    window matches at least one query term; ``passage`` is the
    original-case token slice joined with single spaces.

    Plan shape (the zero-shuffle trick): windows are never exploded —
    ``transform(sequence(0, n-1, stride), o -> (score, -o))`` builds
    the per-offset score list as a native higher-order expression and
    ``array_max`` picks the winner inside the row. Corpus statistics
    (N, one df per query term via array_contains) are ONE
    partial-aggregatable agg row folded back by a broadcast
    crossJoin — at 100 TB this is one scan plus a scalar exchange,
    identical shape to textstats.bm25_scores.
    """
    from tika_spark.analysis.textstats import tokens

    terms = []
    for t in query.lower().split():
        if t and t not in terms:
            terms.append(t)
    if not terms:
        return (docs.select(F.col(id_col).alias("id"),
                            F.lit(0).alias("off"),
                            F.lit(0).cast("long").alias("score_micro"),
                            F.lit("").alias("passage"))
                .filter(F.lit(False)))

    toks = tokens(F.col(text_col))
    low = F.transform(toks, F.lower)
    d = docs.select(F.col(id_col).alias("id"),
                    toks.alias("toks"), low.alias("low"),
                    F.size(low).alias("n"))
    stats = d.agg(
        F.count("*").cast("double").alias("n_docs"),
        *[F.sum(F.array_contains("low", t).cast("long"))
          .cast("double").alias(f"df_{i}")
          for i, t in enumerate(terms)])
    idfs = [F.round(F.log((F.col("n_docs") + F.lit(1.0))
                          / (F.col(f"df_{i}") + F.lit(1.0)))
                    * 1_000_000).cast("long")
            for i in range(len(terms))]

    def win_score(o):
        w = F.slice(F.col("low"), o + 1, window_words)
        s = F.lit(0).cast("long")
        for i, t in enumerate(terms):
            s = s + idfs[i] * F.size(
                F.filter(w, lambda x: x == F.lit(t))).cast("long")
        return s

    offsets = F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)),
                         F.lit(stride))
    best = F.array_max(F.transform(
        offsets, lambda o: F.struct(win_score(o).alias("s"),
                                    (-o).cast("long").alias("neg_off"))))
    out = (d.crossJoin(F.broadcast(stats))
           .select("id", "toks", best.alias("best"))
           .select("id",
                   (-F.col("best.neg_off")).cast("int").alias("off"),
                   F.col("best.s").alias("score_micro"),
                   F.array_join(
                       F.slice(F.col("toks"),
                               (-F.col("best.neg_off")).cast("int") + 1,
                               window_words), " ").alias("passage")))
    return out.filter(F.col("score_micro") > 0)
