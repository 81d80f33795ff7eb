import pytest

from tika_spark.analysis.retrieval import bm25_topk, hybrid_topk, rrf_fuse

NANO = 1_000_000_000


def test_rrf_fuse_arithmetic(spark):
    # list A ranks docs 1,2,3; list B ranks 2,1,4
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "id long, rank long")
    b = spark.createDataFrame([(2, 1), (1, 2), (4, 3)], "id long, rank long")
    out = {r.id: r for r in rrf_fuse([a, b], k=10).collect()}
    # doc 1: 1e9//61 + 1e9//62 ; doc 2 identical (symmetric) -> tie,
    # id asc breaks it
    expect = NANO // 61 + NANO // 62
    assert out[1].rrf_nano == expect and out[2].rrf_nano == expect
    assert out[1].rank == 1 and out[2].rank == 2
    assert out[1].n_lists == 2
    # singletons: doc 3 (rank 3 in A), doc 4 (rank 3 in B) tie on
    # 1e9//63, id asc
    assert out[3].rrf_nano == out[4].rrf_nano == NANO // 63
    assert out[3].n_lists == 1
    assert (out[3].rank, out[4].rank) == (3, 4)


def test_rrf_fuse_k_cut_and_empty(spark):
    a = spark.createDataFrame([(i, i) for i in range(1, 8)],
                              "id long, rank long")
    assert rrf_fuse([a], k=3).count() == 3
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_bm25_topk_rank_order(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark spark join"), (2, "spark join"),
         (3, "nothing relevant"), (4, "join join spark spark")],
        "doc_id long, text string")
    out = bm25_topk(docs, "spark join", depth=10).collect()
    ids = [r.id for r in out]
    assert 3 not in ids                      # no matching term
    assert out[0].rank == 1 and len(ids) == 3
    # doc 4 has the most balanced tf mass -> beats doc 2
    assert ids.index(4) < ids.index(2)


def test_hybrid_topk_fuses_both_signals(spark):
    docs = spark.createDataFrame(
        [(0, "query words here"), (1, "query words"), (2, "words"),
         (3, "unrelated text entirely")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
         (3, [0.95, 0.05])],
        "vec_id long, embedding array<double>")
    out = {r.id: r for r in
           hybrid_topk(docs, emb, "query words", query_vec_id=0,
                       k=4, depth=4).collect()}
    # doc 0 tops both lists; doc 3 is dense-only (lexically absent)
    assert out[0].rank == 1
    assert out[3].n_lists == 1
    # doc 1 appears in both lists and must outrank dense-only doc 2
    assert out[1].rank < out[2].rank


def test_random_projection_exact_and_jl(spark):
    import numpy as np
    from tika_spark.analysis.similarity import (random_projection,
                                                rp_signs)
    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>")
    out = {r.id: np.array(r.proj) for r in
           random_projection(df, dim=64, d_out=8).collect()}
    s = rp_signs(64, 8)
    # exact per-row matmul vs the library path
    assert np.allclose(out[3], vecs[3] @ s)
    # JL property: projected dot products track originals in rank
    # (spearman-ish check on a few pairs, normalized by d_out)
    orig = [float(vecs[i] @ vecs[j]) for i, j in
            [(0, 1), (2, 3), (4, 5), (6, 7)]]
    proj = [float(out[i] @ out[j]) / 8 for i, j in
            [(0, 1), (2, 3), (4, 5), (6, 7)]]
    assert np.corrcoef(orig, proj)[0, 1] > 0.5


def test_hard_negatives_excludes_cluster_and_self(spark):
    from tika_spark.analysis.similarity import hard_negatives
    # 1D embeddings on a line: similarity order == proximity order
    emb = spark.createDataFrame(
        [(i, [1.0, float(i) / 100]) for i in range(8)],
        "vec_id long, embedding array<double>")
    clusters = spark.createDataFrame(
        [(i, i // 2) for i in range(8)], "vec_id long, cluster long")
    out = [(r.neg_id, r.neg_rank) for r in
           hard_negatives(emb, clusters, k=3).collect()
           if r.query_id == 0]
    ids = [n for n, _ in out]
    assert 0 not in ids        # self excluded
    assert 1 not in ids        # cluster-mate excluded
    assert len(out) == 3 and [r for _, r in out] == [1, 2, 3]
    # nearest non-cluster vector is the top hard negative
    assert ids[0] == 2


def test_bm25_indexed_agrees_with_scan_form(spark):
    from tika_spark.analysis.textstats import (bm25_indexed,
                                               bm25_scores,
                                               inverted_index)
    docs = spark.createDataFrame(
        [(1, "spark spark join"), (2, "join only here"),
         (3, "nothing relevant"), (4, "spark")],
        "doc_id long, text string")
    postings, doclens = inverted_index(docs)
    idx = {r.id: r for r in
           bm25_indexed(postings, doclens, "spark join").collect()}
    scan = {r.id: r.score_micro for r in
            bm25_scores(docs, "spark join").collect()}
    assert set(idx) == set(scan) == {1, 2, 4}
    # same formula; only the rounding order differs (per-term vs
    # post-sum) -> within 1 micro per matched term
    for i, r in idx.items():
        assert abs(r.score_micro - scan[i]) <= r.n_terms_hit
    assert idx[1].n_terms_hit == 2 and idx[4].n_terms_hit == 1


class TestBestPassage:
    def test_window_selection_and_tie_offset(self, spark):
        from tika_spark.analysis.retrieval import best_passage
        # needles cluster near the end; the window covering both wins
        text = "pad " * 20 + "needle mid needle " + "pad " * 20
        df = spark.createDataFrame([(1, text.strip()),
                                    (2, "none of the terms")],
                                   "doc_id long, text string")
        out = best_passage(df, "needle", window_words=8, stride=4)
        rows = {r.id: r for r in out.collect()}
        assert 2 not in rows          # zero-score docs dropped
        r = rows[1]
        # both needles (positions 20 and 22) fit one window; earliest
        # covering offset = 16 (windows step by 4)
        assert r.off == 16
        assert r.passage.split().count("needle") == 2

    def test_scores_are_idf_weighted_integers(self, spark):
        from tika_spark.analysis.retrieval import best_passage
        import math
        df = spark.createDataFrame(
            [(1, "rare common"), (2, "common common"), (3, "common")],
            "doc_id long, text string")
        out = {r.id: r for r in
               best_passage(df, "rare common", window_words=4,
                            stride=4).collect()}
        idf_rare = round(math.log(4.0 / 2.0) * 1_000_000)
        idf_common = round(math.log(4.0 / 4.0) * 1_000_000)  # 0
        assert out[1].score_micro == idf_rare + idf_common
        # docs matching only the df=N term score 0 -> dropped
        assert 2 not in out and 3 not in out

    def test_passage_keeps_original_case(self, spark):
        from tika_spark.analysis.retrieval import best_passage
        # second doc keeps df < N so the term's idf is nonzero
        df = spark.createDataFrame([(1, "The Needle Wins Here"),
                                    (2, "nothing to see")],
                                   "doc_id long, text string")
        r = best_passage(df, "needle", window_words=4, stride=4)\
            .collect()[0]
        assert r.passage == "The Needle Wins Here"

    def test_empty_query(self, spark):
        from tika_spark.analysis.retrieval import best_passage
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        assert best_passage(df, "   ").count() == 0


def test_best_passage_plan_single_broadcast_no_window_explode(spark):
    """The window fan-out must never explode rows: the only exchange
    in the plan is the one-row stats aggregation folded back by a
    broadcast cross join."""
    from tika_spark.analysis.retrieval import best_passage
    df = spark.createDataFrame(
        [(i, "alpha beta gamma " * 30) for i in range(8)],
        "doc_id long, text string")
    plan = best_passage(df, "alpha", window_words=16, stride=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan          # no explode anywhere
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" \
        in plan                            # stats row folds back
    # no hash/range exchange of the corpus rows themselves
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
