"""Web-graph operators (tika_spark/analysis/webgraph.py): host graph,
integer-micro PageRank, anchor roll-ups."""

import pyspark.sql.functions as F
import pytest

from tika_spark.analysis import webgraph

SCALE = webgraph.SCALE


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    yield s


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, "
                                       "anchor string")


class TestHostGraph:
    def test_weights_and_relative_drop(self, spark):
        e = _edges(spark, [
            ("http://a.ex/1", "http://b.ex/x", "t"),
            ("http://a.ex/2", "http://b.ex/y", "t"),
            ("http://a.ex/1", "/relative", "t"),        # no authority
            ("http://b.ex/1", "https://a.ex/z", "t")])
        hg = {(r.src_host, r.dst_host): r.weight
              for r in webgraph.host_graph(e).collect()}
        assert hg == {("a.ex", "b.ex"): 2, ("b.ex", "a.ex"): 1}

    def test_self_loop_toggle(self, spark):
        e = _edges(spark, [("http://a.ex/1", "http://a.ex/2", "t")])
        assert webgraph.host_graph(e).count() == 1
        assert webgraph.host_graph(e, keep_self_loops=False).count() == 0

    def test_degree_stats_includes_sink(self, spark):
        e = _edges(spark, [("http://a.ex/1", "http://b.ex/x", "t"),
                           ("http://a.ex/2", "http://b.ex/y", "t")])
        d = {r.host: (r.out_weight, r.in_weight)
             for r in webgraph.degree_stats(
                 webgraph.host_graph(e)).collect()}
        assert d == {"a.ex": (2, 0), "b.ex": (0, 2)}


class TestPageRank:
    def test_two_node_cycle_stays_uniform(self, spark):
        # a <-> b: uniform ranks are the fixed point
        hg = spark.createDataFrame(
            [("a", "b", 1), ("b", "a", 1)],
            "src_host string, dst_host string, weight long")
        r = {x.host: x.rank_micro
             for x in webgraph.pagerank(hg, iterations=4).collect()}
        assert r == {"a": SCALE // 2, "b": SCALE // 2}

    def test_one_iteration_matches_hand_math(self, spark):
        # a->b, a->c, b->c ; c dangling. N=3, rank0 = 333333 each.
        hg = spark.createDataFrame(
            [("a", "b", 1), ("a", "c", 1), ("b", "c", 1)],
            "src_host string, dst_host string, weight long")
        base = (SCALE - 850_000) // 3                     # 50000
        dang = 850_000 * 333_333 // (SCALE * 3)           # 94444
        a_out = 850_000 * 333_333 * 1 // (SCALE * 2)      # 141666
        b_out = 850_000 * 333_333 * 1 // (SCALE * 1)      # 283333
        exp = {"a": base + dang,
               "b": base + dang + a_out,
               "c": base + dang + a_out + b_out}
        r = {x.host: x.rank_micro
             for x in webgraph.pagerank(hg, iterations=1).collect()}
        assert r == exp

    def test_mass_conserved_within_rounding(self, spark):
        hg = spark.createDataFrame(
            [("a", "b", 3), ("b", "c", 1), ("c", "a", 2),
             ("a", "c", 1), ("d", "a", 5)],
            "src_host string, dst_host string, weight long")
        ranks = webgraph.pagerank(hg, iterations=5)
        total = ranks.agg(F.sum("rank_micro")).collect()[0][0]
        # floor division loses <= a few micro per node per iteration
        assert SCALE - 100 <= total <= SCALE

    def test_many_iterations_lineage_truncated(self, spark):
        # regression: without per-iteration localCheckpoint the plan
        # grows ~3^k and the driver OOMs generating it around k≈8
        hg = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 2), ("c", "a", 1)],
            "src_host string, dst_host string, weight long")
        r = webgraph.pagerank(hg, iterations=15)
        total = r.agg(F.sum("rank_micro")).collect()[0][0]
        assert SCALE - 200 <= total <= SCALE

    def test_empty_graph(self, spark):
        hg = spark.createDataFrame(
            [], "src_host string, dst_host string, weight long")
        assert webgraph.pagerank(hg).count() == 0

    def test_weight_skews_rank(self, spark):
        # a sends 9/10 of its mass to b, 1/10 to c
        hg = spark.createDataFrame(
            [("a", "b", 9), ("a", "c", 1)],
            "src_host string, dst_host string, weight long")
        r = {x.host: x.rank_micro
             for x in webgraph.pagerank(hg, iterations=1).collect()}
        assert r["b"] > r["c"]


class TestAnchors:
    def test_sorted_distinct_topk(self, spark):
        e = _edges(spark, [
            ("http://a.ex/1", "http://t.ex/p", "zebra"),
            ("http://a.ex/2", "http://t.ex/p", "apple"),
            ("http://a.ex/3", "http://t.ex/p", "apple"),
            ("http://a.ex/4", "http://t.ex/p", "mango"),
            ("http://a.ex/5", "http://t.ex/q", "")])
        out = {r.dst: (r.n_inlinks, r.anchors)
               for r in webgraph.anchor_summary(e, k=2).collect()}
        assert out == {"http://t.ex/p": (4, "apple|mango")}

    def test_link_edges_kind_filter(self, spark):
        ext = spark.createDataFrame(
            [("u1", [{"kind": "a", "uri": "http://t.ex", "title": "",
                      "text": "x"},
                     {"kind": "img", "uri": "http://i.ex", "title": "",
                      "text": "alt"}])],
            "url string, links array<struct<kind:string,uri:string,"
            "title:string,text:string>>")
        rows = webgraph.link_edges(ext).collect()
        assert [(r.dst, r.anchor) for r in rows] == [("http://t.ex", "x")]


class TestRedirectResolve:
    def test_chains_loops_and_cutoff(self, spark):
        from tika_spark.analysis.webgraph import resolve_redirects
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"),     # 3-hop chain
             ("x", "y"),                             # 1 hop
             ("p", "q"), ("q", "p"),                 # 2-cycle
             ("n", "")],                             # empty ignored
            "url string, location string")
        out = {r.url: r for r in
               resolve_redirects(edges, max_hops=5).collect()}
        assert (out["a"].final_url, out["a"].hops,
                out["a"].terminal) == ("d", 3, True)
        assert (out["x"].final_url, out["x"].terminal) == ("y", True)
        # cycle: cut at max_hops, flagged non-terminal
        assert out["p"].hops == 5 and not out["p"].terminal
        assert "n" not in out


class TestHits:
    def test_two_node_cycle_uniform(self, spark):
        hg = spark.createDataFrame(
            [("a", "b", 1), ("b", "a", 1)],
            "src_host string, dst_host string, weight long")
        out = {x.host: (x.auth_micro, x.hub_micro)
               for x in webgraph.hits(hg, iterations=3).collect()}
        assert out == {"a": (SCALE // 2, SCALE // 2),
                       "b": (SCALE // 2, SCALE // 2)}

    def test_star_hub_and_authority(self, spark):
        # h links to a1..a3: h is the only hub, the a's split authority
        hg = spark.createDataFrame(
            [("h", "a1", 1), ("h", "a2", 1), ("h", "a3", 2)],
            "src_host string, dst_host string, weight long")
        out = {x.host: (x.auth_micro, x.hub_micro)
               for x in webgraph.hits(hg, iterations=2).collect()}
        # authorities proportional to edge weight (L1-normalized)
        assert out["a1"][0] == SCALE // 4
        assert out["a2"][0] == SCALE // 4
        assert out["a3"][0] == SCALE // 2
        assert out["h"][0] == 0
        # h is the only node with out-edges -> all hub mass
        assert out["h"][1] == SCALE
        assert out["a1"][1] == 0

    def test_one_iteration_hand_math(self, spark):
        # a->b, b->c ; 3 nodes, hub0 = S//3 each
        # raw_auth: b = S//3, c = S//3 ; auth1: b = c = S//2
        # raw_hub: a = S//2 (to b), b = S//2 (to c) ; hub1 = S//2 each
        hg = spark.createDataFrame(
            [("a", "b", 1), ("b", "c", 1)],
            "src_host string, dst_host string, weight long")
        out = {x.host: (x.auth_micro, x.hub_micro)
               for x in webgraph.hits(hg, iterations=1).collect()}
        assert out["a"] == (0, SCALE // 2)
        assert out["b"] == (SCALE // 2, SCALE // 2)
        assert out["c"] == (SCALE // 2, 0)

    def test_empty_graph(self, spark):
        hg = spark.createDataFrame(
            [], "src_host string, dst_host string, weight long")
        assert webgraph.hits(hg).count() == 0
