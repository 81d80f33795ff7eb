"""Integration: one full crawl-scheduling round composed from the
crawl-side operators — sitemap discovery → robots filtering →
extraction → link graph → PageRank → crawl priorities.

Each piece is unit/oracle-tested on its own; this pins that the
surfaces actually compose (column names, types, determinism)."""

import pyspark.sql.functions as F
import pytest

from tika_spark import extract
from tika_spark.analysis import webgraph
from tika_spark.sources.robots import frontier_filter, robots_rules
from tika_spark.sources.sitemap import sitemap_entries


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
    yield s


def _page(i: int, n: int) -> bytes:
    nxt = (i * 3 + 1) % n
    return (f"<html><head><title>p{i}</title></head><body>"
            f"<p>words for page {i}</p>"
            f'<a href="http://h{nxt % 4}.ex/p{nxt}">to {nxt}</a>'
            f"</body></html>").encode()


def test_full_round(spark):
    n = 24
    # 1. discovery: every host publishes a sitemap of its pages
    sm = []
    for h in range(4):
        locs = "".join(f"<url><loc>http://h{h}.ex/p{i}</loc></url>"
                       for i in range(n) if i % 4 == h)
        sm.append((f"http://h{h}.ex/sitemap.xml",
                   bytearray(f"<urlset>{locs}</urlset>".encode())))
    frontier = sitemap_entries(
        spark.createDataFrame(sm, "url string, html binary"))
    assert frontier.count() == n

    # 2. politeness: h3 disallows everything
    hosts = spark.createDataFrame(
        [(f"h{h}.ex",
          "User-agent: *\nDisallow: /\n" if h == 3
          else "User-agent: *\nDisallow:\n") for h in range(4)],
        "host string, robots_txt string")
    allowed = (frontier_filter(
        frontier.select(F.col("loc").alias("url")), robots_rules(hosts))
        .filter("fetch_allowed"))
    n_allowed = allowed.count()
    assert n_allowed == n - n // 4

    # 3. "fetch" the allowed urls (deterministic synthetic bodies)
    idx = F.regexp_extract("url", r"/p(\d+)$", 1).cast("int")
    pages = allowed.select("url", idx.alias("i"))
    rows = [(r.url, bytearray(_page(r.i, n))) for r in pages.collect()]
    fetched = spark.createDataFrame(rows, "url string, html binary")

    # 4. extract + link graph + rank + priorities
    out = extract(fetched, mode="text")
    assert out.filter("status = 'ok'").count() == n_allowed
    edges = webgraph.link_edges(out)
    hg = webgraph.host_graph(edges)
    pr = webgraph.pagerank(hg, iterations=4)
    inv = (out.groupBy(webgraph.host_of(F.col("url")).alias("host"))
           .agg(F.count(F.lit(1)).alias("n_docs")))
    prio = (pr.join(inv, "host")
            .select("host", F.expr("rank_micro div n_docs")
                    .alias("priority")))
    got = {r.host: r.priority for r in prio.collect()}
    # h3 was never fetched, so it holds no docs — absent from the
    # inventory join even though links point at it
    assert set(got) == {"h0.ex", "h1.ex", "h2.ex"}
    assert all(v > 0 for v in got.values())

    # 5. determinism: the whole chain reproduces bit-identically
    pr2 = webgraph.pagerank(hg, iterations=4)
    assert sorted(map(tuple, pr.collect())) \
        == sorted(map(tuple, pr2.collect()))
