"""robots.txt parsing + frontier filtering
(tika_spark/sources/robots.py)."""

import pytest

from tika_spark.sources.robots import (frontier_filter, parse_robots,
                                       pattern_regex, robots_rules)

ROBOTS = """# site policy
User-agent: BadBot
Disallow: /

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /tmp/
Allow:
"""


class TestParse:
    def test_star_group_rules(self):
        rules = parse_robots(ROBOTS, agent="mybot")
        assert rules == [("/private", False), ("/private/ok", True),
                         ("/tmp/", False)]

    def test_specific_agent_beats_star(self):
        assert parse_robots(ROBOTS, agent="BadBot/1.0") == [("/", False)]

    def test_multi_agent_group(self):
        txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert parse_robots(txt, "b") == [("/x", False)]
        assert parse_robots(txt, "c") == []

    def test_empty_disallow_means_allow_all(self):
        assert parse_robots("User-agent: *\nDisallow:\n") == []

    def test_rules_before_agent_ignored(self):
        assert parse_robots("Disallow: /x\nUser-agent: *\n"
                            "Disallow: /y\n") == [("/y", False)]

    def test_same_agent_groups_merge(self):
        # RFC 9309 §2.2.1: two separate 'User-agent: *' groups both
        # apply — rules merge across groups at winning specificity
        txt = ("User-agent: *\nDisallow: /a\n\n"
               "User-agent: other\nDisallow: /z\n\n"
               "User-agent: *\nDisallow: /b\nAllow: /b/ok\n")
        assert parse_robots(txt, "mybot") == [
            ("/a", False), ("/b", False), ("/b/ok", True)]

    def test_specific_groups_merge_not_star(self):
        txt = ("User-agent: bot\nDisallow: /a\n\n"
               "User-agent: *\nDisallow: /s\n\n"
               "User-agent: bot\nAllow: /a/ok\n")
        assert parse_robots(txt, "MyBot/2") == [
            ("/a", False), ("/a/ok", True)]

    def test_garbage_lines_skipped(self):
        assert parse_robots("ran:dom\nnoise\nUser-agent: *\n"
                            "Disallow: /a\n") == [("/a", False)]


class TestPatternRegex:
    def test_prefix(self):
        import re
        rx = pattern_regex("/private")
        assert re.search(rx, "/private/page")
        assert not re.search(rx, "/pub/private")

    def test_wildcard_and_anchor(self):
        import re
        assert re.search(pattern_regex("/*.pdf$"), "/docs/x.pdf")
        assert not re.search(pattern_regex("/*.pdf$"), "/docs/x.pdfx")
        assert re.search(pattern_regex("/a*b"), "/aXXXb/tail")


class TestFrontier:
    @pytest.fixture(scope="class")
    def spark(self):
        from pyspark.sql import SparkSession
        s = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
        yield s

    def test_longest_match_allow_wins(self, spark):
        hosts = spark.createDataFrame([("a.ex", ROBOTS)],
                                      "host string, robots_txt string")
        rules = robots_rules(hosts)
        urls = spark.createDataFrame(
            [("http://a.ex/private/x",),      # disallow /private
             ("http://a.ex/private/ok/y",),   # allow /private/ok (longer)
             ("http://a.ex/tmp/z",),          # disallow /tmp/
             ("http://a.ex/public",),         # no rule -> allow
             ("http://other.ex/q",)],         # no rules host -> allow
            "url string")
        got = {r.url: r.fetch_allowed
               for r in frontier_filter(urls, rules).collect()}
        assert got == {
            "http://a.ex/private/x": False,
            "http://a.ex/private/ok/y": True,
            "http://a.ex/tmp/z": False,
            "http://a.ex/public": True,
            "http://other.ex/q": True,
        }

    def test_root_url_and_slash_disallow(self, spark):
        hosts = spark.createDataFrame(
            [("b.ex", "User-agent: *\nDisallow: /\n")],
            "host string, robots_txt string")
        urls = spark.createDataFrame(
            [("http://b.ex",), ("http://b.ex/any",)], "url string")
        got = {r.url: r.fetch_allowed
               for r in frontier_filter(
                   urls, robots_rules(hosts)).collect()}
        assert got == {"http://b.ex": False, "http://b.ex/any": False}


ROBOTS_META = """# politeness fixture
User-agent: *
Crawl-delay: 2.5
Disallow: /tmp/
Sitemap: https://ex.com/a.xml

User-agent: fetchbot
Crawl-delay: 0.5
Disallow: /private/

Sitemap: https://ex.com/b.xml
"""


class TestRobotsMeta:
    def test_parse_full_generic(self):
        from tika_spark.sources.robots import parse_robots_full
        full = parse_robots_full(ROBOTS_META, "*")
        assert full["crawl_delay"] == 2.5
        assert full["sitemaps"] == ["https://ex.com/a.xml",
                                    "https://ex.com/b.xml"]
        assert ("/tmp/", False) in full["rules"]

    def test_specific_group_wins_delay(self):
        from tika_spark.sources.robots import parse_robots_full
        full = parse_robots_full(ROBOTS_META, "FetchBot/1.0")
        assert full["crawl_delay"] == 0.5
        assert full["rules"] == [("/private/", False)]
        # sitemaps are group-independent
        assert len(full["sitemaps"]) == 2

    def test_merged_groups_take_min_delay(self):
        from tika_spark.sources.robots import parse_robots_full
        txt = ("User-agent: *\nCrawl-delay: 4\nDisallow: /a\n\n"
               "User-agent: *\nCrawl-delay: 1\nDisallow: /b\n")
        full = parse_robots_full(txt, "*")
        assert full["crawl_delay"] == 1.0
        assert full["rules"] == [("/a", False), ("/b", False)]

    def test_invalid_delay_ignored(self):
        from tika_spark.sources.robots import parse_robots_full
        txt = "User-agent: *\nCrawl-delay: soon\nDisallow: /x\n"
        assert parse_robots_full(txt)["crawl_delay"] is None

    def test_robots_meta_dataframe(self, spark):
        from tika_spark.sources.robots import robots_meta
        df = spark.createDataFrame(
            [("ex.com", ROBOTS_META), ("bare.com", "")],
            "host string, robots_txt string")
        out = {r.host: r for r in robots_meta(df).collect()}
        assert out["ex.com"].crawl_delay_ms == 2500
        assert out["ex.com"].n_sitemaps == 2
        assert out["ex.com"].sitemaps == \
            "https://ex.com/a.xml https://ex.com/b.xml"
        assert out["bare.com"].crawl_delay_ms == 1000   # default
        assert out["bare.com"].n_sitemaps == 0

    def test_fetch_schedule(self, spark):
        from tika_spark.sources.robots import fetch_schedule
        frontier = spark.createDataFrame(
            [("https://a/1", "a", 10), ("https://a/2", "a", 30),
             ("https://a/3", "a", 20), ("https://b/1", "b", 5)],
            "url string, host string, priority long")
        meta = spark.createDataFrame(
            [("a", 2000)], "host string, crawl_delay_ms long")
        out = {r.url: r for r in
               fetch_schedule(frontier, meta).collect()}
        # host a: priority order 2,3,1 -> slots 1,2,3 at 2000 ms
        assert (out["https://a/2"].slot,
                out["https://a/2"].fetch_offset_ms) == (1, 0)
        assert (out["https://a/3"].slot,
                out["https://a/3"].fetch_offset_ms) == (2, 2000)
        assert (out["https://a/1"].slot,
                out["https://a/1"].fetch_offset_ms) == (3, 4000)
        # host b missing from meta -> default 1000 ms
        assert (out["https://b/1"].slot,
                out["https://b/1"].fetch_offset_ms) == (1, 0)

    def test_assign_fetchers_churn(self, spark):
        from tika_spark.sources.robots import assign_fetchers
        hosts = spark.createDataFrame(
            [(f"h{i}.x",) for i in range(200)], "host string")
        a5 = {r.host: r.fetcher
              for r in assign_fetchers(hosts, 5).collect()}
        a6 = {r.host: r.fetcher
              for r in assign_fetchers(hosts, 6).collect()}
        assert set(a5.values()) <= set(range(5))
        # HRW property: adding fetcher 5 only moves hosts TO it
        moved = {h for h in a5 if a5[h] != a6[h]}
        assert all(a6[h] == 5 for h in moved)
        assert len(moved) < 200 / 2          # ~1/6 expected churn
