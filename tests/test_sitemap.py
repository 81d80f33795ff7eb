"""Sitemap parsing (tika_spark/sources/sitemap.py)."""

import pytest

from tika_spark.sources.sitemap import parse_sitemap, sitemap_entries

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.ex/p1</loc><lastmod>2026-01-01</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>http://a.ex/p2</loc></url>
  <url><priority>0.3</priority></url>
</urlset>"""

INDEX = b"""<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.ex/s1.xml</loc><lastmod>2026-02-02</lastmod></sitemap>
  <sitemap><loc>http://a.ex/s2.xml</loc></sitemap>
</sitemapindex>"""


class TestParse:
    def test_urlset_fields_and_defaults(self):
        got = parse_sitemap(URLSET)
        assert len(got) == 2          # the loc-less entry is dropped
        assert got[0] == {"loc": "http://a.ex/p1",
                          "lastmod": "2026-01-01",
                          "changefreq": "daily",
                          "priority_micro": 800000, "is_index": False}
        assert got[1]["priority_micro"] == 500000   # spec default
        assert got[1]["lastmod"] is None

    def test_index(self):
        got = parse_sitemap(INDEX)
        assert [e["loc"] for e in got] == ["http://a.ex/s1.xml",
                                           "http://a.ex/s2.xml"]
        assert all(e["is_index"] for e in got)

    def test_priority_clamped_and_garbage(self):
        xml = (b"<urlset><url><loc>u</loc><priority>7</priority></url>"
               b"<url><loc>v</loc><priority>x</priority></url></urlset>")
        got = parse_sitemap(xml)
        assert got[0]["priority_micro"] == 1000000
        assert got[1]["priority_micro"] == 500000

    def test_no_namespace_accepted(self):
        assert parse_sitemap(b"<urlset><url><loc>u</loc></url>"
                             b"</urlset>")[0]["loc"] == "u"

    def test_malformed_and_wrong_root(self):
        assert parse_sitemap(b"<html><body>nope</body></html>") == []
        assert parse_sitemap(b"\x00\xff not xml") == []
        assert parse_sitemap(b"") == []


class TestDataFrameOp:
    @pytest.fixture(scope="class")
    def spark(self):
        from pyspark.sql import SparkSession
        s = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
        yield s

    def test_explode_shape(self, spark):
        pages = spark.createDataFrame(
            [("http://a.ex/sitemap.xml", bytearray(URLSET)),
             ("http://a.ex/idx.xml", bytearray(INDEX)),
             ("http://bad.ex/x.xml", bytearray(b"garbage"))],
            "url string, html binary")
        out = sitemap_entries(pages).collect()
        assert len(out) == 4
        by_src = {}
        for r in out:
            by_src.setdefault(r.source_url, []).append(r)
        assert len(by_src["http://a.ex/sitemap.xml"]) == 2
        assert all(r.is_index for r in by_src["http://a.ex/idx.xml"])
        assert "http://bad.ex/x.xml" not in by_src
