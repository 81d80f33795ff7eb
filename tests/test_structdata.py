"""Structured-data extraction (html/structdata.py): JSON-LD,
OpenGraph/Twitter meta, HTML5 microdata."""

from tika_spark.html.structdata import (structured_data,
                                        structured_entities)

PAGE = """<html><head>
<meta property="og:title" content="T1">
<meta property="og:type" content="article">
<meta name="twitter:card" content="summary">
<script type="application/ld+json">
{"@context":"https://schema.org","@type":"Article","headline":"H",
 "author":{"@type":"Person","name":"A"},"wordCount":42}
</script>
</head><body>
<div itemscope itemtype="https://schema.org/Product">
  <span itemprop="name">  Widget   One </span>
  <img itemprop="image" src="/w.png">
  <div itemprop="offers" itemscope itemtype="https://schema.org/Offer">
    <meta itemprop="price" content="9.99">
  </div>
  <time itemprop="released" datetime="2020-01-02">Jan 2</time>
  <a itemprop="url" href="/p/1">link</a>
</div></body></html>"""


def _rows(fmt, rows):
    return [(r["entity"], r["prop"], r["value"])
            for r in rows if r["fmt"] == fmt]


class TestEntities:
    def test_meta_formats(self):
        rows = structured_entities(PAGE)
        assert _rows("opengraph", rows) == [
            (0, "og:title", "T1"), (0, "og:type", "article")]
        assert _rows("twitter", rows) == [
            (0, "twitter:card", "summary")]

    def test_jsonld(self):
        rows = _rows("json-ld", structured_entities(PAGE))
        assert (0, "@type", "Article") in rows
        assert (0, "headline", "H") in rows
        assert (0, "wordCount", "42") in rows
        assert (0, "author",
                '{"@type":"Person","name":"A"}') in rows
        assert all(p != "@context" for _, p, _ in rows)

    def test_jsonld_graph_and_array(self):
        h = ('<script type="application/ld+json">'
             '{"@graph":[{"@type":"A","x":"1"},{"@type":"B"}]}'
             '</script>'
             '<script type="application/ld+json">'
             '[{"@type":"C"}]</script>'
             '<script type="application/ld+json">broken{</script>')
        rows = _rows("json-ld", structured_entities(h))
        assert rows == [(0, "@type", "A"), (0, "x", "1"),
                        (1, "@type", "B"), (2, "@type", "C")]

    def test_microdata(self):
        rows = _rows("microdata", structured_entities(PAGE))
        assert (0, "@type", "https://schema.org/Product") in rows
        assert (0, "name", "Widget One") in rows      # ws-normalized
        assert (0, "image", "/w.png") in rows
        assert (0, "offers", "#1") in rows            # nested entity
        assert (1, "price", "9.99") in rows
        assert (0, "released", "2020-01-02") in rows  # datetime attr
        assert (0, "url", "/p/1") in rows

    def test_multi_itemprop_and_orphan(self):
        h = ('<div itemscope><span itemprop="a b">v</span></div>'
             '<span itemprop="lost">x</span>')
        rows = _rows("microdata", structured_entities(h))
        assert rows == [(0, "a", "v"), (0, "b", "v")]

    def test_broken_html_never_raises(self):
        assert structured_entities("<div itemscope><meta") is not None
        assert structured_entities("") == []


def test_dataframe_operator(spark):
    pages = spark.createDataFrame(
        [("u1", PAGE.encode()), ("u2", b"<p>no entities</p>")],
        "url string, html binary") \
        .repartition(2)
    out = structured_data(pages).collect()
    assert {r.url for r in out} == {"u1"}
    assert any(r.fmt == "json-ld" and r.prop == "headline"
               for r in out)


class TestImageCandidates:
    def test_img_srcset_and_picture(self):
        from tika_spark.html.structdata import image_candidates
        h = ('<picture><source srcset="a.webp 1x, a2.webp 2x" '
             'type="image/webp"><img src="a.jpg" '
             'srcset="a-640.jpg 640w,a-1280.jpg 1280w"></picture>'
             '<img src="b.png">')
        rows = [(r["tag"], r["url"], r["descriptor"])
                for r in image_candidates(h)]
        assert rows == [
            ("source", "a.webp", "1x"), ("source", "a2.webp", "2x"),
            ("img", "a.jpg", ""), ("img-srcset", "a-640.jpg", "640w"),
            ("img-srcset", "a-1280.jpg", "1280w"),
            ("img", "b.png", "")]

    def test_operator(self, spark):
        from tika_spark.html.structdata import image_candidate_rows
        df = spark.createDataFrame(
            [("u1", b'<img src="x.gif" srcset="y.gif 2x">')],
            "url string, html binary")
        out = [(r.tag, r.cand_url, r.descriptor)
               for r in image_candidate_rows(df).collect()]
        assert out == [("img", "x.gif", ""),
                       ("img-srcset", "y.gif", "2x")]
