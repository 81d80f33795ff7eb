"""Markdown sink (tika_spark/html/markdown.py): structure-preserving
serialization of the mapped DOM."""

from tika_spark.html.dom import build_dom
from tika_spark.html.extract import extract_html
from tika_spark.html.markdown import serialize_markdown
from tika_spark.config import ExtractConfig


def _md(html: str) -> str:
    root = build_dom(html)
    from tika_spark.html.dom import normalize_tree
    _, body = normalize_tree(root)
    return serialize_markdown(body, "http://base.ex/dir/page")


class TestBlocks:
    def test_headings_and_paragraphs(self):
        md = _md("<h1>Top</h1><h2>Sub</h2><p>Body text here.</p>")
        assert md == "# Top\n\n## Sub\n\nBody text here.\n"

    def test_whitespace_collapses_inline(self):
        md = _md("<p>a\n   b\t\tc</p>")
        assert md == "a b c\n"

    def test_loose_text_becomes_paragraph(self):
        md = _md("loose <span>span</span> run<p>real para</p>tail")
        assert md == "loose span run\n\nreal para\n\ntail\n"

    def test_pre_is_fenced_and_verbatim(self):
        md = _md("<pre>x   =  1\ny = 2</pre>")
        assert md == "```\nx   =  1\ny = 2\n```\n"

    def test_blockquote_prefixes_every_line(self):
        md = _md("<blockquote><p>one</p><p>two</p></blockquote>")
        assert md == "> one\n>\n> two\n"

    def test_hr(self):
        assert _md("<p>a</p><hr><p>b</p>") == "a\n\n---\n\nb\n"

    def test_script_and_style_discarded(self):
        md = _md("<p>keep</p><script>var x;</script><style>p{}</style>")
        assert md == "keep\n"


class TestInline:
    def test_link_resolves_relative(self):
        md = _md('<p>see <a href="../x">the docs</a></p>')
        assert md == "see [the docs](http://base.ex/x)\n"

    def test_img_alt_and_src(self):
        md = _md('<p><img src="i.png" alt="pic"/></p>')
        assert md == "![pic](http://base.ex/dir/i.png)\n"

    def test_metachars_escaped(self):
        md = _md("<p>a*b_c[d]e#f</p>")
        assert md == "a\\*b\\_c\\[d\\]e\\#f\n"

    def test_br_hard_break(self):
        md = _md("<p>one<br>two</p>")
        assert md == "one  \ntwo\n"


class TestLists:
    def test_unordered(self):
        md = _md("<ul><li>a</li><li>b</li></ul>")
        assert md == "- a\n- b\n"

    def test_ordered_real_indices(self):
        md = _md("<ol><li>first</li><li>second</li><li>third</li></ol>")
        assert md == "1. first\n2. second\n3. third\n"

    def test_nested_indents_two_spaces(self):
        md = _md("<ul><li>a<ul><li>a1</li><li>a2</li></ul></li>"
                 "<li>b</li></ul>")
        assert md == "- a\n  - a1\n  - a2\n- b\n"


class TestTables:
    def test_gfm_pipes_with_separator(self):
        md = _md("<table><tr><th>k</th><th>v</th></tr>"
                 "<tr><td>id</td><td>7</td></tr></table>")
        assert md == ("| k | v |\n| --- | --- |\n| id | 7 |\n")

    def test_tbody_and_pipe_escape(self):
        md = _md("<table><tbody><tr><td>a|b</td></tr></tbody></table>")
        assert md == "| a\\|b |\n| --- |\n"


class TestPipelineMode:
    def test_extract_html_markdown_mode(self):
        html = (b"<html><head><title>T</title></head><body>"
                b"<h1>H</h1><p>body <a href='http://t.ex/p'>go</a></p>"
                b"</body></html>")
        r = extract_html(html, "http://page.ex/",
                         config=ExtractConfig(mode="markdown"))
        assert r["text"] == "# H\n\nbody [go](http://t.ex/p)\n"
        assert r["status"] == "ok"
        # links side-product still collected
        assert [lk[1] for lk in r["links"]] == ["http://t.ex/p"]

    def test_empty_body(self):
        r = extract_html(b"<html><body></body></html>",
                         config=ExtractConfig(mode="markdown"))
        assert r["text"] == ""


class TestRealisticMixGolden:
    def test_markdown_over_generator_pages_pinned(self):
        """Determinism golden over the realistic 25-variant page mix:
        any serializer behavior change must consciously re-pin this."""
        import hashlib

        from pyspark.sql import SparkSession

        from tika_spark import extract
        from tika_spark.fixtures.pages import generate_pages_df
        spark = (SparkSession.builder.master("local[4]")
                 .config("spark.sql.shuffle.partitions", "4")
                 .getOrCreate())
        out = extract(generate_pages_df(spark, 120), mode="markdown")
        rows = sorted((r.url, r.text or "")
                      for r in out.select("url", "text").collect())
        h = hashlib.md5("\x1e".join(u + "\x1f" + t
                                    for u, t in rows).encode()).hexdigest()
        assert h == "7d2d17d93ceca772f41e970162f2021b"
        assert out.filter("mime = 'text/html'").count() == 40
