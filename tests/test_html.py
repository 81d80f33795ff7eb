"""HTML extraction chain tests.

Pin the semantics of the reference's contracts:
- XHTMLContentHandlerTest.java:48-99 — whitespace skeleton (TAB before
  cells/items, NEWLINE after blocks, inline adds nothing);
- HtmlParserTest.java:78-129 — title/metadata/link extraction, base
  resolution, script/style discarded;
- HtmlParserTest.java:392-406 — boilerplate stripping contract;
- HtmlParser.java:57-64 — charset cascade order and cp1252 default;
- SafeContentHandlerTest — invalid char replacement;
- SecureContentHandler — output ratio guard.
"""

import pytest

from tika_spark import charset as cs
from tika_spark.config import ExtractConfig
from tika_spark.html import extract_html
from tika_spark.html.dom import build_dom, normalize_tree
from tika_spark.html.layout import resolve_url, safe_chars, serialize_body


def body_text(html: str) -> str:
    _, body = normalize_tree(build_dom(html))
    text, _, _ = serialize_body(body)
    return text


class TestLayoutContract:
    """XHTMLContentHandler whitespace skeleton (the byte-parity surface)."""

    def test_paragraph_newline(self):
        assert body_text("<body><p>one</p><p>two</p></body>") == "one\ntwo\n"

    def test_inline_adds_nothing(self):
        assert body_text("<body><p>a<b>b</b><i>c</i>d</p></body>") == "abcd\n"

    def test_table_tabs_and_newlines(self):
        got = body_text("<body><table><tr><td>a</td><td>b</td></tr>"
                        "<tr><td>c</td><td>d</td></tr></table></body>")
        assert got == "\ta\tb\n\tc\td\n\n"

    def test_list_items(self):
        got = body_text("<body><ul><li>x</li><li>y</li></ul></body>")
        assert got == "\tx\n\ty\n\n"

    def test_heading_newlines(self):
        assert body_text("<body><h1>H</h1>text</body>") == "H\ntext"

    def test_br_and_div_newlines(self):
        # div unmapped but in ENDLINE -> newline (TIKA-343)
        assert body_text("<body><div>a<br>b</div></body>") == "a\nb\n"

    def test_script_style_discarded_entirely(self):
        got = body_text("<body><p>keep</p><script>drop()</script>"
                        "<style>.x{}</style></body>")
        assert "drop" not in got and ".x" not in got and "keep" in got

    def test_unknown_element_text_kept(self):
        assert body_text("<body><custom>kept</custom></body>") == "kept"

    def test_whitespace_preserved(self):
        assert body_text("<body><p>a  b</p></body>") == "a  b\n"

    def test_dl_dt_dd(self):
        got = body_text("<body><dl><dt>t</dt><dd>d</dd></dl></body>")
        assert got == "\tt\n\td\n\n"


class TestSafeChars:
    def test_control_chars_replaced(self):
        assert safe_chars("a\x00b\x07c") == "a�b�c"

    def test_valid_whitespace_kept(self):
        assert safe_chars("a\tb\nc\rd") == "a\tb\nc\rd"


class TestResolveUrl:
    BASE = "http://domain.com/nested/path/file.html"

    def test_relative(self):
        assert resolve_url(self.BASE, "other.html") == \
            "http://domain.com/nested/path/other.html"

    def test_absolute_path(self):
        assert resolve_url(self.BASE, "/top.html") == "http://domain.com/top.html"

    def test_query_on_file_base(self):
        # HtmlHandler.java:288-296 special case
        assert resolve_url("http://d.com/a/b.html?x=1", "?pid=2") == \
            "http://d.com/a/b.html?pid=2"

    def test_passthrough_schemes(self):
        for u in ("mailto:x@y.z", "javascript:void(0)", "tel:123",
                  "urn:isbn:1", "data:text/plain,hi", "about:blank"):
            assert resolve_url(self.BASE, u) == u

    def test_no_base(self):
        assert resolve_url(None, "x.html") == "x.html"


class TestCharsetCascade:
    def test_meta_http_equiv_wins(self):
        page = (b"<html><head><meta http-equiv='Content-Type' "
                b"content='text/html; charset=ISO-8859-1'></head>"
                b"<body>caf\xe9</body></html>")
        r = extract_html(page)
        assert r["charset"] == "iso-8859-1"
        assert "caf\xe9" in r["text"]

    def test_html5_meta_charset(self):
        page = b"<html><head><meta charset='utf-8'></head><body>ok</body></html>"
        assert extract_html(page)["charset"] == "utf-8"

    def test_declared_content_type_param(self):
        page = "<html><body>код</body></html>".encode("koi8-r")
        r = extract_html(page, declared_type="text/html; charset=koi8-r")
        assert r["charset"] == "koi8-r"
        assert "код" in r["text"]

    def test_default_cp1252_smart_quotes(self):
        # no charset declared anywhere; 0x93/0x94 are cp1252 smart quotes
        page = b"<html><body><p>\x93quoted\x94</p></body></html>"
        r = extract_html(page)
        assert "“quoted”" in r["text"]

    def test_utf8_bom(self):
        page = b"\xef\xbb\xbf<html><body>\xc3\xa9t\xc3\xa9</body></html>"
        r = extract_html(page)
        assert "été" in r["text"]


class TestHeadMetadata:
    PAGE = (b"<html><head><title>Title: Hello</title>"
            b"<meta name='Author' content='J. Doe'>"
            b"<meta name='ICBM' content='42.3601, -71.0589'>"
            b"<base href='http://base.example/app/'>"
            b"</head><body><p>b</p></body></html>")

    def test_title(self):
        assert extract_html(self.PAGE)["title"] == "Title: Hello"

    def test_meta_and_icbm(self):
        md = extract_html(self.PAGE)["metadata"]
        assert md["Author"] == ["J. Doe"]
        assert md["geo:lat"] == ["42.3601"]
        assert md["geo:long"] == ["-71.0589"]

    def test_base_sets_content_location_and_resolution(self):
        page = self.PAGE.replace(
            b"<p>b</p>", b"<p><a href='x.html'>x</a></p>")
        r = extract_html(page, url="http://orig.example/page.html")
        assert r["metadata"]["Content-Location"] == ["http://base.example/app/"]
        assert r["links"][0][1] == "http://base.example/app/x.html"

    def test_title_not_in_body_text(self):
        assert "Hello" not in extract_html(self.PAGE)["text"]


class TestLinks:
    def test_anchor_and_img(self):
        page = (b"<html><body><p><a href='http://t/x' title='tt'>click "
                b"<img src='i.png' alt='pic'> me</a></p></body></html>")
        links = extract_html(page)["links"]
        kinds = [l[0] for l in links]
        assert "a" in kinds and "img" in kinds
        a = next(l for l in links if l[0] == "a")
        assert a[1] == "http://t/x" and a[2] == "tt"
        assert "click" in a[3] and "pic" in a[3] and "me" in a[3]


class TestBoilerpipe:
    BOILER = (
        b"<html><head><title>B</title></head><body>"
        b"<table><tr><td><a href='/'>Home</a> | <a href='/n'>News</a> | "
        b"<a href='/s'>Sport</a> | <a href='/w'>Weather</a></td></tr></table>"
        b"<div><img src='banner.png' alt=''></div>"
        b"<p>This is the real meat of the page, a long paragraph of actual "
        b"content with enough words to count as a proper content block for "
        b"the classifier to keep, and it needs to keep going for a while "
        b"longer so that the word count rises above the forty-word "
        b"threshold that the published decision tree uses for blocks that "
        b"directly follow link-dense navigation regions of the page.</p>"
        b"<p>This is the end of the text.</p>"
        b"<div><a href='/about'>About</a> <a href='/contact'>Contact</a> "
        b"footer</div></body></html>")

    def test_contract(self):
        # HtmlParserTest.java:392-406 contract shape
        r = extract_html(self.BOILER, config=ExtractConfig(mode="text-main"))
        assert r["text"].startswith("This is the real meat")
        assert r["text"].endswith("This is the end of the text.\n")
        assert "Home" not in r["text"]
        assert "footer" not in r["text"]

    def test_spans_cover_content(self):
        r = extract_html(self.BOILER, config=ExtractConfig(mode="text-main"))
        assert len(r["spans"]) == 2
        s0, e0, k = r["spans"][0]
        assert r["text"][s0:e0].startswith("This is the real meat")
        assert k == "content"

    def test_full_mode_keeps_everything(self):
        r = extract_html(self.BOILER, config=ExtractConfig(mode="text"))
        assert "Home" in r["text"] and "footer" in r["text"]


class TestGuards:
    def test_output_ratio_guard(self):
        # tiny input expanding hugely cannot happen in html (no decompress),
        # so exercise via write_limit instead
        page = b"<html><body><p>" + b"word " * 50_000 + b"</p></body></html>"
        r = extract_html(page, config=ExtractConfig(write_limit=1000))
        assert r["status"] == "write_limit"
        assert len(r["text"]) == 1000

    def test_never_raises_on_garbage(self):
        for junk in (b"", b"\x00\xff" * 400, b"<<<<>>>>", b"<a" * 1000,
                     b"<html><body>" + b"<div>" * 500):
            r = extract_html(junk)
            assert isinstance(r["text"], str)


class TestDomRecovery:
    def test_unclosed_tags(self):
        assert "one" in body_text("<body><p>one<p>two</body>")
        assert body_text("<body><p>one<p>two</body>") == "one\ntwo\n"

    def test_implied_li_close(self):
        got = body_text("<body><ul><li>a<li>b</ul></body>")
        assert got == "\ta\n\tb\n\n"

    def test_stray_end_tag_ignored(self):
        assert body_text("<body></div><p>x</p></body>") == "x\n"

    def test_depth_bomb_flattened(self):
        page = "<body>" + "<blockquote>" * 500 + "deep" + "</blockquote>" * 500
        assert "deep" in body_text(page)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))


class TestDomRecoveryHardening:
    """Round-2 review fixes: p-closing before implied closes,
    self-closing syntax parity, nested-anchor text, wrap counting."""

    @staticmethod
    def _tree(html):
        from tika_spark.html.dom import build_dom

        def fmt(el):
            kids = "".join(fmt(c) for c in el.children
                           if hasattr(c, "tag"))
            return f"<{el.tag}>{kids}</{el.tag}>"
        return fmt(build_dom(html))

    def test_li_closes_p_then_sibling_li(self):
        assert self._tree("<ul><li><p>one<li>two</ul>") == \
            "<#root><ul><li><p></p></li><li></li></ul></#root>"

    def test_td_closes_p_then_sibling_td(self):
        assert self._tree("<table><tr><td><p>x<td>y</table>") == \
            "<#root><table><tr><td><p></p></td><td></td></tr>" \
            "</table></#root>"

    def test_selfclosing_matches_plain_syntax(self):
        from tika_spark.html.dom import build_dom
        a = build_dom('<img src="a" src="b">')
        b = build_dom('<img src="a" src="b"/>')
        assert a.children[0].attrs == b.children[0].attrs == \
            {"src": "a"}  # first duplicate wins in both syntaxes

    def test_nested_anchor_text_propagates(self):
        from tika_spark.config import ExtractConfig
        from tika_spark.html.extract import extract_html
        r = extract_html(
            b'<html><body><a href="http://x/">Hello '
            b'<a href="http://y/">World</a></a></body></html>',
            config=ExtractConfig(mode="text"))
        by_uri = {u: t for _, u, _, t in r["links"]}
        assert by_uri["http://y/"] == "World"
        assert by_uri["http://x/"] == "Hello World"

    def test_wrap_ignores_separator_tokens(self):
        from tika_spark.html.boilerpipe import TextBlock
        text = "word " + "* " * 50
        b = TextBlock(text, num_words=1, anchor_words=0, offset=0,
                      tokens=text.split())
        assert b.wrapped_words >= 0 and b.text_density >= 0.0


class TestTagSoupParityGoldens:
    """Adversarial quirk corpus ported from the reference's HTML test
    strategy (html/HtmlParserTest.java + TagSoup repair semantics):
    bogon containment, unclosed tables, implied tbody, script
    payloads, broken framesets. These pin the repair behavior of
    html/dom.py against checked-in goldens — the SURVEY §7.4 risk was
    that only synthetic fixtures probed it."""

    def test_unclosed_cells_stay_separated(self):
        # HtmlParserTest.testWhitespaceBetweenTableCells (TIKA-59
        # family): 'a' and 'b' must not fuse, even with the optional
        # </td></tr></table> all omitted
        assert body_text("<table><tr><td>a<td>b</table>after") == \
            "\ta\tb\n\nafter"

    def test_unclosed_table_does_not_swallow_tail(self):
        assert body_text("<table><tr><td>cell</table>tail") == \
            "\tcell\n\ntail"

    def test_implied_tbody_is_transparent(self):
        with_tbody = body_text(
            "<table><tbody><tr><td>x</td></tr></tbody></table>")
        without = body_text("<table><tr><td>x</td></tr></table>")
        assert with_tbody == without == "\tx\n\n"

    def test_script_in_html_comment_dropped(self):
        # the classic <script><!-- ... //--></script> hiding idiom
        got = body_text('<p>keep</p><script><!--\n'
                        'document.write("evil")\n//--></script>')
        assert got == "keep\n"
        assert "evil" not in got

    def test_script_with_lt_does_not_swallow_document(self):
        assert body_text("<script>if (a<b) x();</script><p>kept</p>") \
            == "kept\n"

    def test_bogon_does_not_contain_following_content(self):
        # TagSoup bogon handling: an unknown element must not swallow
        # the rest of the document
        assert body_text("<foo><p>inside</p></foo>outside") == \
            "inside\noutside"

    def test_nested_bogons_text_kept(self):
        assert body_text("<blah><blah>deep</blah></blah>") == "deep"

    def test_broken_frameset_in_body(self):
        # HtmlParserTest.testBrokenFrameset: frameset inside body must
        # not crash; frame is in the INDENT set (TAB emitted, like the
        # reference's XHTMLContentHandler), no other body text
        assert body_text('<body><frameset><frame src="f.html"/>'
                         "</frameset></body>") == "\t"

    def test_frame_src_resolved_in_xhtml(self):
        # HtmlParserTest.testFrameSrcExtraction /
        # testBrokenFrameset: the XHTML projection carries the frame
        # with its src resolved against <base>
        r = extract_html(
            b'<html><head><base href="http://domain.com/"/></head>'
            b'<body><frameset><frame src="frame.html"/></frameset>'
            b"</body></html>", config=ExtractConfig(mode="xhtml"))
        assert '<frame src="http://domain.com/frame.html"/>' in r["text"]

    def test_block_inside_cell(self):
        assert body_text(
            "<table><tr><td><p>para</p></td></tr></table>") == \
            "\tpara\n\n\n"

    def test_formatting_across_block_boundary(self):
        # <b> left open across an implied-close <p>: text must survive
        assert body_text("<b>x<p>bold para</p>") == "xbold para\n"

    def test_stray_table_end_inside_list(self):
        assert body_text("<ul><li>one</table><li>two</ul>") == \
            "\tone\n\ttwo\n\n"

    def test_cdata_marker_text(self):
        # TagSoup treats CDATA sections as markup noise in HTML; the
        # surrounding text must survive untouched
        assert body_text("<p>a<![CDATA[ raw ]]>b</p>") == "ab\n"

    def test_unquoted_attributes(self):
        r = extract_html(b'<html><body><a href=foo.html title=x>link'
                         b"</a></body></html>", url="http://h/page",
                         config=ExtractConfig(mode="text"))
        assert r["text"].strip() == "link"
        assert [u for _, u, _, _ in r["links"]] == ["http://h/foo.html"]

    def test_nested_p_implies_close(self):
        assert body_text("<p>one<p>two") == "one\ntwo\n"


class TestJustext:
    """jusText classification (html/justext.py, Pomikálek 2011)."""

    def _blocks(self, *specs):
        from tika_spark.html.boilerpipe import TextBlock
        out = []
        for text, anchor in specs:
            words = text.split()
            out.append(TextBlock(text, len(words), anchor, 0,
                                 tokens=words))
        return out

    def test_context_free_classes(self):
        from tika_spark.html import justext as jt
        good = ("the of and a to in is it on that as for was with be "
                "by at this have from or an are not but had his they "
                "which she you we her all their were when who will "
                "would there what so if no out up into them then its")
        (b_nav, b_good, b_short, b_low,
         b_copy) = self._blocks(
            ("Home News Contact", 3),
            (good, 0),
            ("tiny note", 0),
            ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu nu xi omicron pi rho sigma tau", 0),
            ("\xa9 2026 Example Corp", 0))
        assert jt.classify_context_free(b_nav) == "bad"
        assert jt.classify_context_free(b_good) == "good"
        assert jt.classify_context_free(b_short) == "short"
        assert jt.classify_context_free(b_low) == "bad"
        assert jt.classify_context_free(b_copy) == "bad"

    def test_revision_rules(self):
        from tika_spark.html.justext import revise_classification as rev
        # short surrounded by good -> good; by bad -> bad
        assert rev(["good", "short", "good"])[1] == "good"
        assert rev(["bad", "short", "bad"])[1] == "bad"
        # neargood with any good neighbour -> good, else bad
        assert rev(["good", "neargood", "bad"])[1] == "good"
        assert rev(["bad", "neargood", "bad"])[1] == "bad"
        # the neargood rescue rule fires only in MIXED {good,bad}
        # neighbourhoods where the bad side has a nearer neargood
        assert rev(["good", "short", "neargood", "bad"])[1] == "good"
        assert rev(["good", "short", "bad"])[1] == "bad"      # no rescue
        assert rev(["bad", "short", "neargood", "bad"])[1] == "bad"
        # a PRECEDING neargood cannot rescue: in-order revision has
        # already resolved it to bad by the time the short looks
        assert rev(["neargood", "short", "bad"])[1] == "bad"
        assert rev(["short"])[0] == "bad"  # document edge counts bad
        # in-order mutation: an upgraded neargood feeds the next one
        assert rev(["good", "neargood", "neargood"]) == \
            ["good", "good", "good"]

    def test_mode_end_to_end(self):
        from tika_spark.config import ExtractConfig
        from tika_spark.html.extract import extract_html
        para = ("It was the best of times and it was the worst of "
                "times and we had everything before us and we had "
                "nothing before us and all of us were going direct "
                "to heaven and all of us were going direct the other "
                "way in that season of light")
        html = ("<html><body>"
                '<div><a href="/a">Home</a> <a href="/b">News</a></div>'
                f"<p>{para}</p>"
                "<p>Short middle note here</p>"
                f"<p>{para} again with more of the same words</p>"
                "<p>\xa9 2026 Example Corp</p>"
                "</body></html>").encode()
        r = extract_html(html,
                         config=ExtractConfig(mode="text-main-justext"))
        lines = r["text"].splitlines()
        assert lines[0] == para
        assert lines[1] == "Short middle note here"   # good-sandwich
        assert lines[2].startswith(para)
        assert len(lines) == 3                        # nav+© stripped
        assert r["spans"][1][2] == 4                  # words in span
