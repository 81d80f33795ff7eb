"""Arc90 Readability scorer (tika_spark/html/readability.py).

Pins the published scoring recipe: paragraph points, class/id
weights, link-density scaling, top-candidate selection, and the
sibling re-attachment rules.
"""

from tika_spark.html.dom import build_dom, normalize_tree
from tika_spark.html.readability import (
    base_score,
    class_weight,
    link_density,
    main_content_readability,
    paragraph_points,
    top_candidate,
)


def _body(html: str):
    root = build_dom(html)
    _, body = normalize_tree(root)
    return body


LONG = ("This paragraph is comfortably longer than one hundred "
        "characters, with commas, so the length bonus applies and "
        "the candidate scores well above any floor.")


class TestScoringPieces:
    def test_paragraph_points(self):
        assert paragraph_points("short, text") == 2.0  # 1 + 1 comma
        assert paragraph_points("x" * 350) == 4.0      # 1 + cap 3
        assert paragraph_points("a," * 300) == 1.0 + 300 + 3

    def test_class_weight_positive_negative(self):
        body = _body('<body><div class="article"></div>'
                     '<div id="footer"></div>'
                     '<div class="footer" id="content"></div></body>')
        divs = [c for c in body.children if not isinstance(c, str)]
        assert class_weight(divs[0]) == 25.0
        assert class_weight(divs[1]) == -25.0
        assert class_weight(divs[2]) == 0.0  # -25 class +25 id

    def test_base_score_tag_priors(self):
        assert base_score(_body("<body><div></div></body>")
                          .children[0]) == 5.0
        assert base_score(_body("<body><ul></ul></body>")
                          .children[0]) == -3.0
        assert base_score(_body("<body><h1></h1></body>")
                          .children[0]) == -5.0

    def test_link_density(self):
        body = _body('<body><div><a href="/">aaaa</a> bbbb</div></body>')
        div = body.children[0]
        # 4 anchor chars / 9 total ("aaaa bbbb")
        assert abs(link_density(div) - 4 / 9) < 1e-9


class TestTopCandidate:
    def test_positive_class_container_wins(self):
        body = _body(
            f'<body><div class="content"><p>{LONG}</p></div>'
            f'<div id="sidebar"><p>{LONG}</p></div></body>')
        best, score, _ = top_candidate(body)
        assert best.attrs.get("class") == "content"
        # content: 5 + 25 + pts; sidebar: 5 - 25 + pts
        assert score > 30.0

    def test_link_density_scales_score(self):
        linky = " ".join(f'<a href="/{i}">word{i}</a>' for i in range(30))
        body = _body(
            f'<body><div><p>{LONG}</p></div>'
            f'<div><p>{LONG} {linky}</p></div></body>')
        best, _, _ = top_candidate(body)
        assert best is body.children[0]

    def test_short_paragraphs_do_not_score(self):
        body = _body('<body><div><p>tiny text</p></div></body>')
        best, _, _ = top_candidate(body)
        assert best is None


class TestMainContent:
    def test_nav_and_negative_footer_excluded(self):
        body = _body(
            '<body><div class="nav"><a href="/">Home</a>'
            '<a href="/n">News</a></div>'
            f'<div class="content"><p>{LONG}</p><p>{LONG}</p></div>'
            f'<div class="footer"><p>{LONG}</p></div></body>')
        text, spans = main_content_readability(body)
        assert text.count(LONG) == 2
        assert "Home" not in text
        assert [k for _, _, k in spans] == ["top", "top"]

    def test_sibling_p_rule_long_text(self):
        # a bare <p> sibling, >80 chars, zero links -> re-attached
        body = _body(
            f'<body><div class="content"><p>{LONG}</p></div>'
            f'<p>{LONG}</p></body>')
        text, spans = main_content_readability(body)
        assert text.count(LONG) == 2
        assert spans[-1][2] == "sibling"

    def test_sibling_short_needs_sentence_period(self):
        body = _body(
            f'<body><div class="content"><p>{LONG}</p></div>'
            '<p>A short closing line.</p>'
            '<p>no period fragment</p></body>')
        text, _ = main_content_readability(body)
        assert "A short closing line." in text
        assert "no period fragment" not in text

    def test_spans_offsets_match_text(self):
        body = _body(
            f'<body><div class="content"><p>{LONG}</p>'
            f'<p>{LONG}</p></div></body>')
        text, spans = main_content_readability(body)
        for start, end, _ in spans:
            assert text[start:end] == LONG

    def test_empty_body(self):
        assert main_content_readability(_body("<body></body>")) == ("", [])
