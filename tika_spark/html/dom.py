"""Lenient HTML -> lightweight DOM.

The reference uses TagSoup to turn arbitrary broken HTML into
well-formed SAX events (tika-parsers/.../html/HtmlParser.java:167-203).
We build the equivalent from scratch on ``html.parser.HTMLParser``
(a tolerant, non-validating tokenizer) plus explicit recovery rules:

- void elements never push onto the stack;
- implied end tags (``<li>`` closes ``<li>``, ``<td>/<th>`` close each
  other, block starts close an open ``<p>``, ...);
- stray end tags with no matching open element are ignored;
- nesting depth is capped at MAX_XML_DEPTH (the reference's XML-bomb
  guard, tika-core/.../sax/SecureContentHandler.java:75-80): deeper
  elements are flattened into the depth-cap ancestor.

The result is a minimal tree of ``El`` nodes and ``str`` text nodes;
``normalize_tree`` splits it into (head, body) the way TagSoup's
implied html/head/body structure would.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from tika_spark.config import MAX_XML_DEPTH

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr "
    "frame basefont isindex".split())

# starting one of these closes an open <p>
_P_CLOSERS = frozenset(
    "p div ul ol dl li table blockquote pre h1 h2 h3 h4 h5 h6 address form "
    "hr fieldset section article aside nav header footer "
    # table/list internals can never nest inside an open <p> either
    "td th tr thead tbody dd dt".split())

# tag -> set of open tags it implicitly closes (innermost-first)
_IMPLIED_CLOSE = {
    "li": frozenset({"li"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "tr": frozenset({"tr", "td", "th"}),
    "option": frozenset({"option"}),
    "dd": frozenset({"dd", "dt"}),
    "dt": frozenset({"dd", "dt"}),
    "thead": frozenset({"tr", "td", "th"}),
    "tbody": frozenset({"tr", "td", "th", "thead"}),
}

HEAD_ONLY = frozenset("title meta link base".split())


class El:
    """An element node; children are El or str."""

    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []

    def __repr__(self):  # debug aid
        return f"<{self.tag} {len(self.children)} children>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = El("#root")
        self.stack: list[El] = [self.root]

    # -- helpers --
    def _top(self) -> El:
        return self.stack[-1]

    def handle_starttag(self, tag, attrs):
        # html.parser delivers tag and attribute names already
        # lowercased; duplicate attrs keep the first value
        if attrs:
            attr_map = {}
            for k, v in attrs:
                if k and k not in attr_map:
                    attr_map[k] = v if v is not None else ""
        else:
            attr_map = {}
        if tag in _P_CLOSERS:
            # close an open <p> that has no intervening structural ancestor
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == "p":
                    del self.stack[i:]
                    break
                if t not in ("a", "b", "i", "em", "strong", "span", "font",
                             "small", "big", "u", "s", "sub", "sup"):
                    break
        # implied closes run AFTER the p-closer: '<li><p>one<li>' must
        # first close the p, then see the previous li on top
        closers = _IMPLIED_CLOSE.get(tag)
        if closers:
            while len(self.stack) > 1 and self._top().tag in closers:
                self.stack.pop()
        node = El(tag, attr_map)
        self._top().children.append(node)
        if tag not in VOID_ELEMENTS and len(self.stack) < MAX_XML_DEPTH:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        # delegate so self-closing syntax gets the same recovery rules
        # and first-wins attribute dedup as '<tag>' + '</tag>'
        self.handle_starttag(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored (TagSoup-style recovery)

    def handle_data(self, data):
        if data:
            children = self._top().children
            if children and isinstance(children[-1], str):
                children[-1] += data
            else:
                children.append(data)

    # comments, PIs, declarations: dropped (not part of the event stream)


# '<![' openers whose keyword the stdlib tokenizer does not know
# (anything but a real CDATA section) make _markupbase raise mid-
# stream, and the catch-all below would then TRUNCATE the document —
# silent text loss found by the fuzz-diff corpus
# (tests/test_html_fuzz_diff.py). Per the HTML spec these are bogus
# comments; demoting '<![' to '<!' routes them through the
# tokenizer's bogus-comment path (consumed to the next '>') without
# losing the tail of the page.
_BAD_MARKED_SECTION = re.compile(r"<!\[(?![Cc][Dd][Aa][Tt][Aa]\[)")


def build_dom(text: str) -> El:
    """Parse (possibly broken) HTML text into a tree; never raises."""
    builder = _TreeBuilder()
    try:
        builder.feed(_BAD_MARKED_SECTION.sub("<!", text))
        builder.close()
    except Exception:
        # tokenizer blew up mid-stream: keep whatever tree we have
        pass
    return builder.root


def normalize_tree(root: El) -> tuple[El, El]:
    """Split a raw tree into (head, body) with TagSoup-like implication.

    ``<html>`` wrappers are unwrapped; explicit head/body content is
    merged; loose head-only elements (title/meta/link/base) seen before
    any body content count as head; everything else is body.
    """
    head, body = El("head"), El("body")

    def place(nodes, seen_body_content: bool) -> bool:
        for node in nodes:
            if isinstance(node, str):
                if node.strip():
                    body.children.append(node)
                    seen_body_content = True
                continue
            tag = node.tag
            if tag == "html":
                seen_body_content = place(node.children, seen_body_content)
            elif tag == "head":
                head.children.extend(node.children)
            elif tag == "body":
                body.children.extend(node.children)
                seen_body_content = True
            elif tag == "frameset":
                body.children.append(node)
                seen_body_content = True
            elif not seen_body_content and tag in HEAD_ONLY:
                head.children.append(node)
            elif not seen_body_content and tag in ("script", "style"):
                head.children.append(node)
            else:
                body.children.append(node)
                seen_body_content = True
        return seen_body_content

    place(root.children, False)
    return head, body
