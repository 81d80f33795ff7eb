"""Arc90 Readability main-content scoring (the third block scorer).

From-scratch implementation of the published Readability algorithm
(Arc90's readability.js, the open-source ancestor of Mozilla's
Readability/Firefox Reader View and of the ``readability-lxml``
package): instead of classifying flat text blocks (Boilerpipe,
jusText — html/boilerpipe.py, html/justext.py), Readability scores
DOM *containers* by the prose their paragraph children carry, picks
the top-scoring candidate subtree, and re-attaches qualifying
siblings. The three scorers together cover the practical
main-content spectrum: shallow text features (Boilerpipe), stopword
density (jusText), and DOM-structural container scoring (this
module). No reference counterpart — Tika's ``-T`` mode is
Boilerpipe-only (tika-parsers/.../html/BoilerpipeContentHandler.java);
this is a pipeline extension for corpus curation.

Published scoring recipe (readability.js grabArticle):

1. every ``<p>``/``<td>``/``<pre>`` with >= 25 chars of inner text
   contributes ``1 + count(',') + min(len//100, 3)`` points — the
   full amount to its parent, half to its grandparent;
2. a container's initial score depends on its tag (div +5, pre/td/
   blockquote +3, address/lists/form -3, h1-h6/th -5) plus a
   class/id weight: +25 when class or id matches the positive
   pattern (article|body|content|entry|...), -25 for the negative
   one (comment|footer|sidebar|...) — each of class and id
   contributes independently;
3. final candidate score is scaled by ``1 - link_density`` where
   link density = anchor-text chars / total chars of the subtree;
4. the top candidate wins; each of its siblings is appended when its
   own score >= max(10, 0.2 * top_score), or when it is a ``<p>``
   whose text is long (> 80 chars) with link density < 0.25, or
   short with zero link density ending in a sentence period.

Determinism: ties between equal-scoring candidates resolve to the
earliest in document order (stable DOM walk), so output is a pure
function of the page bytes.

Scale contract: pure per-row function of the already-built DOM —
runs inside the same mapInPandas stage as the other scorers; no
shuffle, no state, one extra O(nodes) walk per page.
"""

from __future__ import annotations

import re

from tika_spark.html.dom import El

POSITIVE_RE = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|"
    r"text|blog|story", re.I)
NEGATIVE_RE = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|"
    r"meta|outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|"
    r"shopping|tags|tool|widget", re.I)

# tags whose text is never prose (mapper discards script/style before
# this module runs, but a raw body may still carry them)
_SKIP_TAGS = frozenset(("script", "style", "noscript", "template",
                        "svg", "head", "title"))

_PARAGRAPH_TAGS = frozenset(("p", "td", "pre"))

_WS_RE = re.compile(r"\s+")

_MIN_PARA_CHARS = 25
_SIBLING_FLOOR = 10.0


def _inner_text(node: El) -> str:
    """Whitespace-normalized text of a subtree (skip non-prose tags)."""
    parts: list[str] = []

    def walk(n: El):
        for c in n.children:
            if isinstance(c, str):
                parts.append(c)
            elif c.tag not in _SKIP_TAGS:
                walk(c)

    walk(node)
    return _WS_RE.sub(" ", "".join(parts)).strip()


def _anchor_chars(node: El, in_anchor: bool = False) -> int:
    total = 0
    for c in node.children:
        if isinstance(c, str):
            if in_anchor:
                total += len(_WS_RE.sub(" ", c).strip())
        elif c.tag not in _SKIP_TAGS:
            total += _anchor_chars(c, in_anchor or c.tag == "a")
    return total


def link_density(node: El) -> float:
    text = _inner_text(node)
    if not text:
        return 0.0
    return min(1.0, _anchor_chars(node) / len(text))


def class_weight(node: El) -> float:
    """+/-25 per matching class and id attribute (readability.js
    getClassWeight)."""
    w = 0.0
    for attr in ("class", "id"):
        v = node.attrs.get(attr) or ""
        if not v:
            continue
        if NEGATIVE_RE.search(v):
            w -= 25.0
        if POSITIVE_RE.search(v):
            w += 25.0
    return w


def base_score(node: El) -> float:
    """initializeNode's per-tag prior + class weight."""
    tag = node.tag
    if tag == "div":
        s = 5.0
    elif tag in ("pre", "td", "blockquote"):
        s = 3.0
    elif tag in ("address", "ol", "ul", "dl", "dd", "dt", "li",
                 "form"):
        s = -3.0
    elif tag in ("h1", "h2", "h3", "h4", "h5", "h6", "th"):
        s = -5.0
    else:
        s = 0.0
    return s + class_weight(node)


def paragraph_points(text: str) -> float:
    """1 + commas + min(len//100, 3) for one qualifying paragraph."""
    return 1.0 + text.count(",") + min(len(text) // 100, 3)


def score_candidates(body: El) -> "dict[int, tuple[El, float]]":
    """id(node) -> (node, raw score before link-density scaling)."""
    scores: dict[int, list] = {}
    parent_of: dict[int, El] = {}

    def note_parent(n: El):
        for c in n.children:
            if isinstance(c, El):
                parent_of[id(c)] = n
                if c.tag not in _SKIP_TAGS:
                    note_parent(c)

    note_parent(body)

    def init(n: El):
        if id(n) not in scores:
            scores[id(n)] = [n, base_score(n)]

    def walk(n: El):
        for c in n.children:
            if isinstance(c, str):
                continue
            if c.tag in _SKIP_TAGS:
                continue
            if c.tag in _PARAGRAPH_TAGS:
                text = _inner_text(c)
                if len(text) >= _MIN_PARA_CHARS:
                    pts = paragraph_points(text)
                    parent = parent_of.get(id(c))
                    if parent is not None and parent.tag != "#root":
                        init(parent)
                        scores[id(parent)][1] += pts
                        gp = parent_of.get(id(parent))
                        if gp is not None and gp.tag != "#root":
                            init(gp)
                            scores[id(gp)][1] += pts / 2.0
            walk(c)

    walk(body)
    return {k: (n, s) for k, (n, s) in scores.items()}


def top_candidate(body: El) -> "tuple[El | None, float, dict]":
    """(winning container, final score, all final scores by id).

    Final score = raw * (1 - link_density); document-order-stable on
    ties (the walk in score_candidates visits in order and dict
    preserves insertion order).
    """
    raw = score_candidates(body)
    best: El | None = None
    best_score = 0.0
    finals: dict[int, float] = {}
    for key, (node, s) in raw.items():
        final = s * (1.0 - link_density(node))
        finals[key] = final
        if best is None or final > best_score:
            best, best_score = node, final
    return best, best_score, finals


_SENTENCE_END_RE = re.compile(r"\.( |$)")


def _sibling_qualifies(sib: El, finals: dict, threshold: float) -> bool:
    s = finals.get(id(sib))
    if s is not None and s >= threshold:
        return True
    if sib.tag == "p":
        text = _inner_text(sib)
        ld = link_density(sib)
        if len(text) > 80 and ld < 0.25:
            return True
        if 0 < len(text) <= 80 and ld == 0.0 \
                and _SENTENCE_END_RE.search(text):
            return True
    return False


def _emit_paragraphs(node: El, out: list[str]):
    """One entry per paragraph-ish descendant (p/td/pre/li/heading),
    falling back to the container's own text when it has none —
    mirrors the one-paragraph-per-block emission of the other two
    scorers so downstream span accounting is uniform."""
    hit = False

    def walk(n: El):
        nonlocal hit
        for c in n.children:
            if isinstance(c, str):
                continue
            if c.tag in _SKIP_TAGS:
                continue
            if c.tag in ("p", "td", "pre", "li", "blockquote",
                         "h1", "h2", "h3", "h4", "h5", "h6"):
                text = _inner_text(c)
                if text:
                    out.append(text)
                    hit = True
            else:
                walk(c)

    walk(node)
    if not hit:
        text = _inner_text(node)
        if text:
            out.append(text)


def main_content_readability(body: El) -> tuple[str, list]:
    """(text, spans) of the Readability extraction — the readability
    analog of boilerpipe.main_content: one newline-terminated
    paragraph per kept paragraph, spans = (start, end, kind) where
    kind is 'top' for the winning container's paragraphs and 'sibling'
    for appended qualifying siblings."""
    best, best_score, finals = top_candidate(body)
    if best is None:
        return "", []
    threshold = max(_SIBLING_FLOOR, best_score * 0.2)

    # locate best's parent to enumerate siblings in document order
    parent: El | None = None

    def find_parent(n: El):
        nonlocal parent
        for c in n.children:
            if isinstance(c, El):
                if c is best:
                    parent = n
                    return
                find_parent(c)
                if parent is not None:
                    return

    find_parent(body)

    keep: list[tuple[El, str]] = []
    if parent is None:
        keep.append((best, "top"))
    else:
        for c in parent.children:
            if not isinstance(c, El):
                continue
            if c is best:
                keep.append((c, "top"))
            elif _sibling_qualifies(c, finals, threshold):
                keep.append((c, "sibling"))

    parts: list[str] = []
    spans: list[tuple[int, int, str]] = []
    pos = 0
    for node, kind in keep:
        paras: list[str] = []
        _emit_paragraphs(node, paras)
        for t in paras:
            parts.append(t + "\n")
            spans.append((pos, pos + len(t), kind))
            pos += len(t) + 1
    return "".join(parts), spans
