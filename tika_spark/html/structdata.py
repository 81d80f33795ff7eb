"""Structured-data extraction from HTML: JSON-LD, OpenGraph/Twitter
meta, and HTML5 microdata.

Web pages carry machine-readable entity markup (schema.org) in three
widely-deployed encodings; mining it is a standard Common-Crawl-scale
pipeline stage (knowledge-graph construction, page-type
classification, rich-result corpora — the WDC "Web Data Commons"
extraction). The reference stops at HtmlParser's meta tags
(tika-parsers/.../html/HtmlHandler.java meta handling); entity markup
is pipeline extension.

One document → flat rows ``(fmt, entity, prop, value)``:

- ``json-ld``: every ``<script type="application/ld+json">``; top
  level arrays and ``@graph`` bundles contribute one entity per
  member, ``@context`` is dropped; scalar values pass through as
  text, nested objects/lists stay as canonical JSON
  (``sort_keys``, compact separators) so rows are deterministic.
- ``opengraph`` / ``twitter``: ``<meta property="og:*">`` and
  ``<meta name="twitter:*">`` pairs, one entity 0 per document.
- ``microdata``: every ``itemscope`` element is an entity (document
  order); ``itemprop`` values resolve per the HTML spec's tag rules
  (meta→content, img/audio/video/embed/iframe/source→src,
  a/area/link→href, object→data, data/meter→value, time→datetime,
  else whitespace-normalized text content); a prop that is itself
  ``itemscope`` links to the nested entity as ``#<index>``;
  ``itemtype`` is emitted as the ``@type`` row.

Runs over the same lenient DOM as the extraction chain (html/dom.py),
so broken markup degrades instead of failing. Scale: per-row work in
one mapInPandas — no shuffle, no joins.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd

from tika_spark.html.dom import El, build_dom

_SRC_TAGS = frozenset(("audio", "embed", "iframe", "img", "source",
                       "track", "video"))
_HREF_TAGS = frozenset(("a", "area", "link"))
_SKIP_TEXT = frozenset(("script", "style", "template"))


def _text_of(node) -> str:
    parts: list[str] = []

    def walk(n):
        if isinstance(n, str):
            parts.append(n)
            return
        if n.tag in _SKIP_TEXT:
            return
        for c in n.children:
            walk(c)

    walk(node)
    return " ".join("".join(parts).split())


def _scalar(v) -> str:
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "true" if v else "false"
    if v is None:
        return ""
    if isinstance(v, (int, float)):
        return json.dumps(v)
    return json.dumps(v, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def _jsonld_entities(payload: str) -> list[dict]:
    try:
        data = json.loads(payload)
    except Exception:
        return []
    if isinstance(data, dict) and isinstance(data.get("@graph"), list):
        return [e for e in data["@graph"] if isinstance(e, dict)]
    if isinstance(data, list):
        return [e for e in data if isinstance(e, dict)]
    if isinstance(data, dict):
        return [data]
    return []


def _prop_value(node: El) -> str:
    tag = node.tag
    a = node.attrs
    if tag == "meta":
        return a.get("content", "")
    if tag in _SRC_TAGS:
        return a.get("src", "")
    if tag in _HREF_TAGS:
        return a.get("href", "")
    if tag == "object":
        return a.get("data", "")
    if tag in ("data", "meter"):
        return a.get("value", "")
    if tag == "time":
        return a.get("datetime") or _text_of(node)
    return _text_of(node)


def structured_entities(html_text: str) -> list[dict]:
    """Flat (fmt, entity, prop, value) rows for one document; row
    order is deterministic (document order per format)."""
    root = build_dom(html_text)
    rows: list[dict] = []
    jsonld_idx = 0
    micro_idx = [0]

    def add(fmt, ent, prop, value):
        rows.append({"fmt": fmt, "entity": ent, "prop": prop,
                     "value": value})

    def walk(node, owner: int | None):
        nonlocal jsonld_idx
        if isinstance(node, str):
            return
        tag = node.tag
        a = node.attrs
        if tag == "meta":
            prop = a.get("property", "")
            name = a.get("name", "")
            if prop.startswith("og:"):
                add("opengraph", 0, prop, a.get("content", ""))
            elif name.startswith("twitter:"):
                add("twitter", 0, name, a.get("content", ""))
        if tag == "script" and \
                a.get("type", "").strip().lower() \
                == "application/ld+json":
            payload = "".join(c for c in node.children
                              if isinstance(c, str))
            for ent in _jsonld_entities(payload):
                for k, v in ent.items():
                    if k == "@context":
                        continue
                    add("json-ld", jsonld_idx, k, _scalar(v))
                jsonld_idx += 1
            return
        me = owner
        if "itemscope" in a:
            me = micro_idx[0]
            micro_idx[0] += 1
            if a.get("itemtype"):
                add("microdata", me, "@type", a["itemtype"])
            if owner is not None and a.get("itemprop"):
                for p in a["itemprop"].split():
                    add("microdata", owner, p, f"#{me}")
        elif owner is not None and a.get("itemprop"):
            for p in a["itemprop"].split():
                add("microdata", owner, p, _prop_value(node))
        for c in node.children:
            walk(c, me)

    walk(root, None)
    return rows


def _split_srcset(srcset: str) -> list[tuple[str, str]]:
    """srcset attribute → [(url, descriptor)] (HTML spec §4.8.4.3:
    comma-separated candidates, each a URL optionally followed by a
    width ``640w`` or density ``1.5x`` descriptor). Commas inside
    URLs are rare and unsupported by this simplified splitter —
    matching what major crawl extractors do."""
    out = []
    for cand in (srcset or "").split(","):
        parts = cand.strip().split()
        if not parts:
            continue
        out.append((parts[0],
                    parts[1] if len(parts) > 1 else ""))
    return out


def image_candidates(html_text: str) -> list[dict]:
    """Image-candidate harvest for crawl-side image collection:
    ``<img src/srcset>`` and ``<picture><source srcset>`` rows as
    {tag, url, descriptor} in document order. The responsive-image
    markup carries the HIGH-RESOLUTION variants a naive src-only
    harvester misses."""
    root = build_dom(html_text)
    rows: list[dict] = []

    def walk(node):
        if isinstance(node, str):
            return
        if node.tag == "img":
            if node.attrs.get("src"):
                rows.append({"tag": "img",
                             "url": node.attrs["src"],
                             "descriptor": ""})
            for u, d in _split_srcset(node.attrs.get("srcset", "")):
                rows.append({"tag": "img-srcset", "url": u,
                             "descriptor": d})
        elif node.tag == "source":
            for u, d in _split_srcset(node.attrs.get("srcset", "")):
                rows.append({"tag": "source", "url": u,
                             "descriptor": d})
        for c in node.children:
            walk(c)

    walk(root)
    return rows


def image_candidate_rows(pages, id_col: str = "url",
                         html_col: str = "html"):
    """DataFrame operator: one row per image candidate —
    (id, tag, cand_url, descriptor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for key, payload in zip(pdf[id_col], pdf[html_col]):
                if isinstance(payload, (bytes, bytearray,
                                        memoryview)):
                    text = bytes(payload).decode("utf-8", "replace")
                else:
                    text = str(payload or "")
                for r in image_candidates(text):
                    out.append((key, r["tag"], r["url"],
                                r["descriptor"]))
            yield pd.DataFrame(out, columns=[
                id_col, "tag", "cand_url", "descriptor"])

    return pages.select(id_col, html_col).mapInPandas(
        run, schema=f"{id_col} string, tag string, "
                    "cand_url string, descriptor string")


def structured_data(pages, id_col: str = "url",
                    html_col: str = "html"):
    """DataFrame operator: one row per extracted (fmt, entity, prop,
    value) per page. ``html`` may be binary (decoded utf-8-replace —
    run after the extraction chain's charset stage for full cascade
    fidelity) or string."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for key, payload in zip(pdf[id_col], pdf[html_col]):
                if isinstance(payload, (bytes, bytearray,
                                        memoryview)):
                    text = bytes(payload).decode("utf-8", "replace")
                else:
                    text = str(payload or "")
                for r in structured_entities(text):
                    out.append((key, r["fmt"], r["entity"],
                                r["prop"], r["value"]))
            yield pd.DataFrame(out, columns=[
                id_col, "fmt", "entity", "prop", "value"])

    return pages.select(id_col, html_col).mapInPandas(
        run, schema=f"{id_col} string, fmt string, entity int, "
                    "prop string, value string")
