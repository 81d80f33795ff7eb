"""DOM → Markdown serialization (extraction mode ``markdown``).

No reference counterpart (the reference's sinks are text/XHTML/
metadata — SURVEY §2 A3-A5); this is the sink modern LLM text
pipelines actually train on: structure-preserving Markdown (headings,
lists, links, tables, code blocks) instead of the flat whitespace
skeleton of the ``-t`` text mode.

Normative rules (deterministic, SQL-replayable — the oracle builds
the expected string with the same rules):

- walks the SAME mapped DOM as every other projection (C3 whitelist;
  script/style discarded; unmapped elements contribute their text);
- inline text: each text node's whitespace runs collapse to one
  space; block content is stripped at the edges;
- ``h1``-``h6`` → ``#``×n + space; ``p``/loose text → paragraph;
- ``a href`` → ``[text](resolved-url)``; ``img`` → ``![alt](src)``;
- ``ul``/``ol``/``menu`` items → ``- `` / ``1. `` lines (real
  1-based index); nested lists indent two spaces per level;
- ``pre`` → fenced code block (content verbatim, not collapsed);
- ``blockquote`` → every line prefixed ``> ``;
- ``table`` → GFM pipe rows, a ``---`` separator after the first row;
- ``hr`` → ``---``; ``br`` → hard line break inside the paragraph;
- blocks joined by one blank line; document ends with ``\\n``;
- Markdown metacharacters in text are backslash-escaped
  (`` \\`*_[]# `` and ``|`` inside tables) so the output re-parses.

Inline emphasis (b/i/strong/em) is intentionally absent: the C3
safe-element mapper (DefaultHtmlMapper.java:33-104) drops span-level
elements keeping their text, and this serializer honors the same
whitelist rather than growing a parallel one.
"""

from __future__ import annotations

import re

from tika_spark.html import mapper
from tika_spark.html.dom import El
from tika_spark.html.layout import resolve_url, safe_chars

_WS_RUN = re.compile(r"[ \t\r\n\f]+")
_ESCAPE = re.compile(r"([\\`*_#\[\]])")

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_LISTS = {"ul", "ol", "menu"}
# containers whose children are walked as blocks (loose inline runs
# between them become implicit paragraphs)
_CONTAINERS = {"div", "address", "fieldset", "form", "noscript",
               "frameset", "ins", "del", "object", "map"}


def _esc(s: str) -> str:
    return _ESCAPE.sub(r"\\\1", s)


def _collapse(s: str) -> str:
    return _WS_RUN.sub(" ", s)


def _mapped(node):
    tag = node.tag
    if tag in mapper.DISCARD_ELEMENTS:
        return "discard"
    return mapper.map_safe_element(tag)


class _Md:
    def __init__(self, base_url: str | None):
        self.base = base_url

    # ---------------------------------------------------------- inline

    def inline(self, nodes) -> str:
        return "".join(self._inline_one(n) for n in nodes)

    def _inline_one(self, node) -> str:
        if isinstance(node, str):
            return _collapse(_esc(node))
        m = _mapped(node)
        if m == "discard":
            return ""
        if m == "a" and "href" in node.attrs:
            inner = self.inline(node.children).strip()
            href = resolve_url(self.base, node.attrs.get("href", ""))
            return f"[{inner}]({href})"
        if m == "img":
            alt = _collapse(_esc(node.attrs.get("alt", ""))).strip()
            src = node.attrs.get("src")
            return f"![{alt}]({resolve_url(self.base, src)})" if src else alt
        if m == "br" or node.tag == "br":
            return "  \n"
        return self.inline(node.children)

    def _raw_text(self, node) -> str:
        """Verbatim text (pre/code): no collapsing, no escaping."""
        out = []
        for c in node.children:
            if isinstance(c, str):
                out.append(c)
            elif _mapped(c) != "discard":
                out.append(self._raw_text(c))
        return "".join(out)

    # ---------------------------------------------------------- blocks

    def blocks(self, nodes) -> list[str]:
        """Walk a container's children: block elements recurse, inline
        runs between them flush as implicit paragraphs."""
        out: list[str] = []
        run: list = []

        def flush():
            if run:
                para = self.inline(run).strip()
                if para:
                    out.append(para)
                run.clear()

        for node in nodes:
            if isinstance(node, str) or self._is_inline(node):
                run.append(node)
                continue
            flush()
            out.extend(self._block_one(node))
        flush()
        return out

    def _is_inline(self, node) -> bool:
        m = _mapped(node)
        if m == "discard":
            return False
        if m in ("a", "img", "br", "q") or node.tag == "br":
            return True
        if node.tag == "hr":
            return False
        if m is None and node.tag not in _CONTAINERS:
            # unmapped non-container (span/b/i/...): text-keeping inline
            return True
        return False

    def _block_one(self, node) -> list[str]:
        m = _mapped(node)
        tag = node.tag
        if m == "discard":
            return []
        if m in _HEADINGS:
            body = self.inline(node.children).strip()
            return [f"{'#' * _HEADINGS[m]} {body}"] if body else []
        if m == "p":
            body = self.inline(node.children).strip()
            return [body] if body else []
        if m == "pre":
            body = self._raw_text(node).strip("\n")
            return [f"```\n{body}\n```"]
        if m == "blockquote":
            inner = self.blocks(node.children)
            if not inner:
                return []
            quoted = "\n\n".join(inner)
            return ["\n".join("> " + ln if ln else ">"
                              for ln in quoted.split("\n"))]
        if m in _LISTS or tag in _LISTS:
            return [self._list(node)] if node.children else []
        if m == "table":
            t = self._table(node)
            return [t] if t else []
        if m == "hr" or tag == "hr":
            return ["---"]
        if m in ("dl",):
            return self.blocks(node.children)
        if m in ("dt", "dd", "li", "td", "th", "tr", "thead", "tbody",
                 "tfoot"):
            # stray row/item outside its container: treat as paragraph
            body = self.inline(node.children).strip()
            return [body] if body else []
        # div and every other container
        return self.blocks(node.children)

    def _list(self, node, depth: int = 0) -> str:
        ordered = node.tag == "ol"
        indent = "  " * depth
        lines: list[str] = []
        idx = 0
        for item in node.children:
            if isinstance(item, str) or _mapped(item) not in ("li",):
                continue
            idx += 1
            marker = f"{idx}. " if ordered else "- "
            sublists = [c for c in item.children
                        if isinstance(c, El) and (c.tag in _LISTS)]
            inline_kids = [c for c in item.children
                           if not (isinstance(c, El) and c.tag in _LISTS)]
            body = self.inline(inline_kids).strip()
            lines.append(f"{indent}{marker}{body}")
            for sub in sublists:
                sub_md = self._list(sub, depth + 1)
                if sub_md:
                    lines.append(sub_md)
        return "\n".join(lines)

    def _table(self, node) -> str:
        rows: list[list[str]] = []
        for section in node.children:
            if isinstance(section, str):
                continue
            if section.tag in ("thead", "tbody", "tfoot"):
                cand = section.children
            else:
                cand = [section]
            for tr in cand:
                if isinstance(tr, str) or tr.tag != "tr":
                    continue
                cells = [self.inline(td.children).strip()
                         .replace("|", "\\|")
                         for td in tr.children
                         if isinstance(td, El) and td.tag in ("td", "th")]
                if cells:
                    rows.append(cells)
        if not rows:
            return ""
        lines = ["| " + " | ".join(rows[0]) + " |",
                 "| " + " | ".join("---" for _ in rows[0]) + " |"]
        for r in rows[1:]:
            lines.append("| " + " | ".join(r) + " |")
        return "\n".join(lines)


def serialize_markdown(body: El, base_url: str | None = None) -> str:
    """Markdown projection of a mapped body tree. Returns the blocks
    joined by blank lines with a single trailing newline ('' for an
    empty body)."""
    md = _Md(base_url)
    out = md.blocks(body.children)
    if not out:
        return ""
    return safe_chars("\n\n".join(out) + "\n")
