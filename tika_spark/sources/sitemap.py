"""Sitemap parsing: urlset/siteindex files → frontier rows.

No reference counterpart (SURVEY §2.I widening) — the discovery-side
complement of robots.py: crawls seed their frontier from sitemaps,
and at fleet scale parsing them is a column explode over fetched XML
bytes, not a per-file library call.

Semantics (sitemaps.org 0.9, namespace-lenient):
- a ``<urlset>`` yields one entry per ``<url>``: loc (required —
  entries without a loc are dropped), lastmod (raw string, not
  parsed — W3C datetime variants are downstream's concern),
  changefreq, and priority in exact micro-units (``0.8`` →
  800000; absent → the spec default 0.5 → 500000);
- a ``<sitemapindex>`` yields its child sitemap locs with
  ``is_index = true`` so the caller can schedule another fetch round
  (recursion is a driver loop over fetch→parse, bounded by the
  spec's 50k-entries/50MB limits per file);
- malformed XML yields zero rows for that document (H1: never a
  task failure).

Scale: one pandas-UDF parse + explode per sitemap file; output rows
are (source_url, loc, …) strings only.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

import pandas as pd  # module scope: pandas_udf resolves the string
#                      type hints of nested UDFs via __globals__
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_LOCAL = re.compile(r"^\{.*\}")


def _local(tag: str) -> str:
    return _LOCAL.sub("", tag)


def _prio_micro(text: str | None) -> int:
    if text is None:
        return 500_000
    try:
        v = float(text.strip())
    except ValueError:
        return 500_000
    v = min(max(v, 0.0), 1.0)
    return int(round(v * 1_000_000))


def parse_sitemap(data: bytes) -> list[dict]:
    """Entries of one sitemap document (possibly an index). Each dict:
    loc, lastmod, changefreq, priority_micro, is_index."""
    try:
        root = ET.fromstring(bytes(data or b""))
    except ET.ParseError:
        return []
    kind = _local(root.tag)
    out: list[dict] = []
    if kind == "urlset":
        child_tag, is_index = "url", False
    elif kind == "sitemapindex":
        child_tag, is_index = "sitemap", True
    else:
        return []
    for child in root:
        if _local(child.tag) != child_tag:
            continue
        fields = {_local(c.tag): (c.text or "").strip() for c in child}
        loc = fields.get("loc", "")
        if not loc:
            continue
        out.append({
            "loc": loc,
            "lastmod": fields.get("lastmod") or None,
            "changefreq": fields.get("changefreq") or None,
            "priority_micro": _prio_micro(fields.get("priority")),
            "is_index": is_index,
        })
    return out


_ENTRY_TYPE = ("array<struct<loc:string,lastmod:string,"
               "changefreq:string,priority_micro:long,"
               "is_index:boolean>>")


def sitemap_entries(pages: DataFrame, url_col: str = "url",
                    data_col: str = "html") -> DataFrame:
    """(source url, sitemap bytes) → one row per entry."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_ENTRY_TYPE)
    def parse(blobs: pd.Series) -> pd.Series:
        return pd.Series([parse_sitemap(b) for b in blobs])

    return (pages
            .select(F.col(url_col).alias("source_url"),
                    F.explode(parse(F.col(data_col))).alias("e"))
            .select("source_url", "e.loc", "e.lastmod", "e.changefreq",
                    "e.priority_micro", "e.is_index"))
