"""MPEG-DASH manifest (.mpd) parsing — ISO/IEC 23009-1.

The XML sibling of HLS (sources/hls.py): a Media Presentation
Description fans out Periods → AdaptationSets → Representations
(bandwidth/codecs/resolution), the crawl-side index of remote
media. Parsed with the stdlib ElementTree the XML tier already uses
(xmlparse.py), namespace-agnostic via localname matching so
`urn:mpeg:dash:schema:mpd:2011` and unnamespaced test files read
the same.

Emitted per representation: period index, adaptation content type
(or derived from mimeType), representation id, bandwidth, WxH,
codecs, plus the MPD-level mediaPresentationDuration parsed from
the ISO-8601 duration form (PT#H#M#S, fractional seconds kept as
ms). Scale: per-row work, no shuffle.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_DUR = re.compile(
    r"^PT(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?$")


def iso_duration_ms(s: str) -> int:
    """PT1H2M3.5S → 3723500; unparseable → 0."""
    m = _DUR.match((s or "").strip())
    if not m:
        return 0
    h = int(m.group(1) or 0)
    mi = int(m.group(2) or 0)
    sec = float(m.group(3) or 0.0)
    return int(round(((h * 60 + mi) * 60 + sec) * 1000))


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _children(el, name: str):
    return [c for c in el if _local(c.tag) == name]


def parse_mpd(text: str) -> dict:
    """One MPD → {duration_ms, type, representations: [{period,
    content_type, rep_id, bandwidth, width, height, codecs}]}."""
    out = {"duration_ms": 0, "type": "static", "representations": []}
    try:
        root = ET.fromstring(text or "")
    except ET.ParseError:
        return out
    if _local(root.tag) != "MPD":
        return out
    out["duration_ms"] = iso_duration_ms(
        root.get("mediaPresentationDuration", ""))
    out["type"] = root.get("type", "static")
    for pi, period in enumerate(_children(root, "Period")):
        for aset in _children(period, "AdaptationSet"):
            ctype = aset.get("contentType", "")
            if not ctype:
                mt = aset.get("mimeType", "")
                ctype = mt.split("/", 1)[0] if mt else ""
            for rep in _children(aset, "Representation"):
                try:
                    bw = int(rep.get("bandwidth", "0"))
                except ValueError:
                    bw = 0

                def _i(attr):
                    try:
                        return int(rep.get(attr, "0"))
                    except ValueError:
                        return 0
                out["representations"].append({
                    "period": pi,
                    "content_type": ctype
                    or (rep.get("mimeType", "").split("/", 1)[0]),
                    "rep_id": rep.get("id", ""),
                    "bandwidth": bw,
                    "width": _i("width"), "height": _i("height"),
                    "codecs": rep.get("codecs")
                    or aset.get("codecs", "")})
    return out


def dash_representations(pages: DataFrame, id_col: str = "url",
                         text_col: str = "mpd") -> DataFrame:
    """DataFrame operator: one row per representation —
    (id, duration_ms, period, content_type, rep_id, bandwidth,
    width, height, codecs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[id_col], pdf[text_col]):
                if isinstance(payload, (bytes, bytearray,
                                        memoryview)):
                    payload = bytes(payload).decode("utf-8",
                                                    "replace")
                p = parse_mpd(str(payload or ""))
                for r in p["representations"]:
                    rows.append((key, p["duration_ms"],
                                 r["period"], r["content_type"],
                                 r["rep_id"], r["bandwidth"],
                                 r["width"], r["height"],
                                 r["codecs"]))
            yield pd.DataFrame(rows, columns=[
                id_col, "duration_ms", "period", "content_type",
                "rep_id", "bandwidth", "width", "height", "codecs"])

    return pages.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} string, duration_ms long, "
                    "period int, content_type string, "
                    "rep_id string, bandwidth long, width int, "
                    "height int, codecs string")
