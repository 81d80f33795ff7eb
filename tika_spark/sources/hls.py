"""HLS playlist (.m3u8) parsing — RFC 8216.

Web crawls are full of HTTP Live Streaming manifests: master
playlists fan out to bitrate variants, media playlists list the
actual segment URIs with durations. For a media-aware pipeline they
are the *index* of remote video the crawler may fetch next — the
same role sitemaps play for pages — so they parse into typed rows,
not plain text.

``parse_m3u8``: line protocol per RFC 8216 §4 — ``#EXTM3U``
signature, ``#EXT-X-STREAM-INF`` (master variants: BANDWIDTH,
RESOLUTION, CODECS), ``#EXTINF`` durations ahead of each segment
URI, ``#EXT-X-TARGETDURATION`` / ``#EXT-X-MEDIA-SEQUENCE`` /
``#EXT-X-VERSION`` / ``#EXT-X-ENDLIST``. Unknown tags are ignored
per spec; attribute lists split on top-level commas (quoted values
may hold commas).

Reference parity: the reference globs .m3u8 by name only
(mime/globs.py `application/vnd.apple.mpegurl`); structured parsing
is pipeline extension. Scale: per-row work, no shuffle.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

_ATTR = re.compile(r'([A-Z0-9-]+)=("[^"]*"|[^,]*)')


def _attrs(s: str) -> dict[str, str]:
    return {k: v.strip('"') for k, v in _ATTR.findall(s)}


def parse_m3u8(text: str) -> dict:
    """One playlist → typed dict (see module docstring):
    ``{is_master, version, target_duration, media_sequence, ended,
    variants: [{bandwidth, resolution, codecs, uri}],
    segments: [{duration_ms, uri}]}``."""
    out = {"is_master": False, "version": 0, "target_duration": 0,
           "media_sequence": 0, "ended": False,
           "variants": [], "segments": []}
    pending_inf: float | None = None
    pending_var: dict | None = None
    lines = (text or "").replace("﻿", "", 1).split("\n")
    if not lines or lines[0].strip() != "#EXTM3U":
        return out
    for raw in lines[1:]:
        line = raw.strip()
        if not line:
            continue
        if line.startswith("#EXT-X-STREAM-INF:"):
            a = _attrs(line.split(":", 1)[1])
            try:
                bw = int(a.get("BANDWIDTH", "0"))
            except ValueError:
                bw = 0
            pending_var = {"bandwidth": bw,
                           "resolution": a.get("RESOLUTION", ""),
                           "codecs": a.get("CODECS", "")}
            out["is_master"] = True
        elif line.startswith("#EXTINF:"):
            try:
                pending_inf = float(
                    line.split(":", 1)[1].split(",", 1)[0])
            except ValueError:
                pending_inf = 0.0
        elif line.startswith("#EXT-X-VERSION:"):
            try:
                out["version"] = int(line.split(":", 1)[1])
            except ValueError:
                pass
        elif line.startswith("#EXT-X-TARGETDURATION:"):
            try:
                out["target_duration"] = int(line.split(":", 1)[1])
            except ValueError:
                pass
        elif line.startswith("#EXT-X-MEDIA-SEQUENCE:"):
            try:
                out["media_sequence"] = int(line.split(":", 1)[1])
            except ValueError:
                pass
        elif line == "#EXT-X-ENDLIST":
            out["ended"] = True
        elif line.startswith("#"):
            continue                      # unknown tag / comment
        else:                             # a URI line
            if pending_var is not None:
                out["variants"].append({**pending_var, "uri": line})
                pending_var = None
            else:
                out["segments"].append(
                    {"duration_ms": int(round(
                        (pending_inf or 0.0) * 1000)),
                     "uri": line})
                pending_inf = None
    return out


def hls_summary(pages: DataFrame, id_col: str = "url",
                text_col: str = "m3u8") -> DataFrame:
    """DataFrame operator: one summary row per playlist —
    (id, is_master, version, n_variants, max_bandwidth, n_segments,
    total_duration_ms, ended)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, payload in zip(pdf[id_col], pdf[text_col]):
                if isinstance(payload, (bytes, bytearray,
                                        memoryview)):
                    payload = bytes(payload).decode("utf-8",
                                                    "replace")
                p = parse_m3u8(str(payload or ""))
                rows.append((
                    key, p["is_master"], p["version"],
                    len(p["variants"]),
                    max((v["bandwidth"] for v in p["variants"]),
                        default=0),
                    len(p["segments"]),
                    sum(s["duration_ms"] for s in p["segments"]),
                    p["ended"]))
            yield pd.DataFrame(rows, columns=[
                id_col, "is_master", "version", "n_variants",
                "max_bandwidth", "n_segments", "total_duration_ms",
                "ended"])

    return pages.select(id_col, text_col).mapInPandas(
        run, schema=f"{id_col} string, is_master boolean, "
                    "version int, n_variants int, "
                    "max_bandwidth long, n_segments int, "
                    "total_duration_ms long, ended boolean")
