"""SubRip (.srt) and WebVTT (.vtt) subtitle parsers.

Subtitle corpora are a major conversational-text source for training
pipelines (OpenSubtitles-style data), but the raw files interleave
cue counters, timestamps, positioning settings, and voice/markup
tags with the dialogue. These parsers extract the CLEAN cue text —
one paragraph span per cue, markup stripped — plus the timing as
typed metadata, so the downstream dedup/quality operators see
dialogue, not timecodes.

SRT: ``index`` line (optional), ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
(comma or dot decimals, optional X/Y position extras), text lines
until a blank line. WebVTT (W3C): ``WEBVTT`` signature, NOTE/STYLE/
REGION blocks skipped, optional cue identifiers, ``.`` decimals and
optional hours, cue settings after the arrow, and ``<v Name>``/
``<i>``/``<c.class>``-style tags stripped (voice names preserved as
``Name:`` speaker prefixes, the conversational form).

Reference parity: the reference routes .srt to its text parser
(mime glob only — matched in mime/globs.py); structured cue
extraction is pipeline extension. Scale: per-row work, no shuffle.
"""

from __future__ import annotations

import re

from tika_spark import charset as cs
from tika_spark.html.layout import safe_chars

_TIME = re.compile(
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})")
_ARROW = re.compile(
    r"^\s*(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})\s*-->\s*"
    r"(?:(\d+):)?(\d{1,2}):(\d{2})[.,](\d{3})(.*)$")
_TAG = re.compile(r"<(/?)([a-zA-Z][\w.]*)(?:\s+([^>]*))?>")
_SRT_IDX = re.compile(r"^\s*\d+\s*$")


def _ms(h, m, s, frac) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 \
        + int(frac)


def _strip_markup(line: str) -> str:
    """Drop <i>/<b>/<c>/<ruby>… tags; render <v Speaker> as a
    'Speaker: ' prefix (WebVTT voice spans)."""
    out = []
    pos = 0
    for mt in _TAG.finditer(line):
        out.append(line[pos:mt.start()])
        if not mt.group(1) and mt.group(2).lower() == "v" \
                and mt.group(3):
            out.append(mt.group(3).strip() + ": ")
        pos = mt.end()
    out.append(line[pos:])
    return "".join(out)


def parse_cues(text: str, vtt: bool) -> list[dict]:
    """[{start_ms, end_ms, text}] from an SRT or WebVTT body."""
    cues: list[dict] = []
    lines = text.replace("﻿", "", 1).split("\n")
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i].rstrip("\r")
        if not line.strip():
            i += 1
            continue
        if vtt:
            head = line.strip().split(" ")[0].upper()
            if head in ("WEBVTT", "NOTE", "STYLE", "REGION"):
                i += 1
                while i < n and lines[i].strip():
                    i += 1                       # skip block body
                continue
        mt = _ARROW.match(line)
        if mt is None:
            # SRT cue counter or WebVTT cue identifier: the arrow
            # must be on the NEXT line
            if i + 1 < n and _ARROW.match(lines[i + 1].rstrip("\r")):
                if not vtt and not _SRT_IDX.match(line):
                    i += 1
                    continue
                i += 1
                mt = _ARROW.match(lines[i].rstrip("\r"))
            else:
                i += 1
                continue
        start = _ms(mt.group(1), mt.group(2), mt.group(3),
                    mt.group(4))
        end = _ms(mt.group(5), mt.group(6), mt.group(7),
                  mt.group(8))
        i += 1
        body: list[str] = []
        while i < n:
            row = lines[i].rstrip("\r")
            if not row.strip():
                break
            body.append(_strip_markup(row).strip())
            i += 1
        if body:
            cues.append({"start_ms": start, "end_ms": end,
                         "text": " ".join(body)})
    return cues


def extract_subtitles(data: bytes, url: str | None = None,
                      declared_type: str | None = None,
                      config=None) -> dict:
    """Pipeline extractor: cue text as one paragraph span per cue,
    timing summary as metadata."""
    data = bytes(data or b"")
    declared = cs.charset_from_content_type(declared_type)
    charset = cs.detect_statistical(data, declared=declared)
    decoded = cs.decode(data, charset)
    vtt = decoded.lstrip("﻿").startswith("WEBVTT")
    cues = parse_cues(decoded, vtt)
    spans = []
    parts = []
    pos = 0
    for cue in cues:
        clean = safe_chars(cue["text"])
        parts.append(clean + "\n")
        spans.append((pos, pos + len(clean), "p"))
        pos += len(clean) + 1
    mime = "text/vtt" if vtt else "application/x-subrip"
    meta = {"Content-Encoding": [charset], "Content-Type": [mime],
            "cue-count": [str(len(cues))]}
    if cues:
        meta["xmpDM:duration"] = [
            f"{cues[-1]['end_ms'] / 1000:.2f}"]
    return {"charset": charset, "title": None,
            "text": "".join(parts), "spans": spans, "links": [],
            "metadata": meta,
            "status": "ok" if cues else "no_cues"}
