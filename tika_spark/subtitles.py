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


_ASS_OVERRIDE = re.compile(r"\{[^}]*\}")
_ASS_TIME = re.compile(r"^\s*(\d+):(\d{2}):(\d{2})[.:](\d{2})\s*$")
# v4+ Events order; SSA v4 uses Marked where v4+ has Layer — both
# place Start/End/Name/Text identically, so one default serves both
_ASS_DEFAULT_FIELDS = ("layer", "start", "end", "style", "name",
                      "marginl", "marginr", "marginv", "effect",
                      "text")


def flatten_ass_text(raw: str) -> str:
    r"""Dialogue text → clean dialogue: ``{\...}`` override blocks
    dropped (a ``\p<n>`` drawing mode suppresses the vector payload
    until ``\p0``), ``\N``/``\n`` soft breaks and ``\h`` hard spaces
    become single spaces."""
    parts: list[str] = []
    pos = 0
    drawing = False
    for mt in _ASS_OVERRIDE.finditer(raw):
        if not drawing:
            parts.append(raw[pos:mt.start()])
        block = mt.group(0)
        for dm in re.finditer(r"\\p(\d+)", block):
            drawing = dm.group(1) != "0"
        pos = mt.end()
    if not drawing:
        parts.append(raw[pos:])
    txt = "".join(parts)
    txt = txt.replace("\\N", " ").replace("\\n", " ") \
        .replace("\\h", " ")
    return " ".join(txt.split())


def _ass_ms(stamp: str) -> int | None:
    mt = _ASS_TIME.match(stamp)
    if mt is None:
        return None
    h, m, s, cs_ = mt.groups()
    return ((int(h) * 60 + int(m)) * 60 + int(s)) * 1000 \
        + int(cs_) * 10


def parse_ass_cues(text: str) -> list[dict]:
    """[{start_ms, end_ms, text}] from a SubStation Alpha (.ssa) or
    Advanced SubStation Alpha (.ass) script.

    Section walk to ``[Events]``; the ``Format:`` line fixes the
    field order (the v4/v4+ default when absent); ``Dialogue:``
    lines split on "," with the last field (Text) keeping its
    commas. Times are H:MM:SS.cc centiseconds. A non-empty Name
    field becomes a ``Name: `` speaker prefix, matching the WebVTT
    voice-span convention. ``Comment:`` events are skipped."""
    cues: list[dict] = []
    section = ""
    fields = _ASS_DEFAULT_FIELDS
    for line in text.replace("﻿", "", 1).split("\n"):
        line = line.rstrip("\r")
        s = line.strip()
        if not s:
            continue
        if s.startswith("[") and s.endswith("]"):
            section = s[1:-1].strip().lower()
            continue
        if section != "events":
            continue
        key, _, rest = line.partition(":")
        key = key.strip().lower()
        if key == "format":
            fields = tuple(f.strip().lower()
                           for f in rest.split(","))
            continue
        if key != "dialogue":
            continue
        vals = rest.lstrip().split(",", len(fields) - 1)
        if len(vals) < len(fields):
            continue
        row = dict(zip(fields, vals))
        start = _ass_ms(row.get("start", ""))
        end = _ass_ms(row.get("end", ""))
        if start is None or end is None:
            continue
        body = flatten_ass_text(row.get("text", ""))
        if not body:
            continue
        name = row.get("name", "").strip()
        if name:
            body = name + ": " + body
        cues.append({"start_ms": start, "end_ms": end, "text": body})
    return cues


def looks_like_ass(decoded: str) -> bool:
    head = decoded.lstrip("﻿").lstrip()[:512].lower()
    return head.startswith("[script info]") \
        or head.startswith(";") and "[script info]" in head


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
    ass = not vtt and looks_like_ass(decoded)
    cues = parse_ass_cues(decoded) if ass \
        else parse_cues(decoded, vtt)
    spans = []
    parts = []
    pos = 0
    for cue in cues:
        clean = safe_chars(cue["text"])
        parts.append(clean + "\n")
        spans.append((pos, pos + len(clean), "p"))
        pos += len(clean) + 1
    mime = "text/vtt" if vtt else (
        "text/x-ssa" if ass else "application/x-subrip")
    meta = {"Content-Encoding": [charset], "Content-Type": [mime],
            "cue-count": [str(len(cues))]}
    if cues:
        meta["xmpDM:duration"] = [
            f"{cues[-1]['end_ms'] / 1000:.2f}"]
    return {"charset": charset, "title": None,
            "text": "".join(parts), "spans": spans, "links": [],
            "metadata": meta,
            "status": "ok" if cues else "no_cues"}
