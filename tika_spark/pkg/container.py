"""Container-aware type refinement (SURVEY.md §2 B8).

Mirrors the reference's ZipContainerDetector semantics
(tika-parsers/.../pkg/ZipContainerDetector.java:42-160): when magic
says ``application/zip``, look *inside* the central directory to pick
the specific type —

- a ``mimetype`` entry (ODF / EPUB convention) names the type directly;
- ``[Content_Types].xml`` names the OOXML flavor: its main-part
  ContentType override distinguishes the full 16-type family
  (document/template/macro-enabled for word, sheet/template/addin/
  binary for excel, presentation/slideshow/template/addin for
  powerpoint — OOXMLParser.java:44-60's SUPPORTED_TYPES);
- otherwise it stays a plain zip.

OLE2 (doc/xls/ppt/msg) refinement lives in
``tika_spark.ole.parser.refine_ole2`` (POIFSContainerDetector
semantics over the from-scratch CFB reader).

The probe reads only the in-memory bytes it is given (detection stays
bounded: callers pass the full payload but zipfile touches the central
directory + the two probe entries, never every member).
"""

from __future__ import annotations

import io
import re
import zipfile

# mimetype-entry values we recognize directly (ODF family + EPUB,
# OpenDocumentParser.java:46-79's supported set)
_MIMETYPE_ENTRY_TYPES = frozenset(
    ["application/epub+zip"]
    + ["application/vnd.oasis.opendocument." + t for t in (
        "text", "spreadsheet", "presentation", "graphics", "chart",
        "formula", "image", "text-master", "text-web",
        "text-template", "spreadsheet-template",
        "presentation-template", "graphics-template",
        "chart-template", "formula-template", "image-template")]
    + ["application/vnd.sun.xml." + t for t in (
        "writer", "calc", "impress", "draw")])

# OOXML main-part ContentType -> document media type
# (the full OOXMLParser.java:44-60 family)
_OOXML = "application/vnd.openxmlformats-officedocument."
_OOXML_MAIN_PART_TYPES = {
    _OOXML + "wordprocessingml.document.main+xml":
        _OOXML + "wordprocessingml.document",
    _OOXML + "wordprocessingml.template.main+xml":
        _OOXML + "wordprocessingml.template",
    "application/vnd.ms-word.document.macroEnabled.main+xml":
        "application/vnd.ms-word.document.macroenabled.12",
    "application/vnd.ms-word.template.macroEnabledTemplate.main+xml":
        "application/vnd.ms-word.template.macroenabled.12",
    _OOXML + "spreadsheetml.sheet.main+xml":
        _OOXML + "spreadsheetml.sheet",
    _OOXML + "spreadsheetml.template.main+xml":
        _OOXML + "spreadsheetml.template",
    "application/vnd.ms-excel.sheet.macroEnabled.main+xml":
        "application/vnd.ms-excel.sheet.macroenabled.12",
    "application/vnd.ms-excel.template.macroEnabled.main+xml":
        "application/vnd.ms-excel.template.macroenabled.12",
    "application/vnd.ms-excel.addin.macroEnabled.main+xml":
        "application/vnd.ms-excel.addin.macroenabled.12",
    _OOXML + "presentationml.presentation.main+xml":
        _OOXML + "presentationml.presentation",
    _OOXML + "presentationml.slideshow.main+xml":
        _OOXML + "presentationml.slideshow",
    _OOXML + "presentationml.template.main+xml":
        _OOXML + "presentationml.template",
    "application/vnd.ms-powerpoint.presentation.macroEnabled.main+xml":
        "application/vnd.ms-powerpoint.presentation.macroenabled.12",
    "application/vnd.ms-powerpoint.slideshow.macroEnabled.main+xml":
        "application/vnd.ms-powerpoint.slideshow.macroenabled.12",
    "application/vnd.ms-powerpoint.template.macroEnabled.main+xml":
        "application/vnd.ms-powerpoint.template.macroenabled.12",
    "application/vnd.ms-powerpoint.addin.macroEnabled.main+xml":
        "application/vnd.ms-powerpoint.addin.macroenabled.12",
}

# directory-probe fallback when [Content_Types].xml is unreadable
_OOXML_BY_DIR = (
    ("word/", _OOXML + "wordprocessingml.document"),
    ("xl/", _OOXML + "spreadsheetml.sheet"),
    ("ppt/", _OOXML + "presentationml.presentation"),
)

_CT_OVERRIDE_RE = re.compile(
    rb'ContentType="([^"]+\.main\+xml)"')


def refine_container(data: bytes, detected: str) -> str:
    """Refine ``application/zip`` by looking inside; pass everything
    else through unchanged. Never raises (a corrupt zip stays a zip)."""
    if detected != "application/zip":
        return detected
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
            if "mimetype" in names:
                declared = zf.read("mimetype")[:256].decode(
                    "ascii", "replace").strip()
                if declared in _MIMETYPE_ENTRY_TYPES:
                    return declared
            if "[Content_Types].xml" in names:
                raw = zf.read("[Content_Types].xml")[:65536]
                for m in _CT_OVERRIDE_RE.finditer(raw):
                    ct = m.group(1).decode("ascii", "replace")
                    hit = _OOXML_MAIN_PART_TYPES.get(ct)
                    if hit:
                        return hit
                for prefix, mime in _OOXML_BY_DIR:
                    if any(n.startswith(prefix) for n in names):
                        return mime
                # XPS/OXPS: a FixedDocumentSequence part marks the
                # package (no Override needed — extension-mapped)
                if any(n.endswith(".fdseq") for n in names):
                    return "application/vnd.ms-xpsdocument"
            if any(n.endswith(".fdseq") for n in names):
                return "application/vnd.ms-xpsdocument"
            # iWork packages: buildVersionHistory.plist + a content
            # entry whose root QName names the format
            # (IWorkPackageParser.java:64-133)
            if "buildVersionHistory.plist" in names:
                from tika_spark.pkg.iwork import detect_iwork
                hit = detect_iwork(data)
                if hit:
                    return hit
    except Exception:
        pass
    return detected
