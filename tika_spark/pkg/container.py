"""Container-aware type refinement (SURVEY.md §2 B8).

Mirrors the reference's ZipContainerDetector semantics
(tika-parsers/.../pkg/ZipContainerDetector.java:42-160): when magic
says ``application/zip``, look *inside* the central directory to pick
the specific type —

- a ``mimetype`` entry (ODF / EPUB convention) names the type directly;
- ``[Content_Types].xml`` plus a ``word/`` / ``xl/`` / ``ppt/`` payload
  directory identifies the OOXML family;
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
import zipfile

# mimetype-entry values we recognize directly (ODF family + EPUB)
_MIMETYPE_ENTRY_TYPES = frozenset((
    "application/epub+zip",
    "application/vnd.oasis.opendocument.text",
    "application/vnd.oasis.opendocument.spreadsheet",
    "application/vnd.oasis.opendocument.presentation",
    "application/vnd.oasis.opendocument.graphics",
    "application/vnd.oasis.opendocument.text-template",
    "application/vnd.oasis.opendocument.spreadsheet-template",
    "application/vnd.oasis.opendocument.presentation-template",
))

_OOXML_BY_DIR = (
    ("word/", "application/vnd.openxmlformats-officedocument"
              ".wordprocessingml.document"),
    ("xl/", "application/vnd.openxmlformats-officedocument"
            ".spreadsheetml.sheet"),
    ("ppt/", "application/vnd.openxmlformats-officedocument"
             ".presentationml.presentation"),
)


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
                for prefix, mime in _OOXML_BY_DIR:
                    if any(n.startswith(prefix) for n in names):
                        return mime
    except Exception:
        pass
    return detected
