"""Media-type supertype lattice and specialization checks.

Semantics re-derived from the reference registry
(tika-core/.../mime/MediaTypeRegistry.java:100-158): the supertype of a
type is, in order —

1. an explicit ``sub-class-of`` registry entry,
2. the parameter-free base if the type has parameters,
3. ``application/xml``  if the subtype ends in ``+xml``,
4. ``application/zip``  if the subtype ends in ``+zip``,
5. ``text/plain``       for any other ``text/*``,
6. ``application/octet-stream`` for anything else non-octet-stream.

``is_specialization_of(a, b)`` walks a's supertype chain looking for b.
"""

from __future__ import annotations

OCTET_STREAM = "application/octet-stream"
TEXT_PLAIN = "text/plain"
APP_XML = "application/xml"
APP_ZIP = "application/zip"

# Explicit sub-class-of entries (subset of tika-mimetypes.xml we route).
_EXPLICIT_SUPER: dict[str, str] = {
    "application/xml": "text/plain",
    "text/html": "text/plain",
    "image/svg+xml": "application/xml",
    "application/xhtml+xml": "application/xml",
    "application/rss+xml": "application/xml",
    "application/atom+xml": "application/xml",
    "application/json": "text/plain",
    "text/csv": "text/plain",
    "text/css": "text/plain",
    "text/x-java-source": "text/plain",
    "application/javascript": "text/plain",
    "application/rtf": "text/plain",
    # text-payload application/* types (the reference's sub-class-of
    # text/plain edges): a name/declared hint for these beats the
    # generic text sniff, and all route to the TXT parser
    "application/x-yaml": "text/plain",
    "application/toml": "text/plain",
    "application/x-sh": "text/plain",
    "application/x-csh": "text/plain",
    "application/x-powershell": "text/plain",
    "application/bat": "text/plain",
    "application/x-tex": "text/plain",
    "application/x-latex": "text/plain",
    "application/x-bibtex-text-file": "text/plain",
    "application/x-ndjson": "application/json",
    "application/ld+json": "application/json",
    "application/geo+json": "application/json",
    "application/x-subrip": "text/plain",
    "text/vtt": "text/plain",
    "application/x-cue": "text/plain",
    "application/vnd.apple.mpegurl": "text/plain",
    "audio/x-mpegurl": "text/plain",
    "audio/x-scpls": "text/plain",
    "text/calendar": "text/plain",
    "text/x-vcard": "text/plain",
    "application/x-pem-file": "text/plain",
    "application/pgp": "text/plain",
    "application/pgp-signature": "text/plain",
    "text/turtle": "text/plain",
    "application/n-triples": "text/plain",
    # container refinements
    "application/vnd.google-earth.kmz": "application/zip",
    "application/vnd.android.package-archive": "application/zip",
    "application/x-xpinstall": "application/zip",
    "application/x-chrome-package": "application/zip",
    "application/x-itunes-ipa": "application/zip",
    "application/x-tika-java-web-archive": "application/java-archive",
    "application/x-tika-java-enterprise-archive":
        "application/java-archive",
    "application/java-archive": "application/zip",
    "application/x-cbz": "application/zip",
    "application/x-debian-package": "application/x-archive",
    # GNU tar ("ustar  \0" magic) is a tar specialization
    # (tika-mimetypes.xml sub-class-of; PackageParser.java:48)
    "application/x-gtar": "application/x-tar",
    "application/vnd.ms-cab-compressed": "application/octet-stream",
    "application/vnd.ms-visio.drawing": "application/zip",
    "application/x-gzip": "application/octet-stream",
    "application/gzip": "application/octet-stream",
    "application/epub+zip": "application/zip",
    "application/vnd.oasis.opendocument.text": "application/zip",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "application/zip",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "application/zip",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "application/zip",
    "application/msword": "application/x-tika-msoffice",
    "application/vnd.ms-excel": "application/x-tika-msoffice",
    "application/vnd.ms-powerpoint": "application/x-tika-msoffice",
    "application/vnd.ms-outlook": "application/x-tika-msoffice",
    "application/vnd.visio": "application/x-tika-msoffice",
    "application/x-mspublisher": "application/x-tika-msoffice",
    "application/x-tika-msoffice": "application/octet-stream",
}


def normalize(mime: str | None) -> str | None:
    """Canonicalize ``type/subtype`` (lowercase, strip params/space)."""
    if not mime:
        return None
    base = mime.split(";", 1)[0].strip().lower()
    if "/" not in base:
        return None
    return base


def supertype(mime: str) -> str | None:
    """One step up the lattice; None at the root (octet-stream)."""
    mime = normalize(mime) or OCTET_STREAM
    if mime == OCTET_STREAM:
        return None
    if mime in _EXPLICIT_SUPER:
        return _EXPLICIT_SUPER[mime]
    t, _, sub = mime.partition("/")
    if sub.endswith("+xml") and mime != APP_XML:
        return APP_XML
    if sub.endswith("+zip") and mime != APP_ZIP:
        return APP_ZIP
    if t == "text" and mime != TEXT_PLAIN:
        return TEXT_PLAIN
    return OCTET_STREAM


def is_specialization_of(a: str | None, b: str | None) -> bool:
    """True iff a is strictly below b in the lattice."""
    a, b = normalize(a), normalize(b)
    if a is None or b is None or a == b:
        return False
    cur = supertype(a)
    seen = 0
    while cur is not None and seen < 32:
        if cur == b:
            return True
        cur = supertype(cur)
        seen += 1
    return False


def supertype_chain(mime: str) -> list[str]:
    """[mime, super, super-super, ..., application/octet-stream]."""
    out = [normalize(mime) or OCTET_STREAM]
    cur = supertype(out[0])
    while cur is not None and len(out) < 32:
        out.append(cur)
        cur = supertype(cur)
    return out
