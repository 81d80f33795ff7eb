"""Magic-byte detection rules.

Semantics re-derived from the reference (tika-core/.../detect/
MagicDetector.java:153-206, mime/Magic.java:67-79): each rule is a set
of (offset-range, pattern, optional mask) clauses; a rule matches if
any clause matches anywhere in its offset window of the document
prefix; rules are evaluated in (priority desc, pattern length desc)
order and the first match wins. Only the first MAGIC_PREFIX (8192)
bytes are ever inspected (mime/MimeTypes.java:465-469).

The rule table below is a from-scratch subset of tika-mimetypes.xml
covering the web-crawl slice (html/xml/pdf/text/feeds/archives/images)
plus common container signatures routed to status rows.
"""

from __future__ import annotations

from typing import NamedTuple

from tika_spark.config import MAGIC_PREFIX


class Clause(NamedTuple):
    lo: int            # window start (inclusive)
    hi: int            # window end (inclusive) for the pattern START
    pattern: bytes
    mask: bytes | None = None
    ci: bool = False   # case-insensitive ASCII match


class MagicRule(NamedTuple):
    mime: str
    priority: int
    clauses: tuple
    # optional AND-clause (the nested <match> children of
    # tika-mimetypes.xml): the rule fires only if ANY of ``clauses``
    # matches AND ``confirm`` (when set) also matches
    confirm: Clause | None = None


def _m(mime: str, priority: int, *clauses: Clause,
       confirm: Clause | None = None) -> MagicRule:
    return MagicRule(mime, priority, tuple(clauses), confirm)


# HTML tag probes, window 0:64, case-insensitive — mirrors the
# reference's priority-40 html magic block (tika-mimetypes.xml:3732-3762).
_HTML_TOKENS = (
    b"<!DOCTYPE HTML", b"<HTML", b"<HEAD", b"<BODY", b"<TITLE",
    b"<h1", b"<H1", b"<!doctype html",
)

MAGIC_RULES: list[MagicRule] = [
    _m("application/pdf", 50, Clause(0, 0, b"%PDF-")),
    _m("application/xml", 50,
       Clause(0, 0, b"<?xml"),
       Clause(0, 0, b"\xef\xbb\xbf<?xml"),          # UTF-8 BOM
       Clause(0, 0, b"\xff\xfe<\x00?\x00x\x00m\x00l\x00"),  # UTF-16LE BOM
       Clause(0, 0, b"\xfe\xff\x00<\x00?\x00x\x00m\x00l")), # UTF-16BE BOM
    _m("application/x-gzip", 45, Clause(0, 0, b"\x1f\x8b")),
    _m("application/zip", 45, Clause(0, 0, b"PK\x03\x04")),
    _m("application/x-bzip2", 45, Clause(0, 0, b"BZh")),
    # POSIX tar: "ustar" magic at offset 257 (tika-mimetypes.xml tar block)
    _m("application/x-tar", 45, Clause(257, 257, b"ustar")),
    _m("application/x-archive", 45, Clause(0, 0, b"!<arch>\n")),
    _m("application/x-cpio", 45, Clause(0, 0, b"070701"),
       Clause(0, 0, b"070702")),
    _m("application/rtf", 50, Clause(0, 0, b"{\\rtf")),
    _m("image/png", 50, Clause(0, 0, b"\x89PNG\r\n\x1a\n")),
    _m("image/gif", 50, Clause(0, 0, b"GIF87a"), Clause(0, 0, b"GIF89a")),
    _m("image/jpeg", 50, Clause(0, 0, b"\xff\xd8\xff")),
    _m("image/bmp", 50, Clause(0, 0, b"BM", mask=None)),
    _m("image/tiff", 50, Clause(0, 0, b"II*\x00"),
       Clause(0, 0, b"MM\x00*")),
    _m("video/x-flv", 50, Clause(0, 0, b"FLV\x01")),
    _m("image/vnd.adobe.photoshop", 50, Clause(0, 0, b"8BPS")),
    _m("application/java-vm", 50, Clause(0, 0, b"\xca\xfe\xba\xbe")),
    _m("application/x-font-ttf", 50, Clause(0, 0, b"\x00\x01\x00\x00"),
       Clause(0, 0, b"true\x00"), Clause(0, 0, b"OTTO")),
    _m("audio/mpeg", 50, Clause(0, 0, b"ID3"),
       Clause(0, 0, b"\xff\xfb"), Clause(0, 0, b"\xff\xfa")),
    _m("application/x-tika-msoffice", 45,
       Clause(0, 0, b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1")),
    # CHM help file: "ITSF" + version 3 LE (tika-mimetypes.xml
    # vnd.ms-htmlhelp block)
    _m("application/vnd.ms-htmlhelp", 50,
       Clause(0, 0, b"ITSF\x03\x00\x00\x00")),
    _m("text/html", 40, *[Clause(0, 64, t, ci=True) for t in _HTML_TOKENS]),
    # mbox before rfc822: "From " (envelope) vs "From:" (header) —
    # tika-mimetypes.xml mbox/message blocks
    _m("application/mbox", 40, Clause(0, 0, b"From ")),
    _m("message/rfc822", 40,
       Clause(0, 0, b"Relay-Version:"), Clause(0, 0, b"Return-Path:"),
       Clause(0, 0, b"Received:"), Clause(0, 0, b"Message-ID:"),
       Clause(0, 0, b"MIME-Version:"), Clause(0, 0, b"From:")),
    # UTF BOMs with no other signature -> text/plain (MimeDetectionTest BOM cases)
    _m("text/plain", 30,
       Clause(0, 0, b"\xef\xbb\xbf"),
       Clause(0, 0, b"\xff\xfe"),
       Clause(0, 0, b"\xfe\xff")),

    # ---- widened web-crawl set (VERDICT r1 task 5): media containers,
    # fonts, databases, modern compression. Priorities follow
    # tika-mimetypes.xml where the reference has the type; types the
    # 1.0-era table lacks (webm/woff/webp/avif/sqlite/wasm/zstd) use
    # their registered IANA names.

    # ISO-BMFF "ftyp" brands at offset 4 (specific brand beats the
    # generic video/quicktime ftyp rule, tika-mimetypes.xml:4107)
    _m("audio/mp4", 60, Clause(4, 4, b"ftypM4A"), Clause(4, 4, b"ftypM4B")),
    _m("video/3gpp", 60, Clause(4, 4, b"ftyp3gp")),
    _m("image/avif", 60, Clause(4, 4, b"ftypavif")),
    _m("image/heic", 60, Clause(4, 4, b"ftypheic"),
       Clause(4, 4, b"ftypheix")),
    _m("video/mp4", 60,
       Clause(4, 4, b"ftypisom"), Clause(4, 4, b"ftypiso2"),
       Clause(4, 4, b"ftypmp41"), Clause(4, 4, b"ftypmp42"),
       Clause(4, 4, b"ftypavc1"), Clause(4, 4, b"ftypdash"),
       Clause(4, 4, b"ftypMSNV")),
    # generic ISO-BMFF / classic QuickTime atoms (tika-mimetypes.xml:3405)
    _m("video/quicktime", 50, Clause(4, 4, b"moov"),
       Clause(4, 4, b"mdat"), Clause(4, 4, b"ftyp")),
    # EBML header; DocType string distinguishes WebM from Matroska
    _m("video/webm", 60, Clause(0, 0, b"\x1aE\xdf\xa3"),
       confirm=Clause(4, 40, b"webm")),
    _m("video/x-matroska", 50, Clause(0, 0, b"\x1aE\xdf\xa3")),
    # Ogg: vorbis/theora first-page probes beat the generic container
    # (tika-mimetypes.xml:2960 audio/ogg priority 60)
    _m("audio/ogg", 60, Clause(0, 0, b"OggS"),
       confirm=Clause(28, 28, b"\x01vorbis")),
    _m("video/ogg", 60, Clause(0, 0, b"OggS"),
       confirm=Clause(28, 28, b"\x80theora")),
    _m("application/ogg", 50, Clause(0, 0, b"OggS")),
    # RIFF containers (masked four-CC at 8, tika-mimetypes.xml:3165,4215)
    _m("image/webp", 50,
       Clause(0, 0, b"RIFF\x00\x00\x00\x00WEBP",
              mask=b"\xff\xff\xff\xff\x00\x00\x00\x00\xff\xff\xff\xff")),
    _m("video/x-msvideo", 50,
       Clause(0, 0, b"RIFF\x00\x00\x00\x00AVI ",
              mask=b"\xff\xff\xff\xff\x00\x00\x00\x00\xff\xff\xff\xff")),
    _m("audio/x-wav", 20,
       Clause(0, 0, b"RIFF\x00\x00\x00\x00WAVE",
              mask=b"\xff\xff\xff\xff\x00\x00\x00\x00\xff\xff\xff\xff")),
    _m("audio/x-flac", 50, Clause(0, 0, b"fLaC")),
    _m("audio/midi", 20, Clause(0, 0, b"MThd")),
    _m("font/woff", 50, Clause(0, 0, b"wOFF")),
    _m("font/woff2", 50, Clause(0, 0, b"wOF2")),
    _m("image/x-icon", 50, Clause(0, 0, b"\x00\x00\x01\x00")),
    _m("application/x-sqlite3", 50, Clause(0, 0, b"SQLite format 3\x00")),
    _m("application/wasm", 50, Clause(0, 0, b"\x00asm")),
    _m("application/x-7z-compressed", 50,
       Clause(0, 0, b"7z\xbc\xaf\x27\x1c")),
    _m("application/x-xz", 50, Clause(0, 0, b"\xfd7zXZ\x00")),
    _m("application/zstd", 50, Clause(0, 0, b"\x28\xb5\x2f\xfd")),
    # PE/ELF executables (reference routes *.exe by glob only;
    # the magic closes the no-name gap)
    _m("application/x-msdownload", 20, Clause(0, 0, b"MZ")),
    _m("application/x-elf", 20, Clause(0, 0, b"\x7fELF")),
    # columnar-data files a training pipeline meets on disk
    _m("application/x-parquet", 50, Clause(0, 0, b"PAR1")),
    # scientific/CAD/mail-wrapper formats the reference names
    # (dwg/DWGParser.java, hdf/netcdf parsers, mail TNEF)
    _m("image/vnd.dwg", 50,
       Clause(0, 0, b"AC1014"), Clause(0, 0, b"AC1015"),
       Clause(0, 0, b"AC1018"), Clause(0, 0, b"AC1021"),
       Clause(0, 0, b"AC1024"), Clause(0, 0, b"AC1012")),
    _m("application/x-netcdf", 50, Clause(0, 0, b"CDF\x01"),
       Clause(0, 0, b"CDF\x02")),
    _m("application/x-hdf", 50, Clause(0, 0, b"\x89HDF\r\n\x1a\n"),
       Clause(0, 0, b"\x0e\x03\x13\x01")),
    _m("application/vnd.ms-tnef", 50,
       Clause(0, 0, b"\x78\x9f\x3e\x22")),
]

# Pre-sort once: priority desc, then longest first-clause pattern desc —
# first match wins (Magic.java:67-79 ordering).
MAGIC_RULES.sort(key=lambda r: (-r.priority, -max(len(c.pattern) for c in r.clauses)))


def _clause_matches(prefix: bytes, c: Clause) -> bool:
    pat = c.pattern
    n = len(pat)
    hay = prefix[c.lo: c.hi + n]
    if c.ci:
        hay = hay.upper()
        pat = pat.upper()
    if c.mask is None:
        return pat in hay if c.hi > c.lo else hay.startswith(pat)
    # masked compare at each window position
    for off in range(0, max(1, len(hay) - n + 1)):
        seg = hay[off: off + n]
        if len(seg) < n:
            break
        if all((s & m) == (p & m) for s, m, p in zip(seg, c.mask, pat)):
            return True
    return False


def match_magic(prefix: bytes) -> str | None:
    """First matching rule's media type, or None.

    ``prefix`` should already be capped at MAGIC_PREFIX bytes.
    """
    if not prefix:
        return None
    prefix = prefix[:MAGIC_PREFIX]
    for rule in MAGIC_RULES:
        for c in rule.clauses:
            if _clause_matches(prefix, c):
                if rule.confirm is None or _clause_matches(prefix,
                                                           rule.confirm):
                    return rule.mime
                break  # confirm failed: fall through to later rules
    return None
