"""Visio (HDGF) text extraction (SURVEY.md §2 E7 Visio half).

Mirrors the output semantics of the reference's VisioTextExtractor
path (tika-parsers/.../microsoft/OfficeParser.java:212-218: every
text story becomes one ``<p>`` element, i.e. ``story + "\\n"`` in the
text sink). Re-implemented from the VSD stream layout — derived from
the published reverse-engineering of the format (the vsdump /
libvisio lineage) and validated byte-for-byte against the reference's
own test corpus (``test-documents/testVISIO.vsd``):

- ``VisioDocument`` OLE2 stream: ``"Visio (TM) Drawing\\r\\n"``
  signature, u16 version at 0x1A, and an 18-byte trailer pointer at
  0x24 (u32 type, u32 address, u32 offset, u32 length, u16 format).
- Pointer format: bit 1 set → the pointed-to bytes are compressed
  with Visio's LZSS variant (4096-byte ring buffer initialised to
  zeros, write position starting at 4078, flag bytes LSB-first,
  back-references with *absolute* ring positions:
  ``offset = b1 | ((b2 & 0xF0) << 4)``, ``length = (b2 & 0xF) + 3``);
  the first 4 decompressed bytes are a block header and are skipped.
- A pointer leads to child pointers when its type is 0x14 (trailer),
  its format is 0x1D/0x1E, or the format nibble is 5 (0x50-0x5F):
  u32 at offset 0 of the stream gives the pointer-table offset, a
  u32 count sits there, and the 18-byte pointers start 8 bytes later.
- Format nibble 0xD (0xD0-0xDF) marks a chunk stream: a 27-byte list
  header (u32 ``0xFFFFFFFF`` marker; the u32 at offset 8 is the
  list-body size, with chunks starting right after the body), then a
  sequence of 19-byte chunk headers (u32 type, u32 id, u32 unknown0,
  u32 length, u16 unknown2, u8 unknown3) each followed by ``length``
  body bytes. Some chunk types carry extra bytes after the body —
  an 8-byte trailer + 4-byte separator for the container-ish types
  (0x2C shape-list, 0x46-0x4F page/shape, 0x64-0x71 list types), a
  4-byte separator alone for the section types 0x80-0xC8. The skip
  table was fitted by exhaustively parsing every chunk chain of the
  corpus file to exact stream end (backtracking over candidate
  skips) — each (type, skip) pair is unambiguous there.
- Text lives in chunks of type 0x0E: utf-16-le for version >= 11
  files, cp1252 before, starting 8 bytes into the chunk body.

Fault tolerance follows the package parsers: any structural surprise
ends the walk quietly with whatever text was already collected.
"""

from __future__ import annotations

import struct

from tika_spark.ole.cfb import CfbFile

_VISIO_HEADER = b"Visio (TM) Drawing\r\n"
_TEXT_CHUNK = 0x0E
_MAX_STREAMS = 10_000

# chunk types followed by an 8-byte trailer + 4-byte separator
_TRAILERED = frozenset({0x2C, 0x46, 0x47, 0x48, 0x4A, 0x4F}
                       | set(range(0x64, 0x72)))
# chunk types followed by a 4-byte separator alone
_SEPARATED = frozenset(range(0x80, 0xC9))


def lzw_decompress(src: bytes, limit: int = 64 << 20) -> bytes:
    """Visio LZSS: flag byte (LSB first), 1 = literal, 0 = two-byte
    back-reference into a 4096-byte ring buffer by absolute position.
    """
    buf = bytearray(4096)
    pos = 4078
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < limit:
        flags = src[i]
        i += 1
        for bit in range(8):
            if i >= n:
                break
            if flags & (1 << bit):
                b = src[i]
                i += 1
                out.append(b)
                buf[pos & 4095] = b
                pos += 1
            else:
                if i + 1 >= n:
                    i = n
                    break
                b1, b2 = src[i], src[i + 1]
                i += 2
                offset = b1 | ((b2 & 0xF0) << 4)
                length = (b2 & 0x0F) + 3
                for j in range(length):
                    b = buf[(offset + j) & 4095]
                    out.append(b)
                    buf[pos & 4095] = b
                    pos += 1
    return bytes(out)


def _contents(doc: bytes, offset: int, length: int, fmt: int) -> bytes:
    raw = doc[offset:offset + length]
    if fmt & 2:
        return lzw_decompress(raw)[4:]
    return raw


def _has_pointers(ptr_type: int, fmt: int) -> bool:
    return ptr_type == 0x14 or fmt in (0x1D, 0x1E) or 0x50 <= fmt < 0x60


def _has_chunks(fmt: int) -> bool:
    return 0xD0 <= fmt < 0xE0


def _chunk_texts(stream: bytes, utf16: bool, out: list[str]) -> None:
    p, n = 0, len(stream)
    if n >= 27 and stream[:4] == b"\xff\xff\xff\xff":
        # 27-byte list header; u32 at offset 8 is the list-body size,
        # the first real chunk follows it (rule fitted to every chunk
        # stream of the corpus file)
        lsz, = struct.unpack_from("<I", stream, 8)
        p = 27 + lsz
    def sane(q: int) -> bool:
        if q == n:
            return True
        if q + 19 > n:
            return False
        t, cid, u0, ln = struct.unpack_from("<IIII", stream, q)
        return 0 < t < 0x1000 and q + 19 + ln <= n and cid < 0x100000

    while p + 19 <= n:
        ctype, _cid, _u0, length = struct.unpack_from("<IIII", stream, p)
        body_end = p + 19 + length
        if length > n or body_end > n or not 0 < ctype < 0x1000:
            return  # desync / corrupt tail
        if ctype == _TEXT_CHUNK and length > 8:
            raw = stream[p + 19 + 8:body_end]
            if utf16:
                s = raw[: len(raw) // 2 * 2].decode("utf-16-le",
                                                    "replace")
            else:
                s = raw.decode("cp1252", "replace")
            s = s.replace("\r\n", "\n").replace("\r", "\n")
            if s.strip("\x00 \n"):
                out.append(s.rstrip("\x00"))
        if ctype in _TRAILERED:
            skip = 12
        elif ctype in _SEPARATED:
            skip = 4
        else:
            skip = 0
        p = body_end + skip
        if not sane(p):
            # unknown type's padding: bounded resync attempt
            for alt in (0, 4, 8, 12):
                if alt != skip and sane(body_end + alt):
                    p = body_end + alt
                    break
            else:
                return


def _walk(doc: bytes, offset: int, length: int, fmt: int,
          ptr_type: int, utf16: bool, out: list[str],
          seen: set[tuple[int, int]], depth: int) -> None:
    if length == 0 or offset + length > len(doc) or depth > 16 or \
            (offset, length) in seen or len(seen) > _MAX_STREAMS:
        return
    seen.add((offset, length))
    try:
        c = _contents(doc, offset, length, fmt)
    except Exception:
        return
    if _has_chunks(fmt):
        _chunk_texts(c, utf16, out)
        return
    if _has_pointers(ptr_type, fmt) and len(c) >= 8:
        toff, = struct.unpack_from("<I", c, 0)
        if toff + 8 > len(c):
            return
        count, = struct.unpack_from("<I", c, toff)
        p = toff + 8
        for _ in range(min(count, _MAX_STREAMS)):
            if p + 18 > len(c):
                return
            t, _addr, o2, l2 = struct.unpack_from("<IIII", c, p)
            f2, = struct.unpack_from("<H", c, p + 16)
            p += 18
            _walk(doc, o2, l2, f2, t, utf16, out, seen, depth + 1)


def visio_text_stories(doc: bytes) -> list[str]:
    """All text stories of a VisioDocument stream, document order
    (VisioTextExtractor.getAllText semantics)."""
    if len(doc) < 0x40 or not doc.startswith(_VISIO_HEADER):
        return []
    version, = struct.unpack_from("<H", doc, 0x1A)
    t_type, _addr, t_off, t_len = struct.unpack_from("<IIII", doc, 0x24)
    t_fmt, = struct.unpack_from("<H", doc, 0x34)
    out: list[str] = []
    _walk(doc, t_off, t_len, t_fmt, t_type, version >= 11, out,
          set(), 0)
    return out


def extract_visio_text(cfb: CfbFile) -> str:
    """Text sink shape: one ``<p>`` per story → ``story + "\\n"``."""
    doc = cfb.stream("VisioDocument")
    if not doc:
        return ""
    return "".join(s + "\n" for s in visio_text_stories(doc))
