"""Metadata-only media parsers (SURVEY.md §2 E12 — the web slice).

The reference's image parsers (tika-parsers/.../image/ImageParser.java,
jpeg/JpegParser.java) emit metadata only (dimensions, format), no text.
We parse the dimensions straight from the container headers — pure byte
peeks bounded to the first few KB, no codec libraries:

- PNG: IHDR width/height (big-endian at offset 16)
- GIF: logical screen descriptor (little-endian at offset 6)
- BMP: BITMAPINFOHEADER (little-endian at offset 18)
- JPEG: first SOFn segment's height/width (segment walk)

Deeper EXIF/XMP extraction is the integration point a codec-equipped
deployment would fill in (see tika_spark.analysis.multimodal for the
decode plumbing contract).
"""

from __future__ import annotations

import struct

from tika_spark.config import ExtractConfig

_DEFAULT = ExtractConfig()

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _png_dims(data: bytes):
    if len(data) >= 24 and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return w, h
    return None


def _gif_dims(data: bytes):
    if len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return w, h
    return None


def _bmp_dims(data: bytes):
    if len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])
        return abs(w), abs(h)
    return None


def _jpeg_dims(data: bytes):
    i, n = 2, min(len(data), 65536)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            break
        seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
        if marker in _SOF_MARKERS and i + 9 <= n:
            h, w = struct.unpack(">HH", data[i + 5:i + 9])
            return w, h
        i += 2 + seg_len
    return None


_BY_MIME = {
    "image/png": _png_dims,
    "image/gif": _gif_dims,
    "image/bmp": _bmp_dims,
    "image/jpeg": _jpeg_dims,
}

# ---- MP3 ID3 tags (reference: tika-parsers/.../mp3/Mp3Parser.java,
# ID3v2Frame.java — an in-repo 1643 LoC frame reader; we cover the
# v1 TAG block and v2 text frames TIT2/TPE1/TALB)

_ID3V2_KEYS = {b"TIT2": "title", b"TPE1": "Author", b"TALB": "album",
               b"TYER": "releaseDate", b"TDRC": "releaseDate",
               b"TCON": "genre"}

_V2_ENCODINGS = {0: "latin-1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _id3_meta(data: bytes) -> dict[str, list[str]]:
    meta: dict[str, list[str]] = {}
    if data[:3] == b"ID3" and len(data) >= 10:
        size = min(_syncsafe(data[6:10]) + 10, len(data))
        i = 10
        while i + 10 <= size:
            fid = data[i:i + 4]
            if not fid.strip(b"\x00"):
                break
            flen = (_syncsafe(data[i + 4:i + 8]) if data[3] >= 4
                    else int.from_bytes(data[i + 4:i + 8], "big"))
            if flen <= 0 or i + 10 + flen > len(data):
                break
            key = _ID3V2_KEYS.get(fid)
            if key:
                body = data[i + 10:i + 10 + flen]
                enc = _V2_ENCODINGS.get(body[0], "latin-1") if body \
                    else "latin-1"
                val = body[1:].decode(enc, "replace").strip("\x00").strip()
                if val:
                    meta.setdefault(key, []).append(val)
            i += 10 + flen
    if len(data) >= 128 and data[-128:-125] == b"TAG":
        tag = data[-128:]

        def fld(lo, hi):
            return tag[lo:hi].split(b"\x00")[0].decode(
                "latin-1", "replace").strip()
        for key, val in (("title", fld(3, 33)), ("Author", fld(33, 63)),
                         ("album", fld(63, 93)),
                         ("releaseDate", fld(93, 97))):
            if val and key not in meta:
                meta[key] = [val]
    return meta


def extract_media(data: bytes, url: str | None = None,
                  declared_type: str | None = None,
                  config: ExtractConfig = _DEFAULT,
                  mime: str = "") -> dict:
    """Metadata-only row: dimensions + format, empty text."""
    data = bytes(data or b"")
    metadata: dict[str, list[str]] = {"Content-Type": [mime or
                                                       "application/"
                                                       "octet-stream"]}
    dims = None
    title = None
    fn = _BY_MIME.get(mime)
    if fn is not None:
        try:
            dims = fn(data)
        except Exception:
            dims = None
    if dims:
        metadata["width"] = [str(dims[0])]
        metadata["height"] = [str(dims[1])]
    if mime == "audio/mpeg":
        try:
            metadata.update(_id3_meta(data))
            title = metadata.get("title", [None])[0]
        except Exception:
            pass
    return {
        "charset": None,
        "title": title,
        "text": "",
        "spans": [],
        "links": [],
        "metadata": metadata,
        "status": "ok",
    }
