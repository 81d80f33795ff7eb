"""WOFF2 font container (W3C WOFF File Format 2.0) parse + fixture
build over the from-scratch brotli codec (analysis/brotlicodec.py).

Parses the 48-byte header, the flags/UIntBase128 table directory
(known-tag index table, per-table transformation versions,
transformLength presence rules: glyf/loca transform version 0 IS
transformed and version 3 is the null transform; hmtx version 1 is
transformed), decompresses the single brotli stream holding the
concatenated tables, and slices each table at its cumulative offset.
The metadata tier only consumes the ``name`` table (never
transformed), so the glyf/loca geometry transforms are not
reconstructed — parsing stops at table granularity, like the
reference's TrueType handling (`font/TrueTypeParser.java` reads name
records only; WOFF2 itself has no reference counterpart, this is
pipeline extension).

The fixture builder emits genuine WOFF2 files: known-tag flag bytes,
base128 lengths, correct totalSfntSize, and a real brotli stream
(raw / literals / lz modes from the codec module).

Scale contract: per-row work inside mapInPandas; ``max_out`` caps
decompression (inflate-bomb guard); corrupt payloads raise
ValueError and become status rows.
"""

from __future__ import annotations

import struct

from tika_spark.analysis.brotlicodec import compress, decompress

KNOWN_TAGS = (
    "cmap", "head", "hhea", "hmtx", "maxp", "name", "OS/2", "post",
    "cvt ", "fpgm", "glyf", "loca", "prep", "CFF ", "VORG", "EBDT",
    "EBLC", "gasp", "hdmx", "kern", "LTSH", "PCLT", "VDMX", "vhea",
    "vmtx", "BASE", "GDEF", "GPOS", "GSUB", "EBSC", "JSTF", "MATH",
    "CBDT", "CBLC", "COLR", "CPAL", "SVG ", "sbix", "acnt", "avar",
    "bdat", "bloc", "bsln", "cvar", "fdsc", "feat", "fmtx", "fvar",
    "gvar", "hsty", "just", "lcar", "mort", "morx", "opbd", "prop",
    "trak", "Zapf", "Silf", "Glat", "Gloc", "Feat", "Sill",
)
_TAG_INDEX = {t: i for i, t in enumerate(KNOWN_TAGS)}


def read_base128(data: bytes, pos: int) -> tuple[int, int]:
    """UIntBase128 -> (value, new_pos). Max 5 bytes, no leading
    zero byte, fits 32 bits (spec rules)."""
    v = 0
    for i in range(5):
        if pos >= len(data):
            raise ValueError("truncated UIntBase128")
        b = data[pos]
        pos += 1
        if i == 0 and b == 0x80:
            raise ValueError("leading zero in UIntBase128")
        if v > (0xFFFFFFFF >> 7):
            raise ValueError("UIntBase128 overflow")
        v = (v << 7) | (b & 0x7F)
        if not (b & 0x80):
            return v, pos
    raise ValueError("UIntBase128 longer than 5 bytes")


def write_base128(v: int) -> bytes:
    if v < 0 or v > 0xFFFFFFFF:
        raise ValueError("UIntBase128 out of range")
    out = bytearray([v & 0x7F])
    v >>= 7
    while v:
        out.append(0x80 | (v & 0x7F))
        v >>= 7
    return bytes(reversed(out))


def parse_woff2(data: bytes, max_out: int = 1 << 24) -> dict:
    """-> {"flavor": int, "num_tables": n, "tables": [(tag,
    orig_len, stored_len, transform_version)], "data": decompressed
    concatenated tables, "offsets": [per-table offset]}."""
    data = bytes(data or b"")
    if len(data) < 48 or data[:4] != b"wOF2":
        raise ValueError("not a WOFF2 file")
    flavor, total_len, num_tables, _resv = struct.unpack_from(
        ">IIHH", data, 4)
    total_sfnt, comp_len = struct.unpack_from(">II", data, 16)
    if num_tables == 0 or num_tables > 512:
        raise ValueError("unreasonable WOFF2 table count")
    pos = 48
    tables = []
    for _ in range(num_tables):
        if pos >= len(data):
            raise ValueError("truncated WOFF2 directory")
        flags = data[pos]
        pos += 1
        tag_idx = flags & 0x3F
        xform = flags >> 6
        if tag_idx == 0x3F:
            tag = data[pos:pos + 4].decode("latin-1")
            pos += 4
        else:
            tag = KNOWN_TAGS[tag_idx]
        orig_len, pos = read_base128(data, pos)
        transformed = (xform == 0) if tag in ("glyf", "loca") \
            else (xform != 0)
        if transformed:
            stored_len, pos = read_base128(data, pos)
        else:
            stored_len = orig_len
        tables.append((tag, orig_len, stored_len, xform))
    if flavor == 0x74746366:  # 'ttcf' collection: unsupported tail
        raise ValueError("WOFF2 TTC collections not supported")
    comp = data[pos:pos + comp_len]
    if len(comp) < comp_len:
        raise ValueError("WOFF2 compressed block overruns file")
    blob = decompress(comp, max_out=max_out)
    offsets = []
    off = 0
    for _tag, _orig, stored, _x in tables:
        offsets.append(off)
        off += stored
    if off > len(blob):
        raise ValueError("WOFF2 tables overrun decompressed block")
    return {"flavor": flavor, "num_tables": num_tables,
            "tables": tables, "data": blob, "offsets": offsets,
            "total_sfnt": total_sfnt, "length": total_len}


def woff2_table(parsed: dict, tag: str) -> bytes | None:
    """Stored bytes of a table (still transform-encoded for
    transformed glyf/loca/hmtx)."""
    for (t, _orig, stored, _x), off in zip(parsed["tables"],
                                           parsed["offsets"]):
        if t == tag:
            return parsed["data"][off:off + stored]
    return None


def woff2_name_table(data: bytes) -> bytes | None:
    """The sfnt 'name' table bytes (never transformed in WOFF2)."""
    parsed = parse_woff2(data)
    return woff2_table(parsed, "name")


def woff2_bytes(tables: list[tuple[str, bytes]],
                flavor: int = 0x00010000, mode: str = "lz") -> bytes:
    """Build a WOFF2 file from (tag, table bytes) pairs (all tables
    null-transformed; fixture tier)."""
    directory = bytearray()
    blob = bytearray()
    total_sfnt = 12 + 16 * len(tables)
    for tag, body in tables:
        idx = _TAG_INDEX.get(tag, 0x3F)
        xform = 3 if tag in ("glyf", "loca") else 0  # null transform
        directory.append((xform << 6) | idx)
        if idx == 0x3F:
            directory += tag.encode("latin-1")[:4].ljust(4)
        directory += write_base128(len(body))
        blob += body
        total_sfnt += len(body) + ((4 - len(body) % 4) % 4)
    comp = compress(bytes(blob), mode=mode)
    header_len = 48 + len(directory)
    total = header_len + len(comp)
    out = bytearray()
    out += b"wOF2"
    out += struct.pack(">IIHH", flavor, total, len(tables), 0)
    out += struct.pack(">II", total_sfnt, len(comp))
    out += struct.pack(">HH", 1, 0)          # major/minor
    out += struct.pack(">III", 0, 0, 0)      # meta off/len/origLen
    out += struct.pack(">II", 0, 0)          # priv off/len
    out += directory
    out += comp
    return bytes(out)
