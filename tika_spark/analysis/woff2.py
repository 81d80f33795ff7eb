"""WOFF2 font container (W3C WOFF File Format 2.0) parse + fixture
build over the from-scratch brotli codec (analysis/brotlicodec.py).

Parses the 48-byte header, the flags/UIntBase128 table directory
(known-tag index table, per-table transformation versions,
transformLength presence rules: glyf/loca transform version 0 IS
transformed and version 3 is the null transform; hmtx version 1 is
transformed), decompresses the single brotli stream holding the
concatenated tables, and slices each table at its cumulative offset.
The metadata tier consumes the ``name`` table (never transformed)
like the reference's TrueType handling (`font/TrueTypeParser.java`
reads name records only; WOFF2 itself has no reference counterpart,
this is pipeline extension) — and, beyond the reference, the
glyf/loca GEOMETRY TRANSFORM (spec section 5.1-5.3) is fully
reconstructed: per-glyph contour counts, 255UInt16 point counts,
one flag byte per point, triplet-coded coordinate deltas (the six
flag bands: y-only, x-only, 4+4-bit, 8+8-bit offset, 12+12-bit,
16+16-bit), composite pass-through with instruction split, the bbox
bitmap/stream, and loca regeneration in either index format. The
inverse transform (``transform_glyf``) exists for the fixture tier,
so the decode path is dual-path verified: standard glyf -> transform
-> reconstruct -> byte-compare, the same discipline as the other
from-scratch codecs in this tree.

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


# ------------------------------------------------ 255UInt16 code --

def read_255ushort(data: bytes, pos: int) -> tuple[int, int]:
    """Variable-length UInt16 (spec 5.1) -> (value, new_pos)."""
    if pos >= len(data):
        raise ValueError("truncated 255UInt16")
    code = data[pos]
    pos += 1
    if code == 253:                      # wordCode: 2-byte BE word
        if pos + 2 > len(data):
            raise ValueError("truncated 255UInt16 word")
        return (data[pos] << 8) | data[pos + 1], pos + 2
    if code == 255:                      # oneMoreByteCode1: b + 253
        if pos >= len(data):
            raise ValueError("truncated 255UInt16")
        return data[pos] + 253, pos + 1
    if code == 254:                      # oneMoreByteCode2: b + 506
        if pos >= len(data):
            raise ValueError("truncated 255UInt16")
        return data[pos] + 506, pos + 1
    return code, pos


def write_255ushort(v: int) -> bytes:
    if not 0 <= v <= 0xFFFF:
        raise ValueError("255UInt16 out of range")
    if v < 253:
        return bytes([v])
    if v < 506:
        return bytes([255, v - 253])
    if v < 762:
        return bytes([254, v - 506])
    return bytes([253, v >> 8, v & 0xFF])


# ------------------------------------------- coordinate triplets --

# extra glyphStream bytes per flag band (beyond the flag byte)
def _triplet_nbytes(k: int) -> int:
    if k < 84:
        return 1
    if k < 120:
        return 2
    if k < 124:
        return 3
    return 4


def decode_triplet(flag: int, buf: bytes, pos: int
                   ) -> tuple[int, int, int]:
    """One point's (dx, dy, new_pos) from the glyphStream (spec 5.2
    pseudo-code; flag is the low 7 bits of the flagStream byte)."""
    k = flag & 0x7F

    def sgn(f: int, v: int) -> int:
        return v if (f & 1) else -v

    n = _triplet_nbytes(k)
    if pos + n > len(buf):
        raise ValueError("glyphStream triplet overrun")
    b = buf[pos:pos + n]
    if k < 10:
        dx, dy = 0, sgn(k, ((k & 14) << 7) + b[0])
    elif k < 20:
        dx, dy = sgn(k, (((k - 10) & 14) << 7) + b[0]), 0
    elif k < 84:
        t = k - 20
        dx = sgn(k, 1 + (t & 0x30) + (b[0] >> 4))
        dy = sgn(k >> 1, 1 + ((t & 0x0C) << 2) + (b[0] & 0x0F))
    elif k < 120:
        t = k - 84
        dx = sgn(k, 1 + ((t // 12) << 8) + b[0])
        dy = sgn(k >> 1, 1 + (((t % 12) >> 2) << 8) + b[1])
    elif k < 124:
        dx = sgn(k, (b[0] << 4) | (b[1] >> 4))
        dy = sgn(k >> 1, ((b[1] & 0x0F) << 8) | b[2])
    else:
        dx = sgn(k, (b[0] << 8) | b[1])
        dy = sgn(k >> 1, (b[2] << 8) | b[3])
    return dx, dy, pos + n


def encode_triplet(dx: int, dy: int, on_curve: bool
                   ) -> tuple[int, bytes]:
    """(flag byte, glyphStream bytes) for one point — always the
    shortest band that fits, mirroring decode_triplet exactly."""
    sx = 1 if dx >= 0 else 0             # withSign: bit set = keep
    sy = 1 if dy >= 0 else 0
    ax, ay = abs(dx), abs(dy)
    if dx == 0 and ay <= 1279:
        k = ((ay >> 8) << 1) | sy
        body = bytes([ay & 0xFF])
    elif dy == 0 and ax <= 1279:
        k = 10 + (((ax >> 8) << 1) | sx)
        body = bytes([ax & 0xFF])
    elif 1 <= ax <= 64 and 1 <= ay <= 64:
        k = 20 + (((ax - 1) & 0x30) + ((((ay - 1) & 0x30) >> 4) << 2)
                  + (sy << 1) + sx)
        body = bytes([(((ax - 1) & 0x0F) << 4) | ((ay - 1) & 0x0F)])
    elif 1 <= ax <= 768 and 1 <= ay <= 768:
        k = 84 + 12 * ((ax - 1) >> 8) + 4 * ((ay - 1) >> 8) \
            + (sy << 1) + sx
        body = bytes([(ax - 1) & 0xFF, (ay - 1) & 0xFF])
    elif ax < 4096 and ay < 4096:
        k = 120 + (sy << 1) + sx
        body = bytes([ax >> 4, ((ax & 0x0F) << 4) | (ay >> 8),
                      ay & 0xFF])
    elif ax < 65536 and ay < 65536:
        k = 124 + (sy << 1) + sx
        body = bytes([ax >> 8, ax & 0xFF, ay >> 8, ay & 0xFF])
    else:
        raise ValueError("coordinate delta exceeds 16 bits")
    return k | (0 if on_curve else 0x80), body


# ----------------------------------------- standard sfnt glyf IO --

_ON_CURVE, _X_SHORT, _Y_SHORT = 0x01, 0x02, 0x04
_REPEAT, _X_SAME, _Y_SAME = 0x08, 0x10, 0x20
_ARG_WORDS, _MORE, _HAVE_SCALE = 0x0001, 0x0020, 0x0008
_XY_SCALE, _TWO_BY_TWO, _HAVE_INSTR = 0x0040, 0x0080, 0x0100


def parse_loca(loca: bytes, index_format: int) -> list[int]:
    if index_format == 0:
        n = len(loca) // 2
        return [struct.unpack_from(">H", loca, 2 * i)[0] * 2
                for i in range(n)]
    n = len(loca) // 4
    return [struct.unpack_from(">I", loca, 4 * i)[0]
            for i in range(n)]


def build_loca(offsets: list[int], index_format: int) -> bytes:
    if index_format == 0:
        if any(o & 1 for o in offsets):
            raise ValueError("odd offset needs long loca")
        return b"".join(struct.pack(">H", o // 2) for o in offsets)
    return b"".join(struct.pack(">I", o) for o in offsets)


def parse_glyph(rec: bytes) -> dict | None:
    """One sfnt glyph record -> dict (None for the empty glyph).

    Simple: {"bbox", "end_pts", "points": [(x, y, on)...],
    "instructions"}; composite: {"bbox", "composite": component
    record bytes, "instructions"}.
    """
    if not rec:
        return None
    n_cont, x0, y0, x1, y1 = struct.unpack_from(">hhhhh", rec, 0)
    pos = 10
    if n_cont < 0:                       # composite
        comp_start = pos
        instr = b""
        have_instr = False
        while True:
            cflags, = struct.unpack_from(">H", rec, pos)
            pos += 4                     # flags + glyphIndex
            pos += 4 if (cflags & _ARG_WORDS) else 2
            if cflags & _HAVE_SCALE:
                pos += 2
            elif cflags & _XY_SCALE:
                pos += 4
            elif cflags & _TWO_BY_TWO:
                pos += 8
            have_instr = have_instr or bool(cflags & _HAVE_INSTR)
            if not (cflags & _MORE):
                break
        comp = rec[comp_start:pos]
        if have_instr:
            n_i, = struct.unpack_from(">H", rec, pos)
            pos += 2
            instr = rec[pos:pos + n_i]
        return {"bbox": (x0, y0, x1, y1), "composite": comp,
                "instructions": instr}
    end_pts = [struct.unpack_from(">H", rec, pos + 2 * i)[0]
               for i in range(n_cont)]
    pos += 2 * n_cont
    n_pts = (end_pts[-1] + 1) if end_pts else 0
    n_i, = struct.unpack_from(">H", rec, pos)
    pos += 2
    instr = rec[pos:pos + n_i]
    pos += n_i
    flags: list[int] = []
    while len(flags) < n_pts:
        f = rec[pos]
        pos += 1
        flags.append(f)
        if f & _REPEAT:
            flags.extend([f] * rec[pos])
            pos += 1
    xs: list[int] = []
    x = 0
    for f in flags:
        if f & _X_SHORT:
            d = rec[pos]
            pos += 1
            x += d if (f & _X_SAME) else -d
        elif not (f & _X_SAME):
            x += struct.unpack_from(">h", rec, pos)[0]
            pos += 2
        xs.append(x)
    ys: list[int] = []
    y = 0
    for f in flags:
        if f & _Y_SHORT:
            d = rec[pos]
            pos += 1
            y += d if (f & _Y_SAME) else -d
        elif not (f & _Y_SAME):
            y += struct.unpack_from(">h", rec, pos)[0]
            pos += 2
        ys.append(y)
    pts = [(xs[i], ys[i], bool(flags[i] & _ON_CURVE))
           for i in range(n_pts)]
    return {"bbox": (x0, y0, x1, y1), "end_pts": end_pts,
            "points": pts, "instructions": instr}


def build_glyph(g: dict | None) -> bytes:
    """dict -> sfnt glyph record. Simple-glyph flags use the
    short-vector and same-value optimizations but not RLE repeat —
    any sfnt consumer accepts that; the dual-path tests compare
    geometry, not flag packing."""
    if g is None:
        return b""
    x0, y0, x1, y1 = g["bbox"]
    if "composite" in g:
        out = bytearray(struct.pack(">hhhhh", -1, x0, y0, x1, y1))
        out += g["composite"]
        have_instr = False
        pos = 0
        comp = g["composite"]
        while pos < len(comp):
            cflags, = struct.unpack_from(">H", comp, pos)
            have_instr = have_instr or bool(cflags & _HAVE_INSTR)
            pos += 4 + (4 if cflags & _ARG_WORDS else 2)
            pos += (2 if cflags & _HAVE_SCALE else
                    4 if cflags & _XY_SCALE else
                    8 if cflags & _TWO_BY_TWO else 0)
            if not (cflags & _MORE):
                break
        if have_instr:
            out += struct.pack(">H", len(g["instructions"]))
            out += g["instructions"]
        return bytes(out)
    pts = g["points"]
    out = bytearray(struct.pack(">hhhhh", len(g["end_pts"]),
                                x0, y0, x1, y1))
    for e in g["end_pts"]:
        out += struct.pack(">H", e)
    out += struct.pack(">H", len(g["instructions"]))
    out += g["instructions"]
    flags = bytearray()
    xb, yb = bytearray(), bytearray()
    px = py = 0
    for x, y, on in pts:
        dx, dy = x - px, y - py
        px, py = x, y
        f = _ON_CURVE if on else 0
        if dx == 0:
            f |= _X_SAME
        elif -255 <= dx <= 255:
            f |= _X_SHORT | (_X_SAME if dx > 0 else 0)
            xb.append(abs(dx))
        else:
            xb += struct.pack(">h", dx)
        if dy == 0:
            f |= _Y_SAME
        elif -255 <= dy <= 255:
            f |= _Y_SHORT | (_Y_SAME if dy > 0 else 0)
            yb.append(abs(dy))
        else:
            yb += struct.pack(">h", dy)
        flags.append(f)
    return bytes(out + flags + xb + yb)


def build_glyf(glyphs: list[dict | None], index_format: int = 1
               ) -> tuple[bytes, bytes]:
    """-> (glyf, loca). Short loca pads each record to 2 bytes."""
    blob = bytearray()
    offsets = [0]
    for g in glyphs:
        rec = build_glyph(g)
        if index_format == 0 and len(rec) & 1:
            rec += b"\x00"
        blob += rec
        offsets.append(len(blob))
    return bytes(blob), build_loca(offsets, index_format)


# ------------------------------------- glyf transform (spec 5.1) --

def transform_glyf(glyf: bytes, loca: bytes, index_format: int,
                   explicit_bbox: bool = False) -> bytes:
    """Standard glyf+loca -> WOFF2 transformed-glyf bytes (the
    encoder side; fixture tier). Composite glyphs always carry an
    explicit bbox (spec requirement); simple glyphs only when
    ``explicit_bbox`` (the decoder recomputes it from points
    otherwise, which matches for fonts whose bbox IS the point
    extremum — true of everything this fixture tier builds)."""
    offs = parse_loca(loca, index_format)
    n_glyphs = len(offs) - 1
    n_cont = bytearray()
    n_points = bytearray()
    flag_s = bytearray()
    glyph_s = bytearray()
    comp_s = bytearray()
    bbox_bitmap = bytearray(((n_glyphs + 31) >> 5) << 2)
    bbox_s = bytearray()
    instr_s = bytearray()
    for i in range(n_glyphs):
        g = parse_glyph(glyf[offs[i]:offs[i + 1]])
        if g is None:
            n_cont += struct.pack(">h", 0)
            continue
        want_bbox = explicit_bbox or "composite" in g
        if want_bbox:
            bbox_bitmap[i >> 3] |= 0x80 >> (i & 7)
            bbox_s += struct.pack(">hhhh", *g["bbox"])
        if "composite" in g:
            n_cont += struct.pack(">h", -1)
            comp_s += g["composite"]
            have_instr = b"\x01" if g["instructions"] else b""
            # instruction length rides the glyphStream iff the
            # WE_HAVE_INSTRUCTIONS flag is set in a component
            pos = 0
            hi = False
            while pos < len(g["composite"]):
                cf, = struct.unpack_from(">H", g["composite"], pos)
                hi = hi or bool(cf & _HAVE_INSTR)
                pos += 4 + (4 if cf & _ARG_WORDS else 2)
                pos += (2 if cf & _HAVE_SCALE else
                        4 if cf & _XY_SCALE else
                        8 if cf & _TWO_BY_TWO else 0)
                if not (cf & _MORE):
                    break
            if hi:
                glyph_s += write_255ushort(len(g["instructions"]))
                instr_s += g["instructions"]
            continue
        n_cont += struct.pack(">h", len(g["end_pts"]))
        prev = -1
        for e in g["end_pts"]:
            n_points += write_255ushort(e - prev)
            prev = e
        px = py = 0
        for x, y, on in g["points"]:
            f, body = encode_triplet(x - px, y - py, on)
            px, py = x, y
            flag_s.append(f)
            glyph_s += body
        glyph_s += write_255ushort(len(g["instructions"]))
        instr_s += g["instructions"]
    bbox_blob = bytes(bbox_bitmap) + bytes(bbox_s)
    out = bytearray()
    out += struct.pack(">I", 0)          # version (Fixed 0)
    out += struct.pack(">HHH", 0, n_glyphs, index_format)
    for s in (n_cont, n_points, flag_s, glyph_s, comp_s,
              bbox_blob, instr_s):
        out += struct.pack(">I", len(s))
    for s in (n_cont, n_points, flag_s, glyph_s, comp_s,
              bbox_blob, instr_s):
        out += s
    return bytes(out)


def reconstruct_glyf(data: bytes) -> tuple[bytes, bytes, dict]:
    """WOFF2 transformed-glyf -> (glyf, loca, stats) per spec 5.2/5.3.

    stats: {"num_glyphs", "index_format", "n_contours", "n_points",
    "n_composites", "bbox"} (bbox = union over non-empty glyphs).
    """
    if len(data) < 36:
        raise ValueError("transformed glyf too short")
    version, = struct.unpack_from(">I", data, 0)
    if version != 0:
        raise ValueError("unknown transformed-glyf version")
    _opt, n_glyphs, index_format = struct.unpack_from(">HHH", data, 4)
    sizes = struct.unpack_from(">7I", data, 10)
    pos = 38
    streams = []
    for sz in sizes:
        if pos + sz > len(data):
            raise ValueError("transformed glyf stream overrun")
        streams.append(data[pos:pos + sz])
        pos += sz
    (ncont_s, npts_s, flag_s, glyph_s, comp_s, bbox_blob,
     instr_s) = streams
    if len(ncont_s) != 2 * n_glyphs:
        raise ValueError("nContourStream size mismatch")
    bitmap_len = ((n_glyphs + 31) >> 5) << 2
    if len(bbox_blob) < bitmap_len:
        raise ValueError("bboxBitmap truncated")
    bbox_bitmap = bbox_blob[:bitmap_len]
    bbox_s = bbox_blob[bitmap_len:]
    np_pos = gs_pos = fl_pos = cs_pos = bb_pos = is_pos = 0
    glyphs: list[dict | None] = []
    stats = {"num_glyphs": n_glyphs, "index_format": index_format,
             "n_contours": 0, "n_points": 0, "n_composites": 0}
    ubb = None

    def take_bbox(i: int) -> tuple | None:
        nonlocal bb_pos
        if bbox_bitmap[i >> 3] & (0x80 >> (i & 7)):
            if bb_pos + 8 > len(bbox_s):
                raise ValueError("bboxStream overrun")
            bb = struct.unpack_from(">hhhh", bbox_s, bb_pos)
            bb_pos += 8
            return bb
        return None

    for i in range(n_glyphs):
        nc, = struct.unpack_from(">h", ncont_s, 2 * i)
        if nc == 0:
            if take_bbox(i) is not None:
                raise ValueError("bbox set for empty glyph")
            glyphs.append(None)
            continue
        if nc < 0:                       # composite
            bb = take_bbox(i)
            if bb is None:
                raise ValueError("composite glyph missing bbox")
            comp_start = cs_pos
            hi = False
            while True:
                if cs_pos + 4 > len(comp_s):
                    raise ValueError("compositeStream overrun")
                cf, = struct.unpack_from(">H", comp_s, cs_pos)
                hi = hi or bool(cf & _HAVE_INSTR)
                cs_pos += 4 + (4 if cf & _ARG_WORDS else 2)
                cs_pos += (2 if cf & _HAVE_SCALE else
                           4 if cf & _XY_SCALE else
                           8 if cf & _TWO_BY_TWO else 0)
                if not (cf & _MORE):
                    break
            instr = b""
            if hi:
                n_i, gs_pos = read_255ushort(glyph_s, gs_pos)
                instr = instr_s[is_pos:is_pos + n_i]
                if len(instr) != n_i:
                    raise ValueError("instructionStream overrun")
                is_pos += n_i
            glyphs.append({"bbox": bb,
                           "composite": comp_s[comp_start:cs_pos],
                           "instructions": instr})
            stats["n_composites"] += 1
            ubb = _ubb(ubb, bb)
            continue
        end_pts = []
        total = -1
        for _ in range(nc):
            d, np_pos = read_255ushort(npts_s, np_pos)
            total += d
            end_pts.append(total)
        n_pts = total + 1
        pts = []
        x = y = 0
        for _ in range(n_pts):
            if fl_pos >= len(flag_s):
                raise ValueError("flagStream overrun")
            f = flag_s[fl_pos]
            fl_pos += 1
            dx, dy, gs_pos = decode_triplet(f, glyph_s, gs_pos)
            x += dx
            y += dy
            pts.append((x, y, not (f >> 7)))
        n_i, gs_pos = read_255ushort(glyph_s, gs_pos)
        instr = instr_s[is_pos:is_pos + n_i]
        if len(instr) != n_i:
            raise ValueError("instructionStream overrun")
        is_pos += n_i
        bb = take_bbox(i)
        if bb is None:
            xs = [p[0] for p in pts] or [0]
            ys = [p[1] for p in pts] or [0]
            bb = (min(xs), min(ys), max(xs), max(ys))
        glyphs.append({"bbox": bb, "end_pts": end_pts, "points": pts,
                       "instructions": instr})
        stats["n_contours"] += nc
        stats["n_points"] += n_pts
        ubb = _ubb(ubb, bb)
    stats["bbox"] = ubb
    glyf, loca = build_glyf(glyphs, index_format)
    return glyf, loca, stats


def _ubb(a: tuple | None, b: tuple) -> tuple:
    if a is None:
        return b
    return (min(a[0], b[0]), min(a[1], b[1]),
            max(a[2], b[2]), max(a[3], b[3]))


def woff2_glyph_stats(data: bytes, max_out: int = 1 << 24
                      ) -> dict | None:
    """Glyph-geometry stats for a WOFF2 font: reconstructs the glyf
    transform when present (xform 0), else parses plain glyf+loca.
    None when the font carries no glyf table (e.g. CFF flavor)."""
    parsed = parse_woff2(data, max_out=max_out)
    glyf = woff2_table(parsed, "glyf")
    if glyf is None:
        return None
    xform = next(x for (t, _o, _s, x), _off
                 in zip(parsed["tables"], parsed["offsets"])
                 if t == "glyf")
    if xform == 0:
        _g, _l, stats = reconstruct_glyf(glyf)
        return stats
    loca = woff2_table(parsed, "loca")
    if loca is None:
        return None
    head = woff2_table(parsed, "head")
    fmt = struct.unpack_from(">h", head, 50)[0] if head \
        and len(head) >= 52 else 1
    offs = parse_loca(loca, fmt)
    stats = {"num_glyphs": len(offs) - 1, "index_format": fmt,
             "n_contours": 0, "n_points": 0, "n_composites": 0}
    ubb = None
    for i in range(len(offs) - 1):
        g = parse_glyph(glyf[offs[i]:offs[i + 1]])
        if g is None:
            continue
        if "composite" in g:
            stats["n_composites"] += 1
        else:
            stats["n_contours"] += len(g["end_pts"])
            stats["n_points"] += len(g["points"])
        ubb = _ubb(ubb, g["bbox"])
    stats["bbox"] = ubb
    return stats


def woff2_bytes(tables: list[tuple[str, bytes]],
                flavor: int = 0x00010000, mode: str = "lz",
                transform_glyphs: bool = False,
                index_format: int = 1) -> bytes:
    """Build a WOFF2 file from (tag, table bytes) pairs (fixture
    tier). With ``transform_glyphs`` the glyf/loca pair (pass the
    STANDARD sfnt bytes) is stored with transform version 0: glyf
    triplet-encoded via :func:`transform_glyf`, loca as the
    mandatory zero-length stream (the decoder regenerates it)."""
    std_loca = dict(tables).get("loca", b"")
    directory = bytearray()
    blob = bytearray()
    total_sfnt = 12 + 16 * len(tables)
    for tag, body in tables:
        idx = _TAG_INDEX.get(tag, 0x3F)
        orig_len = len(body)
        if transform_glyphs and tag == "glyf":
            xform = 0
            body = transform_glyf(body, std_loca, index_format)
        elif transform_glyphs and tag == "loca":
            xform = 0
            body = b""
        else:
            xform = 3 if tag in ("glyf", "loca") else 0  # null
        directory.append((xform << 6) | idx)
        if idx == 0x3F:
            directory += tag.encode("latin-1")[:4].ljust(4)
        directory += write_base128(orig_len)
        if tag in ("glyf", "loca") and xform == 0:
            directory += write_base128(len(body))  # transformLength
        blob += body
        total_sfnt += orig_len + ((4 - orig_len % 4) % 4)
    if mode == "ref":
        # reference-encoder stream (pyarrow's bundled brotli, max
        # quality): exercises static-dictionary references and
        # context-mapped literals the fixture encoder never emits
        import pyarrow as pa
        comp = pa.Codec("brotli", compression_level=11).compress(
            bytes(blob), asbytes=True)
    else:
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
