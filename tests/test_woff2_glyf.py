"""WOFF2 glyf/loca geometry transform (analysis/woff2.py; W3C WOFF2
spec sections 5.1-5.3), dual-path: standard glyf -> transform_glyf ->
reconstruct_glyf -> byte-compare.

Reference parity: none (font/TrueTypeParser.java is name-records
only); this is the pipeline-extension font tier.
"""

import struct

import pytest

from tika_spark.analysis.woff2 import (
    build_glyf,
    build_glyph,
    decode_triplet,
    encode_triplet,
    parse_glyph,
    parse_loca,
    parse_woff2,
    read_255ushort,
    reconstruct_glyf,
    transform_glyf,
    woff2_bytes,
    woff2_glyph_stats,
    woff2_table,
    write_255ushort,
)


class Test255UInt16:
    def test_roundtrip_edges(self):
        for v in (0, 1, 252, 253, 505, 506, 508, 761, 762,
                  1000, 65535):
            enc = write_255ushort(v)
            got, pos = read_255ushort(enc, 0)
            assert (got, pos) == (v, len(enc)), v

    def test_shortest_form(self):
        assert len(write_255ushort(252)) == 1
        assert len(write_255ushort(253)) == 2
        assert len(write_255ushort(761)) == 2
        assert len(write_255ushort(762)) == 3

    def test_out_of_range(self):
        with pytest.raises(ValueError):
            write_255ushort(65536)
        with pytest.raises(ValueError):
            read_255ushort(b"", 0)


class TestTriplets:
    # band boundaries on both axes, both signs
    DELTAS = (0, 1, -1, 7, -13, 64, -64, 65, -65, 255, -256, 768,
              -768, 769, -769, 1279, -1279, 1280, -1280, 4095,
              -4095, 4096, -4096, 32767, -32767, -65535, 65535)

    def test_roundtrip_sweep(self):
        for dx in self.DELTAS:
            for dy in self.DELTAS:
                for on in (True, False):
                    f, body = encode_triplet(dx, dy, on)
                    gx, gy, pos = decode_triplet(f, body, 0)
                    assert (gx, gy, pos) == (dx, dy, len(body)), \
                        (dx, dy)
                    assert (not (f >> 7)) == on

    def test_shortest_band_chosen(self):
        assert len(encode_triplet(0, 5, True)[1]) == 1    # y-only
        assert len(encode_triplet(5, 0, True)[1]) == 1    # x-only
        assert len(encode_triplet(3, -9, True)[1]) == 1   # 4+4 bit
        assert len(encode_triplet(100, 700, True)[1]) == 2
        assert len(encode_triplet(4000, 1, True)[1]) == 3
        assert len(encode_triplet(30000, 2, True)[1]) == 4

    def test_overflow(self):
        with pytest.raises(ValueError):
            encode_triplet(65536, 0, True)


def _simple(points_per_contour, origin=(0, 0), instr=b""):
    """A simple glyph dict whose bbox is the point extremum."""
    pts = []
    end_pts = []
    x, y = origin
    n = 0
    for i, cnt in enumerate(points_per_contour):
        for j in range(cnt):
            x += (i + 1) * 17 + j * 3 - 20
            y += 31 - j * 7
            pts.append((x, y, (j % 3) != 0))
            n += 1
        end_pts.append(n - 1)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return {"bbox": (min(xs), min(ys), max(xs), max(ys)),
            "end_pts": end_pts, "points": pts, "instructions": instr}


def _composite(instr=b""):
    """Two components; the second carries WE_HAVE_INSTRUCTIONS and a
    2x2 transform."""
    comp = bytearray()
    comp += struct.pack(">HHhh", 0x0001 | 0x0020, 1, 10, -20)
    flags2 = 0x0080 | (0x0100 if instr else 0)
    comp += struct.pack(">HHbb", flags2, 2, 3, 4)
    comp += struct.pack(">hhhh", 0x4000, 0, 0, 0x4000)  # identity
    return {"bbox": (-5, -6, 120, 130), "composite": bytes(comp),
            "instructions": instr}


GLYPHS = [
    _simple([4]),                        # one contour
    None,                                # empty glyph
    _simple([3, 5], origin=(-200, 150), instr=b"\xb0\x01"),
    _composite(instr=b"\x4f"),
    _simple([2], origin=(5000, -4000)),  # wide deltas
    _composite(),
]


class TestSfntGlyphIO:
    def test_glyph_roundtrip(self):
        for g in GLYPHS:
            rec = build_glyph(g)
            back = parse_glyph(rec)
            assert back == g

    def test_empty_glyph(self):
        assert build_glyph(None) == b""
        assert parse_glyph(b"") is None

    def test_loca_formats(self):
        glyf, loca = build_glyf(GLYPHS, index_format=1)
        offs = parse_loca(loca, 1)
        assert len(offs) == len(GLYPHS) + 1
        assert offs[-1] == len(glyf)
        glyf0, loca0 = build_glyf(GLYPHS, index_format=0)
        offs0 = parse_loca(loca0, 0)
        assert all(o % 2 == 0 for o in offs0)
        assert offs0[-1] == len(glyf0)


class TestGlyfTransform:
    @pytest.mark.parametrize("fmt", [0, 1])
    @pytest.mark.parametrize("explicit", [False, True])
    def test_roundtrip_byte_exact(self, fmt, explicit):
        glyf, loca = build_glyf(GLYPHS, index_format=fmt)
        t = transform_glyf(glyf, loca, fmt, explicit_bbox=explicit)
        glyf2, loca2, stats = reconstruct_glyf(t)
        assert glyf2 == glyf
        assert loca2 == loca
        assert stats["num_glyphs"] == len(GLYPHS)
        assert stats["n_composites"] == 2
        assert stats["n_contours"] == 1 + 2 + 1
        assert stats["n_points"] == 4 + 8 + 2

    def test_transform_is_smaller_on_smooth_outlines(self):
        # many small deltas: triplets beat 2x int16 per point
        g = _simple([64])
        glyf, loca = build_glyf([g], index_format=1)
        t = transform_glyf(glyf, loca, 1)
        assert len(t) < len(glyf) + len(loca)

    def test_union_bbox(self):
        glyf, loca = build_glyf(GLYPHS, index_format=1)
        _g, _l, stats = reconstruct_glyf(glyf and transform_glyf(
            glyf, loca, 1))
        bbs = [g["bbox"] for g in GLYPHS if g]
        assert stats["bbox"] == (min(b[0] for b in bbs),
                                 min(b[1] for b in bbs),
                                 max(b[2] for b in bbs),
                                 max(b[3] for b in bbs))

    def test_composite_missing_bbox_rejected(self):
        glyf, loca = build_glyf([_composite()], index_format=1)
        t = bytearray(transform_glyf(glyf, loca, 1))
        # clear the bbox bitmap bit
        sizes = struct.unpack_from(">7I", t, 10)
        off = 38 + sum(sizes[:5])
        t[off] &= 0x7F
        with pytest.raises(ValueError):
            reconstruct_glyf(bytes(t))

    def test_truncated_streams_rejected(self):
        glyf, loca = build_glyf(GLYPHS, index_format=1)
        t = transform_glyf(glyf, loca, 1)
        with pytest.raises(ValueError):
            reconstruct_glyf(t[:20])
        bad = bytearray(t)
        bad[10:14] = struct.pack(">I", 1 << 30)  # huge stream size
        with pytest.raises(ValueError):
            reconstruct_glyf(bytes(bad))


class TestWoff2Container:
    def _tables(self, fmt=1):
        glyf, loca = build_glyf(GLYPHS, index_format=fmt)
        head = bytearray(54)
        struct.pack_into(">h", head, 50, fmt)
        return [("head", bytes(head)), ("glyf", glyf),
                ("loca", loca)]

    def test_transformed_container_roundtrip(self):
        tables = self._tables()
        blob = woff2_bytes(tables, transform_glyphs=True,
                           index_format=1)
        parsed = parse_woff2(blob)
        by_tag = {t[0]: t for t in parsed["tables"]}
        assert by_tag["glyf"][3] == 0          # transform version
        assert by_tag["loca"][2] == 0          # zero stored length
        assert by_tag["loca"][1] == len(dict(tables)["loca"])
        glyf2, loca2, _ = reconstruct_glyf(
            woff2_table(parsed, "glyf"))
        assert glyf2 == dict(tables)["glyf"]
        assert loca2 == dict(tables)["loca"]

    def test_glyph_stats_same_both_paths(self):
        tables = self._tables()
        plain = woff2_glyph_stats(woff2_bytes(tables))
        xformed = woff2_glyph_stats(
            woff2_bytes(tables, transform_glyphs=True,
                        index_format=1))
        assert plain == xformed
        assert plain["num_glyphs"] == len(GLYPHS)

    def test_no_glyf_returns_none(self):
        blob = woff2_bytes([("name", b"\x00" * 6)])
        assert woff2_glyph_stats(blob) is None
