"""CHM (ITSF/LZX) tests: directory walk, LZX block types, extraction.

Models the reference contracts (tika-parsers/.../chm tests:
TestChmItsfHeader, TestPmglHeader, TestChmLzxState,
TestChmExtraction): entries enumerate with section/offset/length, LZX
uncompressed + verbatim blocks decode, .html/.htm entries concatenate
through the HTML chain.
"""

import struct

import pytest

from tika_spark.chm import ChmFile, LzxDecoder, LzxError, extract_chm
from tika_spark.chm.lzx import _SLOTS_BY_WBITS
from tika_spark.fixtures.chmgen import lzx_store, make_chm
from tika_spark.mime.detector import detect


class _BitWriter:
    """LZX-order bit writer: MSB-first into 16-bit LE words."""

    def __init__(self):
        self.val = 0
        self.n = 0
        self.words = []

    def write(self, v: int, w: int):
        self.val = (self.val << w) | (v & ((1 << w) - 1))
        self.n += w
        while self.n >= 16:
            self.words.append((self.val >> (self.n - 16)) & 0xFFFF)
            self.n -= 16

    def bytes(self) -> bytes:
        words = list(self.words)
        if self.n:
            words.append((self.val << (16 - self.n)) & 0xFFFF)
        return b"".join(struct.pack("<H", w) for w in words)


def _verbatim_stream(body_syms: list[int], out_len: int,
                     wbits: int = 16) -> bytes:
    """Hand-encode one verbatim block whose main tree gives symbols
    0..255 and 257 (match: slot 0, length_header 1) all length 9.
    Pretree for every range: sym0 len1, sym8 len1 (canonical: 0 -> '0',
    8 -> '1')."""
    n_main = 256 + (_SLOTS_BY_WBITS[wbits] << 3)
    w = _BitWriter()
    w.write(0, 1)                     # no intel E8
    w.write(1, 3)                     # block type: verbatim
    w.write(out_len >> 16, 8)
    w.write(out_len & 0xFFFF, 16)
    # main tree part 1: 256 lengths of 9 -> pretree sym (0-9)%17 = 8
    for i in range(20):
        w.write(1 if i in (0, 8) else 0, 4)
    for _ in range(256):
        w.write(1, 1)                 # pretree code for sym 8
    # main tree part 2: element 257 -> length 9, rest 0
    for i in range(20):
        w.write(1 if i in (0, 8) else 0, 4)
    for i in range(256, n_main):
        w.write(1 if i == 257 else 0, 1)  # sym8 ('1') or sym0 ('0')
    # length tree: all zeros
    for i in range(20):
        w.write(1 if i in (0, 8) else 0, 4)
    for _ in range(249):
        w.write(0, 1)
    # body: 9-bit canonical codes — literals 0..255 keep their value,
    # match element 257 gets code 256
    for s in body_syms:
        w.write(s if s < 256 else 256, 9)
    return w.bytes()


class TestLzx:
    def test_uncompressed_block_roundtrip(self):
        data = bytes(range(256)) * 37 + b"x"   # odd length
        assert LzxDecoder(16).decompress(lzx_store(data),
                                         len(data)) == data

    def test_verbatim_literals(self):
        payload = b"hello lzx verbatim"
        stream = _verbatim_stream(list(payload), len(payload))
        assert LzxDecoder(16).decompress(stream, len(payload)) == payload

    def test_verbatim_match_r0(self):
        # 'a','b', then element 257 = slot 0 (R0=1), len_header 1 ->
        # copy 3 bytes at offset 1: "ab" + "bbb"
        stream = _verbatim_stream([ord("a"), ord("b"), 257], 5)
        assert LzxDecoder(16).decompress(stream, 5) == b"abbbb"

    def test_corrupt_raises(self):
        with pytest.raises(LzxError):
            LzxDecoder(16).decompress(b"\xff\xff\xff\xff", 100)

    def test_bad_window(self):
        with pytest.raises(LzxError):
            LzxDecoder(7)


PAGES = {
    "/index.html": (b"<html><head><title>Index</title></head><body>"
                    b"<p>Welcome page</p></body></html>"),
    "/ch1.htm": b"<html><body><p>Chapter one text</p></body></html>",
    "/style.css": b"body{color:red}",
}


class TestChmContainer:
    @pytest.mark.parametrize("compressed", [False, True])
    def test_directory_and_read(self, compressed):
        chm = ChmFile(make_chm(PAGES, compressed=compressed))
        names = {e.name for e in chm.content_entries()}
        assert names == {"/index.html", "/ch1.htm", "/style.css"}
        e = next(x for x in chm.entries if x.name == "/ch1.htm")
        assert chm.read_entry(e) == PAGES["/ch1.htm"]

    def test_two_frame_reset_interval(self):
        # real-world LZXC v2 layout: reset_interval = window = 0x10000
        # (2 frames per reset) with a per-frame ResetTable; payload
        # spans several frames so intermediate entries exist
        big = {"/big%d.html" % i:
               (b"<html><body><p>" + bytes([65 + i]) * 20000
                + b"</p></body></html>") for i in range(5)}
        chm = ChmFile(make_chm(big, compressed=True,
                               reset_interval_frames=2))
        for e in chm.content_entries():
            assert chm.read_entry(e) == big[e.name]

    def test_detect_magic_and_glob(self):
        chm = make_chm(PAGES)
        assert detect(chm, "http://x/help.chm") == \
            "application/vnd.ms-htmlhelp"


class TestChmExtraction:
    @pytest.mark.parametrize("compressed", [False, True])
    def test_html_entries_concatenated(self, compressed):
        r = extract_chm(make_chm(PAGES, compressed=compressed))
        # directory order is name-sorted: ch1 before index
        assert r["text"] == "Chapter one text\nWelcome page\n"
        assert r["title"] == "Index"
        assert [s[2] for s in r["spans"]] == ["chm-entry", "chm-entry"]
        assert r["status"] == "ok"

    def test_garbage_is_error_row(self):
        r = extract_chm(b"ITSF\x03\x00\x00\x00 garbage")
        assert r["status"] == "error"

    def test_no_html_entries_metadata_only(self):
        r = extract_chm(make_chm({"/only.css": b"body{}"}))
        assert r["status"] == "metadata_only"
        assert r["text"] == ""


@pytest.mark.usefixtures("spark")
class TestPipeline:
    def test_chm_through_pipeline(self, spark):
        from tika_spark.pipeline.job import extract
        df = spark.createDataFrame(
            [("http://x/help.chm", make_chm(PAGES, compressed=True))],
            "url string, html binary")
        row = extract(df, mode="text").collect()[0]
        assert row["mime"] == "application/vnd.ms-htmlhelp"
        assert row["text"] == "Chapter one text\nWelcome page\n"
        assert row["title"] == "Index"


class TestLzxFraming:
    """Round-2 review fixes: frame realignment, 1-16-bit uncompressed
    padding, absolute-position E8 (mspack/lzxd semantics)."""

    def test_frame_boundary_realigns_bitstream(self):
        # a verbatim block spanning the 0x8000 output boundary: the
        # encoder pads to 16 bits at the frame boundary (here 11 bits)
        frame = 0x8000
        tail = 64
        syms = [(i * 7) % 251 for i in range(frame + tail)]
        n_main = 256 + (_SLOTS_BY_WBITS[16] << 3)
        w = _BitWriter()
        w.write(0, 1)
        w.write(1, 3)
        w.write((frame + tail) >> 16, 8)
        w.write((frame + tail) & 0xFFFF, 16)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for _ in range(256):
            w.write(1, 1)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for i in range(256, n_main):
            w.write(1 if i == 257 else 0, 1)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for _ in range(249):
            w.write(0, 1)
        for s in syms[:frame]:
            w.write(s, 9)
        pad = (16 - w.n % 16) % 16
        assert pad == 11  # the boundary really is mid-word
        w.write(0, pad)   # encoder-side frame padding
        for s in syms[frame:]:
            w.write(s, 9)
        out = LzxDecoder(16).decompress(w.bytes(), frame + tail)
        assert list(out) == syms

    def test_match_spanning_frame_boundary_keeps_overshoot(self):
        # regression (round-3 advice): a match whose copy crosses the
        # 32 KiB frame boundary must be emitted IN FULL — the encoder
        # pads/realigns after the match completes, and the overshoot
        # is credited against the block (mspack lzxd this_run<0).
        # Truncating at the boundary leaves the next frame decoding
        # the following symbol with the match tail missing.
        frame = 0x8000
        tail = 32
        lits = [(i * 11) % 251 for i in range(frame - 2)]
        tail_syms = [(i * 13) % 251 for i in range(tail)]
        out_len = frame + 1 + tail
        n_main = 256 + (_SLOTS_BY_WBITS[16] << 3)
        w = _BitWriter()
        w.write(0, 1)
        w.write(1, 3)
        w.write(out_len >> 16, 8)
        w.write(out_len & 0xFFFF, 16)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for _ in range(256):
            w.write(1, 1)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for i in range(256, n_main):
            w.write(1 if i == 257 else 0, 1)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for _ in range(249):
            w.write(0, 1)
        for s in lits:
            w.write(s, 9)
        # element 257: slot 0 (R0=1), length_header 1 -> match_len 3
        # starting 2 bytes before the boundary: 1-byte overshoot
        w.write(256, 9)
        pad = (16 - w.n % 16) % 16
        w.write(0, pad)     # encoder frame padding AFTER the match
        for s in tail_syms:
            w.write(s, 9)
        out = LzxDecoder(16).decompress(w.bytes(), out_len)
        expect = bytes(lits) + bytes([lits[-1]]) * 3 + bytes(tail_syms)
        assert out == expect

    def test_uncompressed_block_on_aligned_boundary_skips_16(self):
        # 16 verbatim literals land the next block header such that
        # the uncompressed block's byte-alignment point is exactly on
        # a 16-bit boundary -> the encoder writes 16 padding bits
        n_main = 256 + (_SLOTS_BY_WBITS[16] << 3)
        w = _BitWriter()
        w.write(0, 1)
        w.write(1, 3)
        w.write(0, 8)
        w.write(16, 16)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for _ in range(256):
            w.write(1, 1)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for i in range(256, n_main):
            w.write(1 if i == 257 else 0, 1)
        for i in range(20):
            w.write(1 if i in (0, 8) else 0, 4)
        for _ in range(249):
            w.write(0, 1)
        for s in range(16):
            w.write(s, 9)
        raw = bytes(range(100, 140))
        w.write(3, 3)                    # uncompressed block
        w.write(0, 8)
        w.write(len(raw), 16)
        assert w.n % 16 == 0             # exactly on the boundary
        w.write(0, 16)                   # mandatory 16-bit padding
        stream = (w.bytes() + struct.pack("<III", 1, 1, 1) + raw)
        out = LzxDecoder(16).decompress(stream, 16 + len(raw))
        assert out == bytes(range(16)) + raw

    def test_e8_uses_absolute_positions(self):
        from tika_spark.chm.lzx import _e8_untranslate
        rel = 0x1234
        cur = 0x8000 + 3                 # E8 at abs offset 3 of the
        abs_off = rel + cur              # SECOND reset interval
        data = (b"\x00" * 3 + b"\xe8" + struct.pack("<i", abs_off)
                + b"\x00" * 20)
        out = _e8_untranslate(data, 0x100000, abs_base=0x8000)
        assert struct.unpack_from("<i", out, 4)[0] == rel
