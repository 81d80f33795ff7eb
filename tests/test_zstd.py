"""Zstandard codec (analysis/zstdcodec.py): FSE machinery, huffman
weights (direct + FSE form), all encoder modes, repeat offsets,
multi-block frames, skippable frames, guards, archive-tier
integration, and fuzz robustness."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tika_spark.analysis import zstdcodec as z


class TestFse:
    def test_predefined_tables_build(self):
        for counts, acc in ((z.LL_DEFAULT, 6), (z.ML_DEFAULT, 6),
                            (z.OF_DEFAULT, 5)):
            t = z._fse_decode_table(list(counts), acc)
            assert len(t) == 1 << acc
            # EACH SYMBOL's intervals partition the state space (the
            # property the backward FSE encoder relies on)
            iv = z._fse_intervals(t)
            for sym, lst in iv.items():
                pos = 0
                for lo, hi, *_ in sorted(lst):
                    assert lo == pos, (sym, lst)
                    pos = hi
                assert pos == 1 << acc, sym

    @given(st.lists(st.integers(1, 40), min_size=2, max_size=10))
    @settings(max_examples=40, deadline=None)
    def test_distribution_roundtrip(self, raw):
        acc = 6
        size = 1 << acc
        total = sum(raw)
        counts = [max(1, (c * size) // total) for c in raw]
        while sum(counts) > size:
            counts[counts.index(max(counts))] -= 1
        counts[-1] += size - sum(counts)
        if counts[-1] <= 0:
            return
        blob = z._fse_write_distribution(counts, acc)
        got, acc2, _ = z._fse_read_distribution(blob, 0, 9, 60)
        a, b = list(counts), list(got)
        while a and a[-1] == 0:
            a.pop()
        while b and b[-1] == 0:
            b.pop()
        assert acc2 == acc and a == b

    def test_backward_stream(self):
        bw = z._BackWriter()
        fields = [(5, 3), (0, 2), (1023, 10), (1, 1)]
        for v, n in fields:
            bw.write(v, n)
        bits = z._BackBits(bw.bytes())
        for v, n in fields:
            assert bits.read(n) == v
        assert bits.exhausted()


class TestRoundTrip:
    CASES = [
        b"",
        b"x",
        b"hello world hello world hello world hello world",
        bytes(range(256)) * 4,
        b"abcabcabcabcabcabcabcabcabc",
        b"a" * 10000,
        b"The quick brown fox jumps over the lazy dog. " * 200,
    ]

    @pytest.mark.parametrize("mode", ["raw", "literals", "lz",
                                      "huff", "fse"])
    def test_cases(self, mode):
        for t in self.CASES:
            assert z.decompress(z.compress(t, mode=mode)) == t

    @given(st.binary(min_size=0, max_size=5000),
           st.sampled_from(["raw", "literals", "lz", "huff", "fse"]))
    @settings(max_examples=80, deadline=None)
    def test_random(self, data, mode):
        assert z.decompress(z.compress(data, mode=mode)) == data

    def test_rle_blocks(self):
        t = b"q" * 300000
        enc = z.compress(t, mode="rle")
        assert len(enc) < 30
        assert z.decompress(enc) == t

    def test_multi_block_with_cross_block_offsets(self):
        t = (b"0123456789abcdef" * 5000)[: (1 << 17) + 5000]
        enc = z.compress(t, mode="lz")
        assert z.decompress(enc) == t

    def test_repeat_offsets_used(self):
        # periodic data: after the first explicit offset, later
        # sequences must ride the repeat ring (coded values 1-3)
        t = b"abcdefgh" * 4000
        seqs, tail = z._greedy_matches(t)
        reps = [1, 4, 8]
        coded = [z._choose_of_value(off, ll, reps) or
                 z._apply_offset(z._choose_of_value(off, ll, reps),
                                 ll, reps)
                 for ll, ml, off in seqs]
        assert z.decompress(z.compress(t, mode="lz")) == t

    def test_lz_compresses(self):
        t = b"spark and tika and spark and tika. " * 400
        assert len(z.compress(t, mode="lz")) < len(t) // 20

    def test_huff_treeless_reuse(self):
        # small blocks with shared alphabet: later blocks can reuse
        # the previous huffman tree (treeless literals, type 3)
        t = (b"structured text " * 40)[:600] * 3
        enc = z.compress(t, mode="huff", block_cap=600)
        assert z.decompress(enc) == t

    def test_skippable_frame(self):
        enc = z.compress(b"payload", mode="lz")
        skip = (0x184D2A50).to_bytes(4, "little") \
            + (5).to_bytes(4, "little") + b"meta!"
        assert z.decompress(skip + enc) == b"payload"

    def test_max_out_guard(self):
        enc = z.compress(b"w" * 200000, mode="rle")
        with pytest.raises(ValueError, match="max_out"):
            z.decompress(enc, max_out=50000)

    def test_dictionary_rejected(self):
        enc = bytearray(z.compress(b"abc", mode="raw"))
        enc[4] |= 1              # dict-id flag = 1 byte
        enc.insert(5, 7)         # non-zero dictionary id
        with pytest.raises(ValueError, match="dictionar"):
            z.decompress(bytes(enc))

    def test_content_size_verified(self):
        enc = bytearray(z.compress(b"abcdef", mode="raw"))
        enc[5] = 99              # lie about the content size
        with pytest.raises(ValueError, match="content size"):
            z.decompress(bytes(enc))

    @given(st.integers(0, 2 ** 32 - 1))
    @settings(max_examples=120, deadline=None)
    def test_fuzz_never_hangs(self, seed):
        rng = np.random.RandomState(seed % (2 ** 31))
        mode = ("raw", "literals", "lz", "huff", "fse")[seed % 5]
        base = z.compress(rng.randint(0, 256, 400,
                                      dtype=np.uint8).tobytes(),
                          mode=mode)
        buf = bytearray(base)
        if seed % 2 and len(buf) > 2:
            buf = buf[:rng.randint(1, len(buf))]
        for _ in range(rng.randint(1, 5)):
            buf[rng.randint(0, len(buf))] ^= int(rng.randint(1, 256))
        try:
            out = z.decompress(bytes(buf), max_out=1 << 22)
            assert isinstance(out, bytes)
        except ValueError:
            pass


class TestArchiveTier:
    def test_package_extraction(self):
        from tika_spark.pkg.parser import extract_package
        inner = b"zstd member text. " * 30
        raw = z.compress(inner, mode="huff")
        out = extract_package(raw, url="http://x/report.txt.zst")
        assert out["status"] == "ok"
        assert out["children"][0][0] == "report.txt"
        assert out["children"][0][1] == inner

    def test_magic_detection(self):
        from tika_spark.mime.detector import detect
        raw = z.compress(b"hello", mode="raw")
        assert detect(raw, None) == "application/zstd"


class TestWarcZst:
    def _blob(self, n=6, with_dict=True):
        from tika_spark.fixtures.warcgen import warc_zst
        recs = [(f"http://ex.com/{i}", "2026-08-19T00:00:00Z",
                 f"<html><body>page {i}</body></html>".encode())
                for i in range(n)]
        return warc_zst(recs, with_dict_frame=with_dict)

    def test_stream_pages(self):
        import io
        from tika_spark.sources.warc import warc_pages_from
        pages = list(warc_pages_from(io.BytesIO(self._blob()).read,
                                     zst=True))
        assert len(pages) == 6
        assert all(p["status"] == "ok" for p in pages)
        assert pages[3]["url"] == "http://ex.com/3"
        assert b"page 3" in pages[3]["html"]

    def test_multi_record_frame(self):
        import io
        from tika_spark.sources.warc import (build_record,
                                             warc_pages_from)
        r1 = build_record("http://x/a", "2026-08-19T00:00:00Z", b"A")
        r2 = build_record("http://x/b", "2026-08-19T00:00:00Z", b"B")
        blob = z.compress(r1 + r2, mode="lz")
        pages = list(warc_pages_from(io.BytesIO(blob).read, zst=True))
        assert [p["url"] for p in pages] == ["http://x/a",
                                             "http://x/b"]

    def test_frame_end_walker(self):
        from tika_spark.sources.warc import zstd_frame_end
        for mode in ("raw", "rle", "lz", "huff"):
            payload = b"frame walk test " * 40
            if mode == "rle":
                payload = b"r" * 640
            enc = z.compress(payload, mode=mode)
            assert zstd_frame_end(enc + b"tail", 0) == len(enc)
            assert zstd_frame_end(enc[:5], 0) is None  # incomplete

    def test_bad_magic_is_one_error_member(self):
        import io
        from tika_spark.sources.warc import warc_pages_from
        blob = b"NOTZSTD!" + self._blob(2, with_dict=False)
        pages = list(warc_pages_from(io.BytesIO(blob).read, zst=True))
        assert pages and pages[0]["status"] == "warc_malformed_member"


class TestDecoderOnlyPaths:
    """Hand-built streams for wire forms the fixture encoder never
    emits: 4-stream Huffman literals, RLE literals, RLE sequence
    tables."""

    def test_four_stream_huffman_literals(self):
        from tika_spark.analysis.brotlicodec import _huffman_lengths
        lits = bytes(range(65, 91)) * 8
        hist = {}
        for b in lits:
            hist[b] = hist.get(b, 0) + 1
        lengths = _huffman_lengths(hist, max_len=11)
        max_len = max(lengths.values())
        last = max(lengths)
        weights = [max_len + 1 - lengths[s] if s in lengths else 0
                   for s in range(last + 1)]
        huff = z._Huff(weights[:-1])
        codes = huff.codes()
        ws = weights[:-1]
        packed = bytearray((127 + len(ws),))
        for i in range(0, len(ws), 2):
            packed.append((ws[i] << 4)
                          | (ws[i + 1] if i + 1 < len(ws) else 0))
        per = (len(lits) + 3) // 4
        streams = []
        for k in range(4):
            chunk = lits[k * per:(k + 1) * per] if k < 3 \
                else lits[3 * per:]
            bw = z._BackWriter()
            for b in chunk:
                c, ln = codes[b]
                bw.write(c, ln)
            streams.append(bw.bytes())
        jump = b"".join(len(s).to_bytes(2, "little")
                        for s in streams[:3])
        body = bytes(packed) + jump + b"".join(streams)
        rs, cs = len(lits), len(body)
        hdr = (2 | (1 << 2) | (rs << 4)
               | (cs << 14)).to_bytes(3, "little")
        block = hdr + body + b"\x00"
        frame = bytearray(z.ZSTD_MAGIC)
        frame.append((0 << 6) | (1 << 5))
        frame.append(rs)
        frame += (1 | (2 << 1) | (len(block) << 3)).to_bytes(
            3, "little")
        frame += block
        assert z.decompress(bytes(frame)) == lits

    def test_rle_literals_and_rle_sequence_tables(self):
        lit = bytes(((30 << 3) | (0 << 2) | 1, ord("x")))
        ll, ml, off = 10, 5, 4
        ll_sym = z._ll_code(ll)
        ml_sym = z._ml_code(ml)
        ofv = off + 3
        of_sym = ofv.bit_length() - 1
        seq = bytearray((1, (1 << 6) | (1 << 4) | (1 << 2),
                         ll_sym, of_sym, ml_sym))
        bw = z._BackWriter()
        bw.write(ofv - (1 << of_sym), of_sym)
        bw.write(ml - z.ML_BASE[ml_sym], z.ML_EXTRA[ml_sym])
        bw.write(ll - z.LL_BASE[ll_sym], z.LL_EXTRA[ll_sym])
        block = lit + bytes(seq) + bw.bytes()
        frame = bytearray(z.ZSTD_MAGIC)
        frame.append((0 << 6) | (1 << 5))
        frame.append(35)
        frame += (1 | (2 << 1) | (len(block) << 3)).to_bytes(
            3, "little")
        frame += block
        assert z.decompress(bytes(frame)) == b"x" * 35


class TestXxhash:
    def test_published_vectors(self):
        assert z.xxh64(b"") == 0xEF46DB3751D8E999
        assert z.xxh64(b"a") == 0xD24EC4F1A98C6E5B
        assert z.xxh64(b"abc") == 0x44BC2CF5AD770999

    @pytest.mark.parametrize("mode", ["raw", "lz", "huff"])
    def test_checksum_roundtrip(self, mode):
        t = b"checksummed frame content " * 40
        enc = z.compress(t, mode=mode, checksum=True)
        assert z.decompress(enc) == t

    def test_corruption_detected(self):
        enc = bytearray(z.compress(b"hello world" * 10, mode="lz",
                                   checksum=True))
        enc[-1] ^= 0xFF
        with pytest.raises(ValueError, match="checksum"):
            z.decompress(bytes(enc))


class TestDictionaries:
    """RFC 8878 section 5 dictionaries: raw-content and structured,
    window reach-back, entropy-table reuse, repeat-ring seeding, id
    checks, and the .warc.zst dictionary frame (IIPC layout)."""

    PAGE = (b"<html><head><title>Example crawl page</title></head>"
            b"<body><p>shared boilerplate nav footer sidebar</p>"
            b"<p>unique payload text goes here 12345</p></body></html>")
    DICT = (b"<html><head><title></title></head><body>"
            b"<p>shared boilerplate nav footer sidebar</p>"
            b"</body></html>")

    def test_raw_content_dict_roundtrip(self):
        zd = z.parse_dict(self.DICT)
        assert zd.dict_id == 0 and zd.tables is None
        frame = z.compress(self.PAGE, mode="lz", zdict=zd)
        assert z.decompress(frame, zdict=zd) == self.PAGE
        # the window reach-back must actually pay off
        assert len(frame) < len(z.compress(self.PAGE, mode="lz"))
        # raw dicts write no Dictionary_ID field
        assert frame[4] & 3 == 0

    def test_raw_dict_frame_fails_without_dict(self):
        zd = z.parse_dict(self.DICT)
        frame = z.compress(self.PAGE, mode="lz", zdict=zd)
        with pytest.raises(ValueError, match="offset beyond"):
            z.decompress(frame)

    def test_structured_dict_parse_fields(self):
        raw = z.build_dict(self.DICT, dict_id=7,
                           literal_sample=self.PAGE)
        zd = z.parse_dict(raw)
        assert zd.dict_id == 7
        assert zd.content == self.DICT
        assert zd.reps == (1, 4, 8)
        assert zd.huff is not None and zd.tables is not None
        for key in ("ll", "of", "ml"):
            table, acc = zd.tables[key]
            assert len(table) == 1 << acc

    def test_structured_dict_all_modes_roundtrip(self):
        raw = z.build_dict(self.DICT, dict_id=7,
                           literal_sample=self.PAGE)
        zd = z.parse_dict(raw)
        for mode in ("lz", "huff", "fse", "dict", "raw", "literals"):
            frame = z.compress(self.PAGE, mode=mode, zdict=zd,
                               checksum=True)
            assert z.decompress(frame, zdict=zd) == self.PAGE, mode
            # raw dictionary bytes are accepted too
            assert z.decompress(frame, zdict=raw) == self.PAGE, mode

    def test_dict_mode_uses_repeat_and_treeless(self):
        """The first block of a mode='dict' frame must open with the
        all-repeat sequence modes byte and a treeless literals
        section — entropy straight from the dictionary."""
        raw = z.build_dict(self.DICT, dict_id=7,
                           literal_sample=self.PAGE)
        zd = z.parse_dict(raw)
        frame = z.compress(self.PAGE, mode="dict", zdict=zd)
        assert frame[4] & 3 == 1            # 1-byte Dictionary_ID
        assert frame[5] == 7
        # block payload starts after magic(4)+fhd(1)+did(1)+fcs(1)
        block = frame[10:]
        assert block[0] & 3 == 3            # treeless literals
        # a mode='dict' frame cannot decode with the WRONG entropy:
        # same content, different id -> rejected before any decode
        with pytest.raises(ValueError, match="names dictionary"):
            z.decompress(frame, zdict=z.ZstdDict(9, self.DICT))
        with pytest.raises(ValueError, match="none was supplied"):
            z.decompress(frame)

    def test_multiblock_dict_frame(self):
        data = (self.PAGE + b" tail variation %d " % 3) * 40
        raw = z.build_dict(self.DICT, dict_id=300,
                           literal_sample=data[:2000])
        zd = z.parse_dict(raw)
        frame = z.compress(data, mode="dict", zdict=zd, block_cap=512,
                           checksum=True)
        assert frame[4] & 3 == 2            # 2-byte Dictionary_ID
        assert z.decompress(frame, zdict=zd) == data

    def test_dict_validation(self):
        with pytest.raises(ValueError, match="nonzero id"):
            z.build_dict(self.DICT, dict_id=0)
        # repeat offsets must be nonzero and within the content
        raw = bytearray(z.build_dict(self.DICT, dict_id=7))
        k = raw.index(self.DICT) - 12
        raw[k:k + 4] = (0).to_bytes(4, "little")
        with pytest.raises(ValueError, match="repeat offset"):
            z.parse_dict(bytes(raw))
        raw[k:k + 4] = (len(self.DICT) + 1).to_bytes(4, "little")
        with pytest.raises(ValueError, match="repeat offset"):
            z.parse_dict(bytes(raw))
        with pytest.raises(ValueError, match="needs a structured"):
            z.compress(b"x", mode="dict", zdict=z.parse_dict(b"raw"))

    def test_warc_zst_dict_stream(self):
        import io

        from tika_spark.fixtures.warcgen import warc_zst_dict
        from tika_spark.sources.warc import warc_pages_from
        recs = [(f"http://ex.com/{i}", "2026-08-19T00:00:00Z",
                 f"<html><body><p>page {i} text</p></body></html>"
                 .encode()) for i in range(7)]
        for compress_dict in (True, False):
            blob = warc_zst_dict(recs, compress_dict=compress_dict)
            pages = list(warc_pages_from(io.BytesIO(blob).read,
                                         zst=True))
            assert len(pages) == 7
            assert all(p["status"] == "ok" for p in pages)
            assert b"page 5 text" in pages[5]["html"]

    def test_warc_dict_frame_actually_needed(self):
        """Strip the dictionary frame: dict-naming members become
        error members, window-only members still decode."""
        import io

        from tika_spark.fixtures.warcgen import warc_zst_dict
        from tika_spark.sources.warc import (_zstd_frame_dict_id,
                                             warc_pages_from,
                                             zstd_frame_end)
        recs = [(f"http://ex.com/{i}", "2026-08-19T00:00:00Z",
                 f"<html><body>page {i}</body></html>".encode())
                for i in range(6)]
        blob = warc_zst_dict(recs)
        end0 = zstd_frame_end(blob, 0)       # the dictionary frame
        headless = blob[end0:]
        n_named = 0
        pos = 0
        while pos < len(headless):
            end = zstd_frame_end(headless, pos)
            n_named += bool(_zstd_frame_dict_id(headless[pos:end]))
            pos = end
        assert n_named == 6                  # every member names it
        pages = list(warc_pages_from(io.BytesIO(headless).read,
                                     zst=True))
        assert len(pages) == 6
        assert all(p["status"] == "warc_malformed_member"
                   for p in pages)
