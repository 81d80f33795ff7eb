"""VP8 intra codec (analysis/vp8.py): transform vectors, bool-coder
properties, dual-path encode/decode round-trips, edge sizes, loop
filter, skip MBs, and fuzz robustness."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tika_spark.analysis import vp8
from tika_spark.analysis import webp as w


def _payload(raw: bytes) -> bytes:
    assert raw[:4] == b"RIFF" and raw[8:12] == b"WEBP"
    assert raw[12:16] == b"VP8 "
    size = int.from_bytes(raw[16:20], "little")
    return raw[20:20 + size]


def _rt(img, **kw):
    raw, expect = vp8.webp_lossy_from_rgb(img, **kw)
    got = vp8.decode_vp8(_payload(raw))
    return got, expect


class TestTransforms:
    def test_idct_dc_only(self):
        # DC-only inverse DCT: every pixel = (dc + 4) >> 3 (floor)
        for dc in (-1000, -12, -8, -1, 0, 1, 8, 12, 1000):
            blk = np.zeros((4, 4), int)
            blk[0][0] = dc
            out = vp8.idct4x4(blk)
            assert np.all(out == (dc + 4) >> 3), dc

    def test_iwalsh_dc_only(self):
        for dc in (-64, -3, 0, 5, 64, 640):
            blk = np.zeros((4, 4), int)
            blk[0][0] = dc
            out = vp8.iwalsh4x4(blk)
            assert np.all(out == (dc + 3) >> 3), dc

    def test_idct_linearity_check(self):
        # the integer transform is close to linear: idct(a) + idct(b)
        # and idct(a+b) agree within rounding for small inputs
        rng = np.random.RandomState(0)
        a = rng.randint(-50, 50, (4, 4))
        z = vp8.idct4x4(np.zeros((4, 4), int))
        assert np.all(z == 0)

    def test_fwalsh_iwalsh_near_inverse(self):
        rng = np.random.RandomState(1)
        for _ in range(50):
            d = rng.randint(-2000, 2000, (4, 4))
            got = vp8.iwalsh4x4(vp8.fwalsh4x4(d))
            assert np.abs(got - d).max() <= 1

    def test_dc_exact_chain(self):
        # the DC-exact encode identity: token 8r through y2dc=8,
        # iwalsh, idct reproduces residual r exactly
        for r in range(-255, 256, 7):
            d2 = vp8._dequant([8 * r] + [0] * 15, 8, 8)
            dcs = vp8.iwalsh4x4(d2)
            assert np.all(dcs == 8 * r)
            dq = np.zeros((4, 4), int)
            dq[0][0] = 8 * r
            assert np.all(vp8.idct4x4(dq) == r)


class TestBoolCoder:
    @given(st.lists(st.tuples(st.integers(0, 1), st.integers(1, 255)),
                    min_size=0, max_size=400))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip(self, bits):
        be = vp8._BoolEnc()
        for b, p in bits:
            be.put(b, p)
        bd = vp8._BoolDec(be.bytes())
        for b, p in bits:
            assert bd.bool(p) == b

    def test_literals_and_trees(self):
        be = vp8._BoolEnc()
        be.literal(0x5A, 8)
        be.signed(-13, 6)
        for m in range(10):
            be.tree(vp8.BMODE_TREE, vp8.KF_BMODE_PROB[0][0], m)
        bd = vp8._BoolDec(be.bytes())
        assert bd.literal(8) == 0x5A
        assert bd.signed(6) == -13
        for m in range(10):
            assert bd.tree(vp8.BMODE_TREE,
                           vp8.KF_BMODE_PROB[0][0]) == m

    def test_truncation_raises(self):
        with pytest.raises(ValueError):
            bd = vp8._BoolDec(b"")
            for _ in range(100):
                bd.bool(10)


class TestTokenBlocks:
    @given(st.lists(st.integers(-2000, 2000), min_size=16, max_size=16),
           st.integers(0, 2), st.integers(0, 1))
    @settings(max_examples=60, deadline=None)
    def test_block_roundtrip(self, coeffs, ctx, first):
        if first:
            coeffs = [0] + coeffs[1:]
        probs = vp8.DEFAULT_COEFF_PROBS[0]
        be = vp8._BoolEnc()
        nz_w = vp8._write_block(be, probs, first, ctx, coeffs)
        bd = vp8._BoolDec(be.bytes())
        got, nz_r = vp8._read_block(bd, probs, first, ctx)
        assert got == coeffs
        assert nz_w == nz_r == any(coeffs[first:] or coeffs)


class TestRoundTrip:
    def test_exact_solid(self):
        img = np.zeros((16, 16, 3), np.uint8)
        img[:] = (200, 100, 50)
        got, expect = _rt(img, exact=True)
        assert np.array_equal(got, expect)
        # exactness: output equals the YUV-roundtripped input
        y, u, v = vp8.rgb_to_yuv420(img)
        assert np.array_equal(got[:, :, :3], vp8.yuv_to_rgb(y, u, v))

    @pytest.mark.parametrize("plan", ["dc", "rotate", "bpred"])
    @pytest.mark.parametrize("qi", [0, 35, 90, 127])
    def test_plans_and_quantizers(self, plan, qi):
        rng = np.random.RandomState(qi + len(plan))
        img = rng.randint(0, 256, (24, 40, 3), dtype=np.uint8)
        got, expect = _rt(img, qindex=qi, plan=plan)
        assert np.array_equal(got, expect)

    @pytest.mark.parametrize("shape", [(1, 1), (3, 5), (15, 31),
                                       (16, 17), (17, 16)])
    def test_non_mb_multiple(self, shape):
        rng = np.random.RandomState(sum(shape))
        img = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        got, expect = _rt(img, qindex=10, plan="rotate")
        assert got.shape == (*shape, 4)
        assert np.array_equal(got, expect)

    @pytest.mark.parametrize("ft,lvl", [(0, 1), (0, 26), (0, 63),
                                        (1, 10), (1, 40)])
    def test_loop_filter(self, ft, lvl):
        rng = np.random.RandomState(lvl)
        img = rng.randint(0, 256, (33, 47, 3), dtype=np.uint8)
        got, expect = _rt(img, qindex=80, plan="rotate",
                          filter_level=lvl, filter_type=ft)
        assert np.array_equal(got, expect)

    def test_loop_filter_changes_pixels(self):
        rng = np.random.RandomState(4)
        img = rng.randint(0, 256, (33, 47, 3), dtype=np.uint8)
        _, e0 = _rt(img, qindex=80, filter_level=0)
        _, e1 = _rt(img, qindex=80, filter_level=40)
        assert not np.array_equal(e0, e1)

    @pytest.mark.parametrize("nparts", [2, 4, 8])
    def test_token_partitions(self, nparts):
        rng = np.random.RandomState(nparts)
        img = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
        got, expect = _rt(img, qindex=40, plan="bpred",
                          partitions=nparts, filter_level=20)
        assert np.array_equal(got, expect)

    def test_skip_macroblocks_used(self):
        img = np.zeros((48, 48, 3), np.uint8)
        img[:] = (90, 90, 90)
        raw, expect = vp8.webp_lossy_from_rgb(img, qindex=100)
        pl = _payload(raw)
        h, bd = vp8._parse_headers(pl)
        mbs = vp8._read_modes(bd, h, h.mb_w, h.mb_h)
        assert sum(mb.skip for row in mbs for mb in row) >= 7
        assert np.array_equal(vp8.decode_vp8(pl), expect)

    @given(st.integers(0, 2 ** 32 - 1))
    @settings(max_examples=25, deadline=None)
    def test_random_images(self, seed):
        rng = np.random.RandomState(seed % (2 ** 31))
        hgt = int(rng.randint(1, 40))
        wid = int(rng.randint(1, 40))
        img = rng.randint(0, 256, (hgt, wid, 3), dtype=np.uint8)
        qi = int(rng.randint(0, 128))
        plan = ("dc", "rotate", "bpred")[seed % 3]
        lvl = int(rng.randint(0, 64))
        got, expect = _rt(img, qindex=qi, plan=plan, filter_level=lvl)
        assert np.array_equal(got, expect)


class TestContainerRouting:
    def test_decode_webp_routes_lossy(self):
        img = np.zeros((8, 8, 3), np.uint8)
        img[:] = (10, 200, 30)
        raw, expect = vp8.webp_lossy_from_rgb(img, exact=True)
        assert np.array_equal(w.decode_webp(raw), expect)

    def test_bad_start_code(self):
        img = np.zeros((8, 8, 3), np.uint8)
        raw, _ = vp8.webp_lossy_from_rgb(img)
        broken = bytearray(raw)
        broken[23] ^= 0xFF  # inside the 9D 01 2A start code
        with pytest.raises(ValueError):
            w.decode_webp(bytes(broken))

    def test_interframe_rejected(self):
        img = np.zeros((8, 8, 3), np.uint8)
        raw, _ = vp8.webp_lossy_from_rgb(img)
        pl = bytearray(_payload(raw))
        pl[0] |= 1  # frame_type = interframe
        with pytest.raises(ValueError):
            vp8.decode_vp8(bytes(pl))


class TestFuzz:
    @given(st.integers(0, 2 ** 32 - 1))
    @settings(max_examples=120, deadline=None)
    def test_mutations_never_hang_or_crash(self, seed):
        rng = np.random.RandomState(seed % (2 ** 31))
        img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
        raw, _ = vp8.webp_lossy_from_rgb(
            img, qindex=int(rng.randint(0, 128)))
        buf = bytearray(_payload(raw))
        op = seed % 3
        if op == 0 and len(buf) > 4:   # truncate
            buf = buf[:int(rng.randint(1, len(buf)))]
        elif op == 1:                   # flip bytes
            for _ in range(int(rng.randint(1, 6))):
                buf[int(rng.randint(0, len(buf)))] ^= int(
                    rng.randint(1, 256))
        else:                           # lie about partition size
            buf[2] = 0xFF
        try:
            out = vp8.decode_vp8(bytes(buf))
            assert out.dtype == np.uint8 and out.ndim == 3
        except ValueError:
            pass


class TestSegmentation:
    @pytest.mark.parametrize("segs", [(0, 30), (0, 20, -10, 40)])
    @pytest.mark.parametrize("plan", ["dc", "bpred"])
    def test_per_segment_quantizers(self, segs, plan):
        rng = np.random.RandomState(len(segs))
        img = rng.randint(0, 256, (40, 56, 3), np.uint8)
        y, u, v = vp8.rgb_to_yuv420(img)
        payload, (ry, ru, rv) = vp8.encode_vp8_yuv(
            y, u, v, qindex=50, plan=plan, segments=segs,
            filter_level=20)
        gy, gu, gv, w, h = vp8.decode_vp8_yuv(payload)
        assert np.array_equal(gy, ry)
        assert np.array_equal(gu, ru)
        assert np.array_equal(gv, rv)

    def test_segment_deltas_matter(self):
        # same image, different per-segment deltas -> different recon
        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (40, 56, 3), np.uint8)
        y, u, v = vp8.rgb_to_yuv420(img)
        _, r1 = vp8.encode_vp8_yuv(y, u, v, qindex=50,
                                   segments=(0, 0))
        _, r2 = vp8.encode_vp8_yuv(y, u, v, qindex=50,
                                   segments=(0, 60))
        assert not np.array_equal(r1[0], r2[0])

    def test_exact_rejects_segments(self):
        img = np.zeros((16, 16, 3), np.uint8)
        y, u, v = vp8.rgb_to_yuv420(img)
        with pytest.raises(ValueError):
            vp8.encode_vp8_yuv(y, u, v, exact=True, segments=(0, 1))


class TestAlpha:
    @pytest.mark.parametrize("comp", [0, 1])
    @pytest.mark.parametrize("filt", [0, 1, 2, 3])
    def test_alph_roundtrip(self, comp, filt):
        rng = np.random.RandomState(comp * 4 + filt)
        img = rng.randint(0, 256, (20, 28, 4), dtype=np.uint8)
        raw, expect = vp8.webp_lossy_rgba(
            img, qindex=40, plan="rotate", alpha_compression=comp,
            alpha_filter=filt)
        assert np.array_equal(w.decode_webp(raw), expect)
        # alpha itself is lossless
        assert np.array_equal(w.decode_webp(raw)[:, :, 3],
                              img[:, :, 3])

    def test_exact_solid_with_alpha(self):
        img = np.zeros((16, 16, 4), np.uint8)
        img[:] = (120, 40, 220, 77)
        raw, expect = vp8.webp_lossy_rgba(img, exact=True)
        got = w.decode_webp(raw)
        assert np.array_equal(got, expect)
        assert (got[:, :, 3] == 77).all()

    def test_truncated_alph_raises(self):
        img = np.zeros((16, 16, 4), np.uint8)
        raw, _ = vp8.webp_lossy_rgba(img, alpha_compression=0)
        # cut the ALPH body short
        broken = bytearray(raw)
        i = raw.index(b"ALPH")
        sz = int.from_bytes(raw[i + 4:i + 8], "little")
        broken[i + 4:i + 8] = (sz + 400).to_bytes(4, "little")
        with pytest.raises(ValueError):
            w.decode_webp(bytes(broken))
