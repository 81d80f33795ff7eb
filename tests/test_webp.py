"""From-scratch VP8L WebP codec (tika_spark/analysis/webp.py).

Lossless round-trips through genuine RIFF/WEBP bitstreams exercise
every decoder stage: simple + normal prefix codes, color cache, LZ77
row references, palette (incl. sub-byte bundling), subtract-green,
uniform predictor (all 14 modes) and cross-color transforms. The
neighbor distance map's near half is pinned against the published
spec table; arbitrary bytes must raise clean ValueErrors.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tika_spark.analysis import webp as w

_SETTINGS = dict(max_examples=60, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _rng_img(seed, h, wd, n_colors=None):
    rng = np.random.RandomState(seed)
    if n_colors:
        pal = rng.randint(0, 256, (n_colors, 4), dtype=np.uint8)
        idx = rng.randint(0, n_colors, (h, wd))
        return pal[idx]
    return rng.randint(0, 256, (h, wd, 4), dtype=np.uint8)


class TestRoundtrip:
    def test_plain_literals(self):
        img = _rng_img(1, 7, 5)
        out = w.decode_webp(w.webp_bytes(img))
        assert np.array_equal(out, img)

    def test_single_color(self):
        img = np.full((4, 6, 4), 77, dtype=np.uint8)
        out = w.decode_webp(w.webp_bytes(img))
        assert np.array_equal(out, img)

    def test_two_colors_simple_codes(self):
        img = np.zeros((5, 5, 4), dtype=np.uint8)
        img[::2] = (200, 30, 9, 255)
        out = w.decode_webp(w.webp_bytes(img))
        assert np.array_equal(out, img)

    @pytest.mark.parametrize("cache_bits", [1, 4, 8])
    def test_color_cache(self, cache_bits):
        img = _rng_img(2, 9, 9, n_colors=7)
        out = w.decode_webp(w.webp_bytes(img, cache_bits=cache_bits))
        assert np.array_equal(out, img)

    def test_row_refs_lz77(self):
        img = _rng_img(3, 2, 11)
        img = np.repeat(img, 4, axis=0)     # runs of identical rows
        raw = w.webp_bytes(img, row_refs=True)
        short = w.webp_bytes(img, row_refs=False)
        assert len(raw) < len(short)        # refs actually emitted
        assert np.array_equal(w.decode_webp(raw), img)

    def test_row_refs_with_cache(self):
        img = np.repeat(_rng_img(4, 3, 8, n_colors=4), 3, axis=0)
        raw = w.webp_bytes(img, row_refs=True, cache_bits=3)
        assert np.array_equal(w.decode_webp(raw), img)

    def test_subtract_green(self):
        img = _rng_img(5, 6, 6)
        raw = w.webp_bytes(img, subtract_green=True)
        assert np.array_equal(w.decode_webp(raw), img)

    @pytest.mark.parametrize("n_colors,expect_bundle",
                             [(2, True), (3, True), (11, True),
                              (40, False), (200, False)])
    def test_palette(self, n_colors, expect_bundle):
        img = _rng_img(6 + n_colors, 5, 13, n_colors=n_colors)
        raw = w.webp_bytes(img, palette=True)
        assert np.array_equal(w.decode_webp(raw), img)

    @pytest.mark.parametrize("mode", list(range(14)))
    def test_predictor_modes(self, mode):
        img = _rng_img(100 + mode, 8, 9)
        raw = w.webp_bytes(img, predictor=mode)
        assert np.array_equal(w.decode_webp(raw), img)

    @pytest.mark.parametrize("cte", [(10, -20, 3), (-128, 127, 1),
                                     (0, 0, 0), (31, 31, 31)])
    def test_cross_color(self, cte):
        img = _rng_img(7, 6, 7)
        raw = w.webp_bytes(img, color_cte=cte)
        assert np.array_equal(w.decode_webp(raw), img)

    def test_subtract_green_plus_predictor(self):
        img = _rng_img(8, 7, 7)
        raw = w.webp_bytes(img, subtract_green=True, predictor=11)
        assert np.array_equal(w.decode_webp(raw), img)

    def test_subtract_green_color_predictor(self):
        img = _rng_img(9, 6, 6)
        raw = w.webp_bytes(img, subtract_green=True,
                           color_cte=(5, -9, 17), predictor=12)
        assert np.array_equal(w.decode_webp(raw), img)

    def test_1x1(self):
        img = np.array([[[1, 2, 3, 4]]], dtype=np.uint8)
        assert np.array_equal(w.decode_webp(w.webp_bytes(img)), img)

    def test_full_alphabet_flat_codes(self):
        # a channel using ALL 256 values forces the flat-code
        # fallback whose length list spans the whole alphabet —
        # regression: the code-length code must not overrun it
        v = np.arange(64 * 72, dtype=np.int64) % 256
        img = np.stack([v, (v * 7) % 256, (v * 13) % 256,
                        np.full_like(v, 255)],
                       axis=1).astype(np.uint8).reshape(64, 72, 4)
        assert np.array_equal(w.decode_webp(w.webp_bytes(img)), img)


@settings(**_SETTINGS)
@given(st.integers(0, 10 ** 6), st.integers(1, 12),
       st.integers(1, 12), st.booleans(), st.integers(0, 6))
def test_roundtrip_property(seed, h, wd, sub_green, cache_bits):
    img = _rng_img(seed, h, wd)
    raw = w.webp_bytes(img, subtract_green=sub_green,
                       cache_bits=cache_bits)
    assert np.array_equal(w.decode_webp(raw), img)


@settings(**_SETTINGS)
@given(st.integers(0, 10 ** 6), st.integers(2, 17))
def test_palette_property(seed, n_colors):
    img = _rng_img(seed, 6, 10, n_colors=n_colors)
    raw = w.webp_bytes(img, palette=True)
    assert np.array_equal(w.decode_webp(raw), img)


class TestNeighborMap:
    def test_near_half_matches_spec_table(self):
        # first 40 entries of the spec's published distance map
        spec = [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
                (0, 3), (3, 0), (1, 3), (-1, 3), (3, 1), (-3, 1),
                (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
                (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3),
                (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5), (3, 4),
                (-3, 4), (4, 3), (-4, 3), (5, 0)]
        assert w.NEIGHBOR_MAP[:40] == spec

    def test_table_shape(self):
        assert len(w.NEIGHBOR_MAP) == 120
        assert len(set(w.NEIGHBOR_MAP)) == 120
        for dx, dy in w.NEIGHBOR_MAP:
            assert 0 <= dy <= 8 and -8 <= dx <= 8
            assert dy > 0 or dx > 0

    def test_plane_distance(self):
        assert w._plane_distance(121, 100) == 1     # direct
        assert w._plane_distance(1, 100) == 100     # (0, 1)
        assert w._plane_distance(2, 100) == 1       # (1, 0)
        assert w._plane_distance(4, 100) == 99      # (-1, 1)


class TestAnimation:
    def test_single_full_frame(self):
        img = _rng_img(20, 6, 8)
        img[:, :, 3] = 255
        raw = w.webp_anim_bytes([(img, 0, 0, 0, 1)], 8, 6)
        frames = w.webp_anim_frames(raw)
        assert len(frames) == 1
        assert np.array_equal(frames[0], img[:, :, :3])

    def test_overwrite_sequence_and_placement(self):
        a = np.full((4, 4, 4), (10, 20, 30, 255), dtype=np.uint8)
        b = np.full((2, 2, 4), (200, 0, 0, 255), dtype=np.uint8)
        raw = w.webp_anim_bytes([(a, 0, 0, 0, 1), (b, 2, 2, 0, 1)],
                                8, 6)
        f = w.webp_anim_frames(raw)
        assert len(f) == 2
        # canvas premultiplied onto black: untouched area stays 0
        assert (f[0][:4, :4] == (10, 20, 30)).all()
        assert (f[0][:, 4:] == 0).all() and (f[0][4:, :] == 0).all()
        assert (f[1][2:4, 2:4] == (200, 0, 0)).all()
        assert (f[1][:2, :4] == (10, 20, 30)).all()   # persists

    def test_alpha_over_blend(self):
        base = np.full((2, 2, 4), (100, 100, 100, 255),
                       dtype=np.uint8)
        half = np.full((2, 2, 4), (200, 0, 0, 128), dtype=np.uint8)
        raw = w.webp_anim_bytes([(base, 0, 0, 0, 1),
                                 (half, 0, 0, 0, 0)], 2, 2)
        f = w.webp_anim_frames(raw)
        # straight-alpha over an opaque base: out_a = 255,
        # rgb = round((fg*fa + bg*(255-fa)) / 255)
        exp_r = round((200 * 128 + 100 * 127) / 255)
        exp_g = round((0 * 128 + 100 * 127) / 255)
        assert tuple(f[1][0, 0]) == (exp_r, exp_g, exp_g)

    def test_dispose_clears_rect(self):
        a = np.full((4, 4, 4), (50, 60, 70, 255), dtype=np.uint8)
        b = np.full((2, 2, 4), (1, 2, 3, 255), dtype=np.uint8)
        raw = w.webp_anim_bytes([(a, 0, 0, 1, 1),   # dispose after
                                 (b, 0, 0, 0, 1)], 4, 4)
        f = w.webp_anim_frames(raw)
        assert (f[0] == (50, 60, 70)).all()
        assert (f[1][:2, :2] == (1, 2, 3)).all()
        assert (f[1][2:, 2:] == 0).all()            # cleared

    def test_still_raises(self):
        raw = w.webp_bytes(_rng_img(21, 3, 3))
        with pytest.raises(ValueError, match="ANMF"):
            w.webp_anim_frames(raw)

    def test_demux_routes_webp_animation(self):
        from tika_spark.analysis.video import _demux
        img = _rng_img(22, 4, 4)
        img[:, :, 3] = 255
        raw = w.webp_anim_bytes([(img, 0, 0, 0, 1)], 4, 4)
        kind, frames = _demux(raw)
        assert kind == "raw" and len(frames) == 1
        assert np.array_equal(frames[0], img[:, :, :3])

    def test_odd_offset_rejected(self):
        img = _rng_img(23, 2, 2)
        with pytest.raises(ValueError, match="even"):
            w.webp_anim_bytes([(img, 1, 0, 0, 1)], 4, 4)


class TestContainment:
    def test_not_riff(self):
        with pytest.raises(ValueError):
            w.decode_webp(b"GIF89a" + b"\x00" * 30)

    def test_lossy_garbage_raises(self):
        # a VP8 chunk routes to the lossy decoder, which rejects the
        # zero payload (no keyframe start code) cleanly
        raw = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
               + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8)
        with pytest.raises(ValueError):
            w.decode_webp(raw)

    def test_vp8x_walks_to_vp8l(self):
        inner = w.webp_bytes(_rng_img(1, 3, 3))
        vp8l = inner[12:]                    # VP8L chunk onward
        vp8x = b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 10
        riff = b"WEBP" + vp8x + vp8l
        raw = b"RIFF" + len(riff).to_bytes(4, "little") + riff
        assert np.array_equal(w.decode_webp(raw),
                              w.decode_webp(inner))

    @settings(**_SETTINGS)
    @given(st.binary(max_size=256))
    def test_random_bytes_valueerror(self, data):
        hdr = b"RIFF" + (len(data) + 12).to_bytes(4, "little") \
            + b"WEBP" + b"VP8L" + len(data).to_bytes(4, "little")
        try:
            w.decode_webp(hdr + data)
        except ValueError:
            pass

    @settings(**_SETTINGS)
    @given(st.data())
    def test_mutated_stream_contained(self, data):
        raw = bytearray(w.webp_bytes(_rng_img(11, 6, 6),
                                     cache_bits=3))
        i = data.draw(st.integers(12, len(raw) - 1))
        raw[i] ^= data.draw(st.integers(1, 255))
        try:
            out = w.decode_webp(bytes(raw))
            assert out.shape[2] == 4
        except ValueError:
            pass
