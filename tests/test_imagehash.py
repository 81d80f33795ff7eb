"""Perceptual dHash + banded Hamming near-dup (analysis/imagehash)."""

import numpy as np
import pytest

from tika_spark.analysis.imagehash import (dhash_bits, dhash_pairs,
                                           image_dhash)
from tika_spark.analysis.pixels import png_bytes


def _grad(d, w=72, h=64):
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    v = ((d * 7 + 2 * xs + 3 * ys) % 256).astype(np.uint8)
    return np.repeat(v[:, :, None], 3, axis=2)


def test_dhash_invariant_to_block_rescale():
    # dHash's point: a block-downscaled copy hashes identically
    from tika_spark.analysis.pixels import resize_image
    a = _grad(5)
    half = resize_image(a, 32, 36)
    assert dhash_bits(a) == dhash_bits(half)


def test_dhash_differs_for_different_images():
    assert dhash_bits(_grad(5)) != dhash_bits(
        255 - _grad(5))                 # inverted gradient flips bits


def test_dhash_solid_is_zero():
    assert dhash_bits(np.full((16, 18, 3), 77, np.uint8)) == 0


def test_image_dhash_operator(spark):
    from tika_spark.analysis.webp import webp_bytes
    g = _grad(1)
    rgba = np.dstack([g, np.full(g.shape[:2], 255, np.uint8)])
    rows = [(1, png_bytes(_grad(1)), "image/png"),
            (2, png_bytes(_grad(1)), "image/png"),   # exact dup
            (3, b"junk", "image/png"),
            (4, png_bytes(_grad(9)), "image/avif"),  # unsupported
            (5, webp_bytes(rgba), "image/webp")]     # same luma as 1
    df = spark.createDataFrame(
        rows, "id long, payload binary, media_type string")
    out = {r["id"]: r for r in image_dhash(df).collect()}
    assert out[1]["status"] == "ok"
    assert out[1]["dhash"] == out[2]["dhash"] == dhash_bits(_grad(1))
    assert out[3]["status"] == "error"
    assert out[4]["status"] == "unsupported"
    assert out[5]["status"] == "ok"


def test_dhash_pairs_banded_equals_allpairs(spark):
    rng = np.random.RandomState(11)
    base = rng.randint(-(1 << 62), 1 << 62, size=40).astype(np.int64)
    # plant near-dups: flip <=7 bits of some hashes
    rows = [(i, int(h)) for i, h in enumerate(base)]
    for j, flips in ((0, 1), (1, 3), (2, 7)):
        h = int(base[j])
        for b in range(flips):
            h ^= 1 << (b * 9)
        rows.append((100 + j, h))
    df = spark.createDataFrame(rows, "id long, dhash long")
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           dhash_pairs(df, max_dist=7, max_bucket=10_000).collect()}
    # exact all-pairs reference
    want = set()
    for i, (ia, ha) in enumerate(rows):
        for ib, hb in rows[i + 1:]:
            a, b = sorted((ia, ib))
            d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
            if d <= 7:
                want.add((a, b, d))
    assert got == want
    assert {(0, 100, 1), (1, 101, 3), (2, 102, 7)} <= want


def test_dhash_pairs_rejects_unguaranteed_distance(spark):
    df = spark.createDataFrame([(1, 0)], "id long, dhash long")
    with pytest.raises(ValueError):
        dhash_pairs(df, max_dist=8)


class TestPhash:
    def _img(self, seed=0, h=64, w=64):
        rng = np.random.default_rng(seed)
        base = rng.integers(60, 196, size=(8, 8), dtype=np.uint8)
        # smooth structured image: upscale a coarse pattern
        return np.repeat(np.repeat(base, h // 8, 0), w // 8, 1)[
            :, :, None]

    def test_rescale_invariance(self):
        from tika_spark.analysis.imagehash import phash_bits
        a = self._img(1, 64, 64)
        b = np.repeat(np.repeat(a[:, :, 0], 2, 0), 2, 1)[:, :, None]
        assert phash_bits(a) == phash_bits(b)   # exact: same 32×32

    def test_jpeg_recompression_is_near(self):
        from tika_spark.analysis.imagehash import phash_bits
        from tika_spark.analysis.jpegcodec import decode_jpeg, \
            jpeg_bytes
        a = self._img(2)
        jp = decode_jpeg(jpeg_bytes(a, quality=75))
        d = bin(phash_bits(a) ^ phash_bits(jp)).count("1")
        assert d <= 6, d                        # perceptually close
        # and a different image is far
        c = self._img(9)
        far = bin(phash_bits(a) ^ phash_bits(c)).count("1")
        assert far > 12, far

    def test_dc_bit_always_zero(self):
        from tika_spark.analysis.imagehash import phash_bits
        for seed in range(5):
            assert phash_bits(self._img(seed)) & 1 == 0

    def test_phash_pairs_reuses_banded_join(self, spark):
        from tika_spark.analysis.imagehash import (dhash_pairs,
                                                   image_phash,
                                                   phash_bits)
        from tika_spark.analysis.pixels import png_bytes
        a = self._img(3)
        b = a.copy()
        b[:4, :4, 0] ^= 8                       # tiny perturbation
        c = self._img(7)
        rows = [(1, png_bytes(a), "image/png"),
                (2, png_bytes(b), "image/png"),
                (3, png_bytes(c), "image/png"),
                (4, b"bad", "image/png")]
        df = spark.createDataFrame(
            rows, "id long, payload binary, media_type string")
        hashes = image_phash(df)
        got = {r.id: r for r in hashes.collect()}
        assert got[1].status == "ok" and got[4].status == "error"
        assert got[1].phash == phash_bits(a)
        pairs = dhash_pairs(hashes.filter("status = 'ok'"),
                            max_dist=7, hash_col="phash").collect()
        ids = {(p.id_a, p.id_b) for p in pairs}
        assert (1, 2) in ids and (1, 3) not in ids
