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
    rows = [(1, png_bytes(_grad(1)), "image/png"),
            (2, png_bytes(_grad(1)), "image/png"),   # exact dup
            (3, b"junk", "image/png"),
            (4, png_bytes(_grad(9)), "image/webp")]  # unsupported
    df = spark.createDataFrame(
        rows, "id long, payload binary, media_type string")
    out = {r["id"]: r for r in image_dhash(df).collect()}
    assert out[1]["status"] == "ok"
    assert out[1]["dhash"] == out[2]["dhash"] == dhash_bits(_grad(1))
    assert out[3]["status"] == "error"
    assert out[4]["status"] == "unsupported"


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
