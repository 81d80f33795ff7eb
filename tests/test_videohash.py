"""Video near-dup fingerprinting tests — analysis/videohash.py."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tika_spark.analysis.imagehash import dhash_bits
from tika_spark.analysis.video import _demux
from tika_spark.analysis.videohash import (frame_bit, video_dhash,
                                           video_dhash_fixture,
                                           video_neardup_pairs)


def _expected_hash(o: int) -> int:
    h = 0
    for y in range(8):
        for x in range(8):
            if frame_bit(o, x, y):
                h |= 1 << (y * 8 + x)
    return h - (1 << 64) if h >= 1 << 63 else h


def test_fixture_bits_extract_exactly():
    for did in range(8):
        kind, frames = _demux(video_dhash_fixture(did))
        assert kind == "raw"
        assert len(frames) == 2 + did % 2
        for k, f in enumerate(frames):
            assert dhash_bits(f) == _expected_hash((did // 2) * 4 + k)


def test_adjacent_ids_share_two_hashes():
    h_even = {_expected_hash(0), _expected_hash(1)}
    h_odd = {_expected_hash(0), _expected_hash(1), _expected_hash(2)}
    assert len(h_even & h_odd) == 2
    h_far = {_expected_hash(8), _expected_hash(9)}
    assert not (h_even & h_far)


def test_video_dhash_spark(spark):
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType
    import pandas as pd

    @pandas_udf(BinaryType())
    def wrap(ids: pd.Series) -> pd.Series:
        return pd.Series([video_dhash_fixture(int(i)) for i in ids])

    docs = spark.range(20).select(
        F.col("id"), wrap(F.col("id")).alias("payload"))
    fp = video_dhash(docs, every=1)
    rows = {(r.id, r.frame_idx): r.dhash
            for r in fp.filter(F.col("status") == "ok").collect()}
    assert len(rows) == sum(2 + i % 2 for i in range(20))
    for (i, k), h in rows.items():
        assert h == _expected_hash((i // 2) * 4 + k)
    # pair mining: exactly the (2i, 2i+1) couples, shared == 2
    pairs = {(r.id_a, r.id_b): r.shared
             for r in video_neardup_pairs(fp, min_shared=2).collect()}
    assert pairs == {(2 * i, 2 * i + 1): 2 for i in range(10)}


def test_corrupt_payload_yields_status_row(spark):
    docs = spark.createDataFrame(
        [(1, bytearray(b"not a video"))], "id long, payload binary")
    out = video_dhash(docs).collect()
    assert len(out) == 1 and out[0].status == "error"


def test_max_bucket_caps_degenerate_frames(spark):
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType
    import pandas as pd

    from tika_spark.analysis.pixels import gif_anim_bytes

    @pandas_udf(BinaryType())
    def solid(ids: pd.Series) -> pd.Series:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3,
                        axis=1)
        img = np.full((8, 9), 100, np.uint8)
        return pd.Series([gif_anim_bytes([img, img], pal)
                          for _ in ids])

    docs = spark.range(10).select(
        F.col("id"), solid(F.col("id")).alias("payload"))
    fp = video_dhash(docs)
    # all ten videos share the all-zeros hash: the cap suppresses
    # the quadratic candidate set entirely
    assert video_neardup_pairs(fp, min_shared=1,
                               max_bucket=4).count() == 0
    assert video_neardup_pairs(fp, min_shared=1,
                               max_bucket=100).count() == 45
