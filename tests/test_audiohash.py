"""Audio constellation fingerprinting tests — analysis/audiohash.py."""

import numpy as np
from pyspark.sql import functions as F

from tika_spark.analysis.audiohash import (audio_fingerprint,
                                           audio_fp_fixture,
                                           audio_neardup_pairs,
                                           fixture_bin, landmarks_of,
                                           window_peak_bins)
from tika_spark.analysis.pcm import decode_audio, wav_bytes


def test_window_peak_bins_pure_sines():
    t = np.arange(256)
    for b in (3, 17, 34, 100):
        x = np.rint(8000 * np.sin(2 * np.pi * b * t / 256))
        assert window_peak_bins(x.astype(np.int64))[0] == b
    # two windows, distinct bins
    x = np.concatenate([
        np.rint(8000 * np.sin(2 * np.pi * 5 * t / 256)),
        np.rint(8000 * np.sin(2 * np.pi * 9 * t / 256))])
    assert list(window_peak_bins(x.astype(np.int64))) == [5, 9]
    # partial trailing window is dropped
    assert len(window_peak_bins(x[:300].astype(np.int64))) == 1


def test_landmark_packing():
    lms = landmarks_of(np.array([5, 9, 5], dtype=np.int64))
    assert list(lms) == [(5 << 20) | (9 << 8) | 1,
                         (9 << 20) | (5 << 8) | 1]
    assert len(landmarks_of(np.array([7], dtype=np.int64))) == 0


def test_fixture_bins_match_closed_form():
    for did in range(8):
        arr, rate = decode_audio(audio_fp_fixture(did), "audio/wav")
        bins = window_peak_bins(arr[:, 0])
        n = 4 + did % 2
        assert list(bins) == [fixture_bin((did // 2) * 8 + w)
                              for w in range(n)]


def test_fingerprint_and_pairs_spark(spark):
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType
    import pandas as pd

    @pandas_udf(BinaryType())
    def wrap(ids: pd.Series) -> pd.Series:
        return pd.Series([audio_fp_fixture(int(i)) for i in ids])

    docs = spark.range(12).select(
        F.col("id"), wrap(F.col("id")).alias("payload"),
        F.lit("audio/wav").alias("media_type"))
    fp = audio_fingerprint(docs)
    ok = fp.filter(F.col("status") == "ok")
    got = {(r.id, r.t): r.landmark for r in ok.collect()}
    assert len(got) == sum(4 + i % 2 - 1 for i in range(12))
    for (i, t), lm in got.items():
        b0 = fixture_bin((i // 2) * 8 + t)
        b1 = fixture_bin((i // 2) * 8 + t + 1)
        assert lm == (b0 << 20) | (b1 << 8) | 1
    pairs = {(r.id_a, r.id_b): r.shared
             for r in audio_neardup_pairs(fp, min_shared=2).collect()}
    for i in range(6):
        assert pairs.get((2 * i, 2 * i + 1), 0) >= 2


def test_unsupported_and_corrupt_rows(spark):
    docs = spark.createDataFrame(
        [(1, bytearray(b"RIFFjunk"), "audio/wav"),
         (2, bytearray(b"x"), "text/plain")],
        "id long, payload binary, media_type string")
    out = {r.id: r.status for r in audio_fingerprint(docs).collect()}
    assert out == {1: "error", 2: "unsupported"}


def test_short_clip_status(spark):
    x = np.zeros((100, 1), dtype=np.int16)   # < one window
    docs = spark.createDataFrame(
        [(5, bytearray(wav_bytes(x, 8000)), "audio/wav")],
        "id long, payload binary, media_type string")
    out = audio_fingerprint(docs).collect()
    assert len(out) == 1 and out[0].status == "short"
