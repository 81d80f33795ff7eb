"""MJPEG-AVI demux + frame sampling (analysis/video.py)."""

import numpy as np
import pytest

from tika_spark.analysis.jpegcodec import (decode_jpeg, jpeg_bytes,
                                           solid_gray_decoded_value)
from tika_spark.analysis.video import (avi_frames, avi_mjpeg_bytes,
                                       sample_frame_stats, video_fixture)


def test_avi_roundtrip():
    frames = [jpeg_bytes(np.full((8, 16, 1), v, np.uint8))
              for v in (10, 100, 250)]
    avi = avi_mjpeg_bytes(frames, 16, 8)
    assert avi_frames(avi) == frames


def test_fixture_closed_form():
    from tika_spark.analysis.video import _demux
    for d in (0, 1, 2, 5, 7, 13):
        kind, fs = _demux(video_fixture(d))
        assert len(fs) == 3 + d % 4
        for idx, fb in enumerate(fs):
            v = (d * 11 + 17 * idx) % 256
            if kind == "jpeg":          # even ids: MJPEG AVI
                arr = decode_jpeg(fb)
                want = solid_gray_decoded_value(v)
                assert arr.shape == (8, 16 + d % 8, 1)
            else:                       # odd ids: animated GIF
                arr = fb
                want = v                # lossless composite
                assert arr.shape == (8, 16 + d % 8, 3)
            assert set(np.unique(arr)) == {want}


def test_avi_rejects_garbage_and_truncation():
    avi = video_fixture(3)
    for bad in (b"", b"MThd\x00\x00", avi[:len(avi) // 2], avi[:40]):
        with pytest.raises(ValueError):
            avi_frames(bad)
    # a header-only AVI is structurally valid: zero frames, no error
    assert avi_frames(b"RIFF\x04\x00\x00\x00AVI ") == []


def test_sample_frame_stats_operator(spark):
    rows = [(0, video_fixture(0)),          # 3 frames → idx 0, 2
            (1, video_fixture(1)),          # 4 frames → idx 0, 2
            (2, video_fixture(2)),          # 5 frames → idx 0, 2, 4
            (9, b"not a video")]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = sample_frame_stats(df, every=2).collect()
    by = {}
    for r in out:
        by.setdefault(r["id"], []).append(r)
    assert [r["frame_idx"] for r in sorted(by[0], key=lambda r:
                                           r["frame_idx"])] == [0, 2]
    assert [r["frame_idx"] for r in sorted(by[2], key=lambda r:
                                           r["frame_idx"])] == [0, 2, 4]
    ok = sorted(by[2], key=lambda r: r["frame_idx"])[1]
    v = (2 * 11 + 17 * 2) % 256
    assert ok["status"] == "ok"
    assert ok["mean_micro"] == [solid_gray_decoded_value(v) * 1_000_000]
    assert ok["n_frames"] == 5 and ok["width"] == 18 and ok["height"] == 8
    # the corrupt row is one error row, not a task failure
    assert len(by[9]) == 1 and by[9][0]["status"] == "error"
    assert by[9][0]["frame_idx"] == -1


def test_corrupt_single_frame_is_isolated(spark):
    good = jpeg_bytes(np.full((8, 8, 1), 90, np.uint8))
    avi = avi_mjpeg_bytes([good, b"\xff\xd8garbage", good], 8, 8)
    df = spark.createDataFrame([(1, avi)], "id long, payload binary")
    out = {r["frame_idx"]: r for r in
           sample_frame_stats(df, every=1).collect()}
    assert out[0]["status"] == "ok" and out[2]["status"] == "ok"
    assert out[1]["status"] == "error"


def test_animated_gif_through_operator(spark):
    import numpy as np

    from tika_spark.analysis.pixels import gif_anim_bytes
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    frames = [np.full((6, 10), v, np.uint8) for v in (3, 99, 250)]
    df = spark.createDataFrame(
        [(1, gif_anim_bytes(frames, pal))], "id long, payload binary")
    out = sorted(sample_frame_stats(df, every=1).collect(),
                 key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 1, 2]
    assert all(r["status"] == "ok" and r["n_frames"] == 3 for r in out)
    assert [r["mean_micro"][0] // 1_000_000 for r in out] == [3, 99, 250]


def test_gif_disposal_and_transparency():
    import numpy as np

    from tika_spark.analysis.pixels import gif_anim_bytes, gif_frames
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    f1 = np.full((4, 4), 10, np.uint8)
    f2 = np.full((4, 4), 20, np.uint8)
    f2[0, 0] = 255                     # transparent index
    # disposal 1 (leave): transparent pixel shows the previous frame
    o = gif_frames(gif_anim_bytes([f1, f2], pal, disposal=1,
                                  transparent=255))
    assert o[1][0, 0, 0] == 10 and o[1][1, 1, 0] == 20
    # disposal 2 (restore background): transparent pixel shows bg 0
    o2 = gif_frames(gif_anim_bytes([f1, f2], pal, disposal=2,
                                   transparent=255))
    assert o2[1][0, 0, 0] == 0
