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


class TestRle8:
    """MS-RLE8 inter-frame codec (decode_rle8 + AVI MRLE demux)."""

    def test_keyframe_runs_and_eob(self):
        from tika_spark.analysis.video import decode_rle8
        data = bytes((4, 9, 0, 0, 4, 7, 0, 0, 0, 1))
        out = decode_rle8(data, 4, 2)
        # bottom-up: first encoded row is the bottom one
        assert out[1].tolist() == [9] * 4
        assert out[0].tolist() == [7] * 4

    def test_skips_show_previous_frame(self):
        import numpy as np

        from tika_spark.analysis.video import decode_rle8
        prev = np.full((2, 4), 5, dtype=np.uint8)
        # EOL skips the whole bottom row; top row becomes 8
        data = bytes((0, 0, 4, 8, 0, 0, 0, 1))
        out = decode_rle8(data, 4, 2, prev)
        assert out[1].tolist() == [5] * 4      # inter-frame
        assert out[0].tolist() == [8] * 4

    def test_delta_and_absolute_mode(self):
        import numpy as np

        from tika_spark.analysis.video import decode_rle8
        prev = np.zeros((3, 8), dtype=np.uint8)
        # move to x=2,y=1 then write 3 literal pixels (odd n: padded)
        data = bytes((0, 2, 2, 1, 0, 3, 11, 12, 13, 0, 0, 1))
        out = decode_rle8(data, 8, 3, prev)
        assert out[1, 2:5].tolist() == [11, 12, 13]
        assert out.sum() == 36                 # everything else kept

    def test_overrun_and_truncation_raise(self):
        import numpy as np

        from tika_spark.analysis.video import decode_rle8
        with pytest.raises(ValueError, match="overrun"):
            decode_rle8(bytes((9, 1, 0, 1)), 4, 2)
        with pytest.raises(ValueError, match="truncated"):
            decode_rle8(bytes((2, 1)), 4, 2)

    def test_demux_composites_chain(self):
        from tika_spark.analysis.pixels import channel_means_micro
        from tika_spark.analysis.video import _demux, video_rle_fixture
        for i in (0, 5, 13, 200):
            w = 16 + i % 8
            v0, v1, v2 = i % 256, (i * 7 + 31) % 256, (i * 13 + 5) % 256
            kind, frames = _demux(video_rle_fixture(i))
            assert kind == "raw" and len(frames) == 3
            s1 = 4 * w * (v0 + v1)
            s2 = s1 - 4 * v1 + 4 * v2
            assert channel_means_micro(frames[0])[0] == v0 * 1_000_000
            assert channel_means_micro(frames[1])[0] == \
                (s1 * 1_000_000 + 4 * w) // (8 * w)
            assert channel_means_micro(frames[2])[0] == \
                (s2 * 1_000_000 + 4 * w) // (8 * w)

    def test_operator_samples_rle(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        from tika_spark.analysis.video import (sample_frame_stats,
                                               video_rle_fixture)

        @pandas_udf(BinaryType())
        def wrap(ids: pd.Series) -> pd.Series:
            return pd.Series([video_rle_fixture(int(i)) for i in ids])

        df = spark.range(4).select(F.col("id"),
                                   wrap(F.col("id")).alias("payload"))
        got = sample_frame_stats(df, every=2).collect()
        assert len(got) == 8                   # frames 0 and 2 per id
        by = {(r.id, r.frame_idx): r for r in got}
        assert by[(3, 0)].status == "ok"
        assert by[(3, 0)].mean_micro[0] == 3 * 1_000_000
        assert by[(3, 2)].n_frames == 3


class TestApng:
    """Animated-PNG frame compositing (pixels.apng_frames)."""

    def _mk(self, frames, w=12, h=8, color=0):
        from tika_spark.analysis.pixels import apng_bytes
        return apng_bytes(frames, w, h, color=color)

    def test_dispose_previous_reverts(self):
        import numpy as np

        from tika_spark.analysis.pixels import apng_frames
        data = self._mk([
            (np.full((8, 12), 100, np.uint8), 0, 0, 0, 0),
            (np.full((4, 6), 200, np.uint8), 2, 2, 2, 0),  # previous
            (np.full((2, 3), 50, np.uint8), 0, 0, 0, 0)])
        f = apng_frames(data)
        assert len(f) == 3
        assert f[1][3, 3].tolist() == [200] * 3
        assert f[2][3, 3].tolist() == [100] * 3   # v1 reverted
        assert f[2][0, 0].tolist() == [50] * 3

    def test_dispose_background_clears(self):
        import numpy as np

        from tika_spark.analysis.pixels import apng_frames
        data = self._mk([
            (np.full((8, 12), 9, np.uint8), 0, 0, 1, 0),  # background
            (np.full((1, 1), 200, np.uint8), 0, 0, 0, 0)])
        f = apng_frames(data)
        assert f[1][5, 5].tolist() == [0] * 3     # cleared
        assert f[1][0, 0].tolist() == [200] * 3

    def test_blend_over_alpha(self):
        import numpy as np

        from tika_spark.analysis.pixels import apng_frames
        # grayscale+alpha sub-frame at alpha 128 over a 100 canvas;
        # apng_bytes is color-locked to 0/2, so craft the
        # color-type-4 (gray+alpha) stream by hand
        import struct
        import zlib as _z
        ga = np.zeros((2, 2, 2), np.uint8)
        ga[:, :, 0] = 200
        ga[:, :, 1] = 128
        f0 = np.zeros((8, 12, 2), np.uint8)
        f0[:, :, 0] = 100
        f0[:, :, 1] = 255
        frames = [(f0, 0, 0, 0, 0), (ga, 0, 0, 0, 1)]

        def chunk(ctype, body):
            return (struct.pack(">I", len(body)) + ctype + body
                    + struct.pack(">I", _z.crc32(ctype + body)))

        out = bytearray(b"\x89PNG\r\n\x1a\n")
        out += chunk(b"IHDR", struct.pack(">IIBBBBB", 12, 8, 8, 4,
                                          0, 0, 0))
        out += chunk(b"acTL", struct.pack(">II", 2, 0))
        seq = 0
        for i, (arr, x, y, dis, bl) in enumerate(frames):
            fh, fw = arr.shape[:2]
            out += chunk(b"fcTL", struct.pack(
                ">IIIIIHHBB", seq, fw, fh, x, y, 1, 10, dis, bl))
            seq += 1
            rows = b"".join(b"\x00" + arr[r].tobytes()
                            for r in range(fh))
            payload = _z.compress(rows)
            if i == 0:
                out += chunk(b"IDAT", payload)
            else:
                out += chunk(b"fdAT", struct.pack(">I", seq) + payload)
                seq += 1
        out += chunk(b"IEND", b"")
        f = apng_frames(bytes(out))
        # (200*128 + 100*127 + 127) // 255 = 150
        assert f[1][0, 0].tolist() == [150] * 3
        assert f[1][5, 5].tolist() == [100] * 3

    def test_still_png_is_not_video(self):
        import numpy as np

        from tika_spark.analysis.pixels import apng_frames, png_bytes
        with pytest.raises(ValueError, match="acTL"):
            apng_frames(png_bytes(np.zeros((3, 3, 3), np.uint8)))

    def test_frame_outside_canvas_raises(self):
        import numpy as np

        from tika_spark.analysis.pixels import apng_frames
        data = self._mk([
            (np.full((8, 12), 1, np.uint8), 0, 0, 0, 0),
            (np.full((4, 6), 2, np.uint8), 10, 6, 0, 0)])
        with pytest.raises(ValueError, match="outside"):
            apng_frames(data)

    def test_demux_routes_apng(self, spark):
        import numpy as np
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        from tika_spark.analysis.pixels import apng_bytes
        from tika_spark.analysis.video import sample_frame_stats

        @pandas_udf(BinaryType())
        def wrap(ids: pd.Series) -> pd.Series:
            out = []
            for i in ids:
                v = int(i) % 256
                out.append(apng_bytes(
                    [(np.full((8, 12), v, np.uint8), 0, 0, 0, 0),
                     (np.full((8, 12), 255 - v, np.uint8),
                      0, 0, 0, 0)], 12, 8))
            return pd.Series(out)

        df = spark.range(3).select(F.col("id"),
                                   wrap(F.col("id")).alias("payload"))
        got = {(r.id, r.frame_idx): r
               for r in sample_frame_stats(df, every=1).collect()}
        assert got[(2, 0)].mean_micro[0] == 2_000_000
        assert got[(2, 1)].mean_micro[0] == 253_000_000


class TestMsvc:
    """MS Video 1 (CRAM) inter-frame codec at 8 and 16 bpp."""

    def test_single_bit_lands_bottom_left(self):
        import struct

        import numpy as np

        from tika_spark.analysis.video import decode_msvc
        # 8x8 = 4 blocks; block 0 gets mask bit 0 only → exactly the
        # bottom-left pixel of the frame takes color0, the other 15
        # take color1; remaining blocks 1-color 0
        data = struct.pack("<H", 1) + bytes((7, 9)) \
            + bytes((0, 0x88)) * 3
        out = decode_msvc(data, 8, 8, 8)
        assert out[7, 0] == 7                 # bit 0 = bottom-left
        blk = out[4:8, 0:4]
        assert int((blk == 9).sum()) == 15
        assert not out[0:4].any() and not out[4:8, 4:8].any()

    def test_bit15_is_unreachable(self):
        # mask words are < 0x8000 by construction: the top-right
        # pixel of a 2-color block (bit 15) always takes color1
        import struct

        from tika_spark.analysis.video import decode_msvc
        data = struct.pack("<H", 0x7FFF) + bytes((7, 9)) \
            + bytes((0, 0x88)) * 3
        out = decode_msvc(data, 8, 8, 8)
        assert out[4, 3] == 9                 # bit 15: forced color1
        assert int((out[4:8, 0:4] == 7).sum()) == 15

    def test_skip_code_shows_previous(self):
        import numpy as np

        from tika_spark.analysis.video import decode_msvc
        prev = np.full((8, 8), 42, dtype=np.uint8)
        # skip 3 blocks starting at block 0, then 1-color 9
        data = bytes((3, 0x84)) + bytes((9, 0x88))
        out = decode_msvc(data, 8, 8, 8, prev)
        assert (out[4:8] == 42).all()         # bottom block row
        assert (out[0:4, 0:4] == 42).all()
        assert (out[0:4, 4:8] == 9).all()     # block 3 = top-right

    def test_eight_color_quadrants(self):
        import struct

        from tika_spark.analysis.video import decode_msvc
        # one 4x4 frame, mask 0 → every pixel takes color1 of its
        # quadrant pair; q0 carries the 0x80 flag
        data = struct.pack("<H", 0) + bytes((0x80, 1, 2, 3, 4, 5, 6, 7))
        out = decode_msvc(data, 4, 4, 8)
        assert out[3, 0] == 1 and out[3, 2] == 3   # bottom-l/r pairs
        assert out[1, 0] == 5 and out[1, 2] == 7   # top-l/r pairs

    def test_16bpp_one_color_and_expand(self):
        import struct

        from tika_spark.analysis.video import (decode_msvc,
                                               rgb555_expand)
        word = 0x8000 | (5 << 10) | (20 << 5) | 31
        out = decode_msvc(struct.pack("<H", word), 4, 4, 16)
        rgb = rgb555_expand(out)
        assert rgb[0, 0].tolist() == [41, 165, 255]  # (c<<3)|(c>>2)

    def test_truncation_and_overrun_raise(self):
        import struct

        import pytest

        from tika_spark.analysis.video import decode_msvc
        with pytest.raises(ValueError):
            decode_msvc(b"\x55", 4, 4, 8)             # short word
        with pytest.raises(ValueError):
            decode_msvc(struct.pack("<H", 0x55), 4, 4, 8)  # no colors
        with pytest.raises(ValueError):
            decode_msvc(bytes((9, 0x84)), 8, 8, 8)    # skip overrun
        with pytest.raises(ValueError):
            decode_msvc(b"", 6, 4, 8)                 # bad width

    def test_demux_composites_chain(self):
        from tika_spark.analysis.pixels import channel_means_micro
        from tika_spark.analysis.video import (_demux,
                                               video_msvc_fixture)
        for doc_id in (0, 1, 2, 3):
            kind, frames = _demux(video_msvc_fixture(doc_id))
            assert kind == "raw" and len(frames) == 3
            m = [channel_means_micro(f) for f in frames]
            assert m[0][0] == m[0][1] == m[0][2]  # gray fixtures
            assert m[1][0] != m[0][0]             # composition moved

    def test_operator_samples_msvc(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        from tika_spark.analysis.video import (sample_frame_stats,
                                               video_msvc_fixture)

        @pandas_udf(BinaryType())
        def wrap(ids: pd.Series) -> pd.Series:
            return pd.Series([video_msvc_fixture(int(i))
                              for i in ids])

        df = spark.range(4).select(
            F.col("id"), wrap(F.col("id")).alias("payload"))
        got = {(r.id, r.frame_idx): r
               for r in sample_frame_stats(df, every=2).collect()}
        assert got[(0, 0)].mean_micro[0] == 0       # v0 = 0
        assert got[(2, 0)].mean_micro[0] == 2_000_000
        # odd id 1: 16 bpp, a0 = 3 → E(3) = 24
        assert got[(1, 0)].mean_micro[0] == 24_000_000
        for k in got.values():
            assert k.status == "ok" and k.n_frames == 3
