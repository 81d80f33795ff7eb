"""Matroska/WebM EBML demux tests."""

import numpy as np
import pytest

from tika_spark.analysis import ebml as e


class TestVint:
    def test_roundtrip(self):
        for v in (0, 1, 126, 127, 128, 300, 2 ** 20, 2 ** 35):
            enc = e._enc_vint(v)
            got, pos = e._vint(enc, 0, keep_marker=False)
            assert got == v and pos == len(enc)

    def test_unknown_size(self):
        got, _ = e._vint(b"\xff", 0, keep_marker=False)
        assert got == e._UNKNOWN

    def test_element_id_keeps_marker(self):
        got, _ = e._vint(b"\x1aE\xdf\xa3", 0, keep_marker=True)
        assert got == 0x1A45DFA3


class TestInfo:
    def test_fixture_metadata(self):
        for d in (0, 1, 3, 5):
            info = e.mkv_info(e.mkv_vorbis_fixture(d))
            assert info["doctype"] == "webm"
            t = info["tracks"][0]
            assert t["type"] == "audio"
            assert t["codec"] == "A_VORBIS"
            assert t["sample_rate"] == 8000 * (1 + d % 4)
            assert t["channels"] == 1 + d % 2
            assert info["duration_s"] > 0

    def test_not_ebml(self):
        with pytest.raises(ValueError, match="not an EBML"):
            e.mkv_info(b"RIFF" * 10)

    def test_truncated_element_raises(self):
        mkv = e.mkv_vorbis_fixture(1)
        with pytest.raises(ValueError):
            e.mkv_info(mkv[:20])                 # header cut short


class TestFrames:
    def test_track_frames_roundtrip(self):
        from tika_spark.analysis.vorbis import (vorbis_headers,
                                                vorbis_silent_packet)
        headers = vorbis_headers(1, 8000)
        audio = [vorbis_silent_packet(1)] * 3
        mkv = e.mkv_wrap_vorbis(headers, audio, 8000, 1)
        assert e.mkv_track_frames(mkv, 1) == audio
        assert e.mkv_track_frames(mkv, 2) == []

    def test_codec_private_xiph_lacing(self):
        pkts = [b"a" * 30, b"b" * 255, b"c" * 300]
        laced = e._xiph_lace(pkts)
        assert e.xiph_private_packets(laced) == pkts

    def test_decode_closed_forms(self):
        for d in range(6):
            s, rate = e.decode_mkv_vorbis(e.mkv_vorbis_fixture(d))
            assert rate == 8000 * (1 + d % 4)
            assert s.shape == ((1 + d % 3) * 128, 1 + d % 2)
            assert (s == 0).all()

    def test_no_vorbis_track_raises(self):
        mkv = e.mkv_wrap_vorbis(
            [b"x", b"y", b"z"], [b"f"], 8000, 1)
        bad = mkv.replace(b"A_VORBIS", b"A_OPUS\x00\x00")
        with pytest.raises(ValueError, match="no Vorbis"):
            e.decode_mkv_vorbis(bad)


class TestPipeline:
    def test_magic_detects_webm(self):
        from tika_spark.mime.magic import match_magic
        got = match_magic(e.mkv_vorbis_fixture(0)[:64])
        assert got in ("video/webm", "video/x-matroska")

    def test_media_meta(self):
        from tika_spark.media import extract_media
        r = extract_media(e.mkv_vorbis_fixture(2), mime="video/webm")
        md = r["metadata"]
        assert md["doctype"] == ["webm"]
        assert md["compression-type"] == ["A_VORBIS"]
        assert md["xmpDM:audioSampleRate"] == ["24000"]

    def test_audio_pcm_stats_over_webm(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        from tika_spark.analysis.pcm import audio_pcm_stats

        @pandas_udf(BinaryType())
        def wrap(ids: pd.Series) -> pd.Series:
            return pd.Series([e.mkv_vorbis_fixture(int(i))
                              for i in ids])

        df = spark.range(4).select(
            F.col("id"), wrap(F.col("id")).alias("payload"),
            F.lit("video/webm").alias("media_type")).repartition(2)
        rows = {r.id: r for r in audio_pcm_stats(df).collect()}
        for i in range(4):
            r = rows[i]
            assert r.status == "ok"
            assert r.n_samples == (1 + i % 3) * 128
            assert r.sample_rate == 8000 * (1 + i % 4)
            assert r.rms_micro == 0


def test_mkv_subtitles_roundtrip():
    from tika_spark.analysis.ebml import (mkv_subtitles,
                                          mkv_wrap_subtitles)
    cues = [{"start_ms": 0, "end_ms": 1400, "text": "Hello world"},
            {"start_ms": 90_000, "end_ms": 92_000,
             "text": "<i>Deep</i> into the file"},
            {"start_ms": 1500, "end_ms": 2900,
             "text": "Out-of-order input"}]
    out = mkv_subtitles(mkv_wrap_subtitles(cues))
    assert [c["start_ms"] for c in out] == [0, 1500, 90_000]
    assert out[2]["text"] == "Deep into the file"
    assert out[0]["end_ms"] == 1400
    # duration survives via BlockDuration
    assert out[2]["end_ms"] == 92_000


def test_mkv_subtitles_requires_s_text():
    import pytest

    from tika_spark.analysis.ebml import (EbmlError, mkv_subtitles,
                                          mkv_wrap_video)
    with pytest.raises(EbmlError):
        mkv_subtitles(mkv_wrap_video([b"\x00"], 16, 16))
