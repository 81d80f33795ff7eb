"""From-scratch AAC-LC codec (tika_spark/analysis/aaccodec.py).

Verification mirrors tests/test_mp3.py: the fixture encoder writes
genuine Huffman-coded ADTS frames, and the decoder is checked
against independently-computed plain-loop IMDCT/window/overlap-add
references (the vectorized module vs direct math here), the silent
closed-form family, M/S + intensity stereo, codebook-11 escapes,
short-window grouping/deinterleave, window-shape switching, and the
pipeline integration through audio_pcm_stats.
"""

import math

import numpy as np
import pytest

from tika_spark.analysis import aaccodec as a


def _ref_pcm_long(spec: np.ndarray, gg: int = 100,
                  shape_left: int = 0, shape_right: int = 0,
                  seq: int = a.ONLY_LONG) -> np.ndarray:
    """Independent plain-math windowed IMDCT of one long frame
    (2048 samples, pre-overlap)."""
    x = np.sign(spec).astype(float) * np.abs(spec) ** (4.0 / 3.0) \
        * 2.0 ** (0.25 * (gg - 100))
    n_pts, n0 = 2048, (1024 + 1) / 2.0
    n = np.arange(n_pts)
    k = np.arange(1024)
    z = (2.0 / n_pts) * np.cos(
        2 * math.pi / n_pts * np.outer(n + n0, k + 0.5)) @ x

    def half(shape, m):
        if shape == 0:
            return np.sin(math.pi / (2 * m) * (np.arange(m) + 0.5))
        kb = np.kaiser(m + 1, math.pi * (4.0 if m == 1024 else 6.0))
        c = np.cumsum(kb)
        return np.sqrt(c[:-1] / c[-1])

    lw, rw = half(shape_left, 1024), half(shape_right, 1024)[::-1]
    if seq == a.ONLY_LONG:
        z[:1024] *= lw
        z[1024:] *= rw
    elif seq == a.LONG_START:
        z[:1024] *= lw
        z[1472:1600] *= half(shape_right, 128)[::-1]
        z[1600:] = 0.0
    elif seq == a.LONG_STOP:
        z[:448] = 0.0
        z[448:576] *= half(shape_left, 128)
        z[1024:] *= rw
    return z


def _clip16(x: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(
        np.int16)


class TestTables:
    def test_codebooks_are_prefix_free_and_bounded(self):
        for cb, tab in a.HCB.items():
            dim, lav, signed = a.HCB_META[cb]
            lo = -lav if signed else 0
            assert len(tab) == (lav - lo + 1) ** dim
            # Kraft equality: the canonical Huffman code is complete
            assert sum(2.0 ** -ln for _, ln in tab.values()) == \
                pytest.approx(1.0)
            assert max(ln for _, ln in tab.values()) <= 19
        assert sum(2.0 ** -ln for _, ln in a.HCB_SF.values()) == \
            pytest.approx(1.0)

    def test_grouping_decode(self):
        assert a._decode_grouping(0) == [1] * 8
        assert a._decode_grouping(0b1111111) == [8]
        assert a._decode_grouping(0b1110111) == [4, 4]
        assert a._decode_grouping(0b0100110) == [1, 2, 1, 3, 1]

    def test_swb_tables_cover_spectrum(self):
        assert a.SWB_LONG[0] == 0 and a.SWB_LONG[-1] == 1024
        assert a.SWB_SHORT[0] == 0 and a.SWB_SHORT[-1] == 128
        assert list(a.SWB_LONG) == sorted(a.SWB_LONG)
        assert list(a.SWB_SHORT) == sorted(a.SWB_SHORT)


class TestAdts:
    def test_header_roundtrip(self):
        z = np.zeros(1024, dtype=np.int64)
        data = a.aac_bytes([[z]] * 2, rate_index=4)
        hdr = a.parse_adts_header(data, 0)
        assert hdr["rate"] == 44100
        assert hdr["channel_config"] == 1
        assert hdr["profile"] == 1
        nxt = a.parse_adts_header(data, hdr["frame_length"])
        assert nxt is not None
        assert hdr["frame_length"] + nxt["frame_length"] == len(data)

    def test_garbage_prefix_skipped(self):
        z = np.zeros(1024, dtype=np.int64)
        data = b"\x00\x13garbage" + a.aac_bytes([[z]])
        pcm, rate = a.decode_aac(data)
        assert pcm.shape == (1024, 1)

    def test_no_frames_raises(self):
        with pytest.raises(a.AacError):
            a.decode_aac(b"not audio at all")

    def test_unshipped_rate_raises(self):
        z = np.zeros(1024, dtype=np.int64)
        data = a.aac_bytes([[z]], rate_index=0)   # 96 kHz
        with pytest.raises(a.AacError):
            a.decode_aac(data)


class TestSilence:
    @pytest.mark.parametrize("cb", [0, 1, 2, 3, 5, 7, 9, 11])
    def test_zero_spectra_decode_to_exact_zero(self, cb):
        z = np.zeros(1024, dtype=np.int64)
        data = a.aac_bytes([[z]] * 3, codebook=cb, global_gain=140)
        pcm, rate = a.decode_aac(data)
        assert rate == 44100
        assert pcm.shape == (3072, 1)
        assert not pcm.any()

    def test_zero_stereo_all_window_sequences(self):
        for seq in (a.ONLY_LONG, a.LONG_START, a.LONG_STOP):
            z = np.zeros(1024, dtype=np.int64)
            data = a.aac_bytes([[z, z]] * 2, window_sequence=seq,
                               codebook=1)
            pcm, _ = a.decode_aac(data)
            assert pcm.shape == (2048, 2)
            assert not pcm.any()
        gl = a._decode_grouping(0)
        qs = [np.zeros(g * 128, dtype=np.int64) for g in gl]
        data = a.aac_bytes([[qs, qs]], window_sequence=a.EIGHT_SHORT,
                           grouping=0, max_sfb=10, codebook=1)
        pcm, _ = a.decode_aac(data)
        assert pcm.shape == (1024, 2)
        assert not pcm.any()


class TestDirectMath:
    def test_long_frame_matches_plain_loop(self):
        rng = np.random.RandomState(7)
        q = np.zeros(1024, dtype=np.int64)
        q[:a.SWB_LONG[40]] = rng.randint(-1, 2, a.SWB_LONG[40])
        data = a.aac_bytes([[q]], codebook=1, global_gain=130)
        pcm, _ = a.decode_aac(data)
        exp = _clip16(_ref_pcm_long(q, gg=130)[:1024])
        assert np.array_equal(pcm[:, 0], exp)
        assert np.abs(exp).max() > 0

    def test_overlap_add_across_frames(self):
        rng = np.random.RandomState(11)
        q1 = np.zeros(1024, dtype=np.int64)
        q2 = np.zeros(1024, dtype=np.int64)
        q1[:200] = rng.randint(-1, 2, 200)
        q2[:200] = rng.randint(-1, 2, 200)
        data = a.aac_bytes([[q1], [q2]], codebook=1, global_gain=120)
        pcm, _ = a.decode_aac(data)
        z1 = _ref_pcm_long(q1, gg=120)
        z2 = _ref_pcm_long(q2, gg=120)
        exp = np.concatenate([z1[:1024], z1[1024:] + z2[:1024]])
        assert np.array_equal(pcm[:, 0], _clip16(exp))

    def test_kbd_window_shape(self):
        rng = np.random.RandomState(13)
        q = np.zeros(1024, dtype=np.int64)
        q[:100] = rng.randint(-1, 2, 100)
        data = a.aac_bytes([[q]], codebook=1, global_gain=125,
                           window_shape=1)
        pcm, _ = a.decode_aac(data)
        # frame 1 left half uses the DEFAULT previous shape (sine),
        # right half (not emitted in frame 1) uses KBD
        exp = _clip16(_ref_pcm_long(q, gg=125, shape_left=0,
                                    shape_right=1)[:1024])
        assert np.array_equal(pcm[:, 0], exp)

    def test_window_shape_carries_to_next_frame(self):
        rng = np.random.RandomState(17)
        q = np.zeros(1024, dtype=np.int64)
        q[:100] = rng.randint(-1, 2, 100)
        data = a.aac_bytes([[q], [q]], codebook=1, global_gain=125,
                           window_shape=1)
        pcm, _ = a.decode_aac(data)
        z1 = _ref_pcm_long(q, gg=125, shape_left=0, shape_right=1)
        z2 = _ref_pcm_long(q, gg=125, shape_left=1, shape_right=1)
        exp = _clip16(z1[1024:] + z2[:1024])
        assert np.array_equal(pcm[1024:, 0], exp)

    def test_start_and_stop_sequences(self):
        rng = np.random.RandomState(19)
        q = np.zeros(1024, dtype=np.int64)
        q[:100] = rng.randint(-1, 2, 100)
        for seq in (a.LONG_START, a.LONG_STOP):
            data = a.aac_bytes([[q]], codebook=1, global_gain=125,
                               window_sequence=seq)
            pcm, _ = a.decode_aac(data)
            exp = _clip16(_ref_pcm_long(q, gg=125, seq=seq)[:1024])
            assert np.array_equal(pcm[:, 0], exp)

    def test_eight_short_deinterleave(self):
        # distinct spectra per window (band 0 amplitude = window
        # index) — catches grouped-layout deinterleave mistakes
        grouping = 0b1110111                       # groups [4, 4]
        gl = a._decode_grouping(grouping)
        qs = []
        w_base = 0
        for g_len in gl:
            arr = np.zeros(g_len * 128, dtype=np.int64)
            for w in range(g_len):
                arr[w * 4] = w_base + w + 1        # band 0, window w
            qs.append(arr)
            w_base += g_len
        data = a.aac_bytes([[qs]], window_sequence=a.EIGHT_SHORT,
                           grouping=grouping, max_sfb=10,
                           codebook=9, global_gain=100)
        pcm, _ = a.decode_aac(data)

        buf = np.zeros(2048)
        n_pts, n0 = 256, (128 + 1) / 2.0
        n = np.arange(n_pts)
        sw = np.sin(math.pi / 256 * (n + 0.5))
        for w in range(8):
            spec = np.zeros(128)
            spec[0] = (w + 1) ** (4.0 / 3.0)
            z = (2.0 / n_pts) * np.cos(
                2 * math.pi / n_pts
                * np.outer(n + n0, np.arange(128) + 0.5)) @ spec
            z *= np.concatenate([sw[:128], sw[128:]])
            buf[448 + 128 * w: 448 + 128 * w + 256] += z
        assert np.array_equal(pcm[:, 0], _clip16(buf[:1024]))

    def test_scalefactor_bands_apply_per_band(self):
        # two bands, different scalefactors, exact 2^(Δ/4) ratio
        q = np.zeros(1024, dtype=np.int64)
        q[0] = 1                                   # band 0
        q[4] = 1                                   # band 1
        sfs = [[104, 112] + [100] * 38]
        data = a.aac_bytes([[q]], codebook=1, max_sfb=40,
                           global_gain=100, scalefactors=sfs)
        pcm, _ = a.decode_aac(data)
        x = np.zeros(1024)
        x[0] = 2.0 ** (0.25 * 4)
        x[4] = 2.0 ** (0.25 * 12)
        z = _ref_pcm_long(np.zeros(1024, dtype=np.int64))
        # rebuild via module filterbank on the expected spectrum
        out, _tail = a.filterbank(x[None, :], a.ONLY_LONG, 0, 0,
                                  np.zeros(1024))
        assert np.array_equal(pcm[:, 0], _clip16(out))
        del z


class TestEscapes:
    def test_cb11_escape_magnitudes_roundtrip(self):
        q = np.zeros(1024, dtype=np.int64)
        q[0], q[1], q[2], q[3] = 345, -1234, 17, -16
        data = a.aac_bytes([[q]], codebook=11, max_sfb=2,
                           global_gain=100)
        pcm, _ = a.decode_aac(data)
        exp = np.zeros(1024, dtype=np.int64)
        exp[:8] = q[:8]
        ref = _clip16(_ref_pcm_long(exp)[:1024])
        assert np.array_equal(pcm[:, 0], ref)

    def test_cb11_non_escape_values(self):
        q = np.zeros(1024, dtype=np.int64)
        q[:8] = [15, -15, 1, 0, 7, -3, 0, 2]
        data = a.aac_bytes([[q]], codebook=11, max_sfb=2,
                           global_gain=100)
        pcm, _ = a.decode_aac(data)
        assert np.array_equal(
            pcm[:, 0], _clip16(_ref_pcm_long(q)[:1024]))

    def test_lav_overflow_rejected_at_encode(self):
        q = np.zeros(1024, dtype=np.int64)
        q[0] = 2
        with pytest.raises(a.AacError):
            a.aac_bytes([[q]], codebook=1)


class TestStereo:
    def test_ms_full_mask(self):
        m = np.zeros(1024, dtype=np.int64)
        s = np.zeros(1024, dtype=np.int64)
        m[4] = 1
        s[8] = -1
        data = a.aac_bytes([[m, s]], codebook=1, ms_mask_present=2)
        pcm, _ = a.decode_aac(data)
        assert np.array_equal(
            pcm[:1024, 0], _clip16(_ref_pcm_long(m + s)[:1024]))
        assert np.array_equal(
            pcm[:1024, 1], _clip16(_ref_pcm_long(m - s)[:1024]))

    def test_ms_per_band_mask(self):
        le = np.zeros(1024, dtype=np.int64)
        ri = np.zeros(1024, dtype=np.int64)
        le[0] = 1                                  # band 0: M/S on
        le[4] = 1                                  # band 1: off
        ri[0] = 1
        ri[4] = 1
        mask = [[1, 0] + [0] * 38]
        data = a.aac_bytes([[le, ri]], codebook=1, max_sfb=40,
                           ms_mask_present=1, ms_used=mask)
        pcm, _ = a.decode_aac(data)
        # M/S operates on DEQUANTIZED spectra: 1^(4/3) ± 1^(4/3)
        el = np.zeros(1024)
        er = np.zeros(1024)
        el[0], el[4] = 2.0, 1.0                    # m+s, untouched l
        er[0], er[4] = 0.0, 1.0                    # m−s, untouched r
        outl, _ = a.filterbank(el[None, :], a.ONLY_LONG, 0, 0,
                               np.zeros(1024))
        outr, _ = a.filterbank(er[None, :], a.ONLY_LONG, 0, 0,
                               np.zeros(1024))
        assert np.array_equal(pcm[:, 0], _clip16(outl))
        assert np.array_equal(pcm[:, 1], _clip16(outr))

    def test_independent_channels_no_ms(self):
        le = np.zeros(1024, dtype=np.int64)
        ri = np.zeros(1024, dtype=np.int64)
        le[0] = 1
        ri[8] = -1
        data = a.aac_bytes([[le, ri]], codebook=1, ms_mask_present=0)
        pcm, _ = a.decode_aac(data)
        assert np.array_equal(
            pcm[:, 0], _clip16(_ref_pcm_long(le)[:1024]))
        assert np.array_equal(
            pcm[:, 1], _clip16(_ref_pcm_long(ri)[:1024]))


def _mk_ics(max_sfb: int, sect, sfs) -> "a._Ics":
    ics = a._Ics()
    ics.window_sequence = a.ONLY_LONG
    ics.window_shape = 0
    ics.max_sfb = max_sfb
    ics.group_lens = [1]
    ics.n_windows = 1
    ics.swb = a.SWB_LONG
    ics.n_swb = len(a.SWB_LONG) - 1
    ics.sect = [sect]
    ics.sfs = [sfs]
    return ics


class TestIntensityAndTns:
    def test_intensity_scales_from_left_channel(self):
        left = _mk_ics(2, [(1, 0, 2)], [100, 100])
        # right: band 0 in-phase intensity at position 8, band 1
        # out-of-phase at position −4
        right = _mk_ics(2, [(a.INTENSITY_HCB, 0, 1),
                            (a.INTENSITY_HCB2, 1, 2)], [8, -4])
        lspec = [np.zeros(1024)]
        rspec = [np.zeros(1024)]
        lspec[0][0] = 3.0                          # band 0
        lspec[0][4] = 5.0                          # band 1
        a._ms_and_intensity(left, right, lspec, rspec, 0, [])
        assert rspec[0][0] == pytest.approx(3.0 * 2.0 ** (-2.0))
        assert rspec[0][4] == pytest.approx(-5.0 * 2.0 ** (1.0))
        # ms_mask flips the intensity sign on flagged bands
        rspec2 = [np.zeros(1024)]
        a._ms_and_intensity(left, right, lspec, rspec2, 1,
                            [[1, 0]])
        assert rspec2[0][0] == pytest.approx(-3.0 * 2.0 ** (-2.0))
        assert rspec2[0][4] == pytest.approx(-5.0 * 2.0 ** (1.0))

    def test_tns_lpc_order_one_all_pole(self):
        # one filter over bands [0, 2): spec regions count DOWN from
        # n_swb, so length = n_swb (49) reaches bottom=0 and max_sfb=2
        # clamps the top to swb[2] = 8
        ics = _mk_ics(2, [(1, 0, 2)], [100, 100])
        coef_res, compress = 1, 0
        coefs = [1]                                # small positive
        ics.tns = [[(49, 1, 0, compress, coef_res, coefs)]]
        lpc = a._tns_lpc(coefs, coef_res, compress)
        assert lpc[0] == 1.0 and len(lpc) == 2
        c = lpc[1]
        x = np.zeros(1024)
        x[:8] = [1.0, 2.0, -1.0, 0.5, 0.0, 3.0, -2.0, 1.0]
        spec = [x.copy()]
        a._apply_tns(ics, spec)
        # independent plain loop: y[i] = x[i] − c·y[i−1]
        y = np.zeros(8)
        prev = 0.0
        for i in range(8):
            y[i] = x[i] - c * prev
            prev = y[i]
        assert np.allclose(spec[0][:8], y)
        assert not spec[0][8:].any()

    def test_tns_parse_roundtrip_through_encoder(self):
        q = np.zeros(1024, dtype=np.int64)
        q[:4] = [1, -1, 0, 1]
        # length counts down from n_swb=49; max_sfb=2 clamps the
        # filtered region to [0, swb[2]) = [0, 8)
        filters = [[(49, 1, 0, 0, 1, [1])]]
        data = a.aac_bytes([[q]], codebook=1, max_sfb=2,
                           global_gain=100, tns_filters=filters)
        pcm, _ = a.decode_aac(data)
        # expected: dequant, TNS all-pole over bands 0-1, filterbank
        x = np.sign(q[:1024]).astype(float) * \
            np.abs(q[:1024]) ** (4.0 / 3.0)
        c = a._tns_lpc([1], 1, 0)[1]
        y = x.copy()
        prev = 0.0
        for i in range(8):
            y[i] = x[i] - c * prev
            prev = y[i]
        out, _t = a.filterbank(y[None, :], a.ONLY_LONG, 0, 0,
                               np.zeros(1024))
        assert np.array_equal(pcm[:, 0], _clip16(out))


class TestPipeline:
    def test_audio_pcm_stats_routes_aac(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        from tika_spark.analysis.pcm import audio_pcm_stats

        @pandas_udf(BinaryType())
        def wrap(ids: pd.Series) -> pd.Series:
            from tika_spark.analysis.aaccodec import aac_bytes
            out = []
            for i in ids:
                i = int(i)
                z = np.zeros(1024, dtype=np.int64)
                nch = 1 + i % 2
                out.append(aac_bytes(
                    [[z] * nch] * (1 + i % 3),
                    codebook=1 + i % 4,
                    global_gain=100 + i))
            return pd.Series(out)

        df = (spark.range(6).select(
            F.col("id"),
            wrap(F.col("id")).alias("payload"),
            F.lit("audio/x-aac").alias("media_type")))
        rows = {r["id"]: r for r in
                audio_pcm_stats(df).collect()}
        for i in range(6):
            assert rows[i]["status"] == "ok"
            assert rows[i]["n_channels"] == 1 + i % 2
            assert rows[i]["sample_rate"] == 44100
            assert rows[i]["n_samples"] == (1 + i % 3) * 1024
            assert rows[i]["rms_micro"] == 0
            assert rows[i]["peak_micro"] == 0

    def test_extract_metadata_routes_adts(self, spark):
        # full pipeline: magic sniff → "media" route → ADTS metadata
        from tika_spark import extract
        z = np.zeros(1024, dtype=np.int64)
        payload = a.aac_bytes([[z, z]] * 3, codebook=2,
                              global_gain=77)
        pages = spark.createDataFrame(
            [("http://a.example/clip.aac", payload)],
            "url string, html binary").repartition(2)
        row = extract(pages, mode="metadata").collect()[0]
        assert row["status"] == "ok"
        md = dict(row["metadata"])
        assert md["Content-Type"] == ["audio/x-aac"]
        assert md["samplerate"] == ["44100"]
        assert md["channels"] == ["2"]
        assert md["xmpDM:duration"] == [f"{3 * 1024 / 44100:.2f}"]

    def test_corrupt_payload_is_status_row(self, spark):
        from pyspark.sql import functions as F

        from tika_spark.analysis.pcm import audio_pcm_stats

        df = spark.range(1).select(
            F.col("id"), F.lit(b"\xff\xf1 truncated").alias("payload"),
            F.lit("audio/x-aac").alias("media_type"))
        row = audio_pcm_stats(df).collect()[0]
        assert row["status"] == "error"

    def test_adts_metadata(self):
        from tika_spark.media import extract_media
        z = np.zeros(1024, dtype=np.int64)
        data = a.aac_bytes([[z, z]] * 4)
        out = extract_media(data, mime="audio/x-aac")
        md = out["metadata"]
        assert md["samplerate"] == ["44100"]
        assert md["channels"] == ["2"]
        assert md["xmpDM:duration"] == [f"{4 * 1024 / 44100:.2f}"]

    def test_magic_detects_adts(self):
        from tika_spark.mime.detector import detect
        z = np.zeros(1024, dtype=np.int64)
        data = a.aac_bytes([[z]])
        assert detect(data) == "audio/x-aac"
