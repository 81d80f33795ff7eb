"""From-scratch MP3 Layer III codec (tika_spark/analysis/mp3codec.py).

The production decoder is verified against an INDEPENDENT plain-loop
implementation of the post-Huffman math (requantize → alias →
IMDCT/window/overlap → frequency inversion → polyphase synthesis)
written directly from the ISO/IEC 11172-3 formulas with math.cos —
no shared numpy basis matrices — plus closed-form silent streams,
bit-reservoir splices, and MS-stereo cancellation.
"""

import math

import numpy as np
import pytest

from tika_spark.analysis import mp3codec as m

Z = lambda: np.zeros(576, dtype=np.int64)  # noqa: E731


def _granule(*pairs):
    x = Z()
    for idx, v in pairs:
        x[idx] = v
    return x


# ------------------------------------------------- direct-math ref


def _ref_requantize(xs, global_gain, sf, scalefac_scale=0, preflag=0,
                    rate=44100):
    gain = 2.0 ** ((global_gain - 210) / 4.0)
    mult = 0.5 * (scalefac_scale + 1)
    out = [0.0] * 576
    for band in range(22):
        lo, hi = m.SFB_LONG[rate][band], m.SFB_LONG[rate][band + 1]
        sfv = sf[band] if band < 21 else 0
        pre = m.PRETAB[band] if (preflag and band < 21) else 0
        fac = gain * 2.0 ** (-mult * (sfv + pre))
        for i in range(lo, hi):
            v = xs[i]
            out[i] = math.copysign(abs(v) ** (4.0 / 3.0), v) * fac \
                if v else 0.0
    return out


def _ref_alias(x):
    out = list(x)
    for sb in range(1, 32):
        base = 18 * sb
        for i in range(8):
            a, c = out[base - 1 - i], out[base + i]
            out[base - 1 - i] = a * m.ALIAS_CS[i] - c * m.ALIAS_CA[i]
            out[base + i] = c * m.ALIAS_CS[i] + a * m.ALIAS_CA[i]
    return out


def _ref_imdct_long(spec18):
    # 36-point IMDCT + normal window, ISO formulas verbatim
    x = []
    for i in range(36):
        s = sum(spec18[k] * math.cos(math.pi / 72.0
                                     * (2 * i + 1 + 18)
                                     * (2 * k + 1))
                for k in range(18))
        x.append(s * math.sin(math.pi / 36.0 * (i + 0.5)))
    return x


def _ref_imdct_short(spec18):
    z = [0.0] * 36
    for w in range(3):
        sub = spec18[w::3]
        for i in range(12):
            s = sum(sub[k] * math.cos(math.pi / 24.0
                                      * (2 * i + 1 + 6)
                                      * (2 * k + 1))
                    for k in range(6))
            z[6 + 6 * w + i] += s * math.sin(math.pi / 12.0
                                             * (i + 0.5))
    return z


class _RefSynth:
    def __init__(self):
        self.v = [[0.0] * 64 for _ in range(16)]

    def step(self, s):
        self.v.insert(0, [
            sum(math.cos((16 + i) * (2 * k + 1) * math.pi / 32.0)
                * s[k] for k in range(32)) for i in range(64)])
        self.v.pop()
        u = [0.0] * 512
        for i in range(8):
            for j in range(32):
                u[i * 64 + j] = self.v[i * 2][j]
                u[i * 64 + 32 + j] = self.v[i * 2 + 1][32 + j]
        d = m.SYNTH_WINDOW
        return [sum(u[j + 32 * i] * d[j + 32 * i] for i in range(16))
                for j in range(32)]


def _ref_decode_mono(granules, global_gain, sf=None,
                     block_type=0, scalefac_scale=0, preflag=0,
                     rate=44100):
    """granules: list of 576-int arrays (2 per frame, wire order)."""
    sf = sf if sf is not None else [0] * 21
    overlap = [[0.0] * 18 for _ in range(32)]
    synth = _RefSynth()
    out = []
    for xs in granules:
        if block_type == 2:
            # wire order [band][window][line] → reorder, no sf here
            req = []
            gain = 2.0 ** ((global_gain - 210) / 4.0)
            pos = 0
            flat = [0.0] * 576
            for band in range(13):
                lo = m.SFB_SHORT[rate][band]
                hi = m.SFB_SHORT[rate][band + 1]
                for w in range(3):
                    for line in range(hi - lo):
                        v = xs[pos]
                        flat[3 * (lo + line) + w] = (
                            math.copysign(abs(v) ** (4 / 3), v)
                            * gain if v else 0.0)
                        pos += 1
            x = flat
        else:
            x = _ref_requantize(xs, global_gain, sf,
                                scalefac_scale, preflag, rate)
            x = _ref_alias(x)
        block = []
        for sb in range(32):
            spec = x[18 * sb:18 * (sb + 1)]
            z = (_ref_imdct_short(spec) if block_type == 2
                 else _ref_imdct_long(spec))
            col = [z[i] + overlap[sb][i] for i in range(18)]
            overlap[sb] = z[18:]
            block.append(col)
        for step in range(18):
            s = []
            for sb in range(32):
                v = block[sb][step]
                if (sb % 2) and (step % 2):
                    v = -v
                s.append(v)
            out.extend(synth.step(s))
    pcm = np.clip(np.rint(np.array(out) * 32768.0), -32768, 32767)
    return pcm.astype(np.int16)


# --------------------------------------------------------- tests


class TestBitstream:
    def test_header_fields(self):
        data = m.mp3_bytes([[[Z()], [Z()]]], bitrate=160)
        h = m.parse_frame_header(data, 0)
        assert h["bitrate"] == 160 and h["samplerate"] == 44100
        assert h["mode"] == "mono" and h["nch"] == 1
        assert h["frame_bytes"] == 144 * 160000 // 44100
        assert len(data) == h["frame_bytes"]

    def test_huffman_tables_are_prefix_free(self):
        for tid, tab in {**m.HUFF_TABLES, **{100 + k: v for k, v in
                                            m.COUNT1_TABLES.items()}
                         }.items():
            codes = [format(c, f"0{ln}b") for c, ln in tab.values()]
            assert len(set(codes)) == len(codes), tid
            for a in codes:
                for b in codes:
                    if a is not b:
                        assert not b.startswith(a) or a == b, tid

    def test_garbage_raises(self):
        with pytest.raises(m.Mp3Error):
            m.decode_mp3(b"not an mp3 at all" * 10)

    def test_sfb_geometries(self):
        # every Table B.8 geometry: 22 long + 13 short intervals,
        # both spanning the full 576-line granule
        for rate in (44100, 48000, 32000):
            assert len(m.SFB_LONG[rate]) == 23
            assert len(m.SFB_SHORT[rate]) == 14
            assert m.SFB_LONG[rate][0] == 0
            assert m.SFB_LONG[rate][-1] == 576
            assert m.SFB_SHORT[rate][0] == 0
            assert m.SFB_SHORT[rate][-1] == 192
            assert list(m.SFB_LONG[rate]) == sorted(m.SFB_LONG[rate])
            assert list(m.SFB_SHORT[rate]) == sorted(
                m.SFB_SHORT[rate])

    def test_esc_table_rejected_cleanly(self):
        # a table id outside the shipped data (ESC family) must fail
        # with the documented message, not garbage output
        data = m.mp3_bytes([[[_granule((0, 1))], [Z()]]])
        m.decode_mp3(data)            # baseline decodes
        import unittest.mock as mock
        with mock.patch.dict(m._DEC_BIG, clear=False):
            del m._DEC_BIG[1]
            with pytest.raises(m.Mp3Error, match="unsupported"):
                m.decode_mp3(data)


class TestSilence:
    def test_silent_mono_exact_zero(self):
        data = m.mp3_bytes([[[Z()], [Z()]]] * 3, count1_zeros=40,
                           scalefac_compress=5,
                           scalefactors=[1] * 21)
        pcm, rate = m.decode_mp3(data)
        assert rate == 44100 and pcm.shape == (3 * 1152, 1)
        assert np.abs(pcm).max() == 0

    def test_silent_stereo_exact_zero(self):
        data = m.mp3_bytes([[[Z(), Z()], [Z(), Z()]]] * 2,
                           mode="stereo", count1_zeros=12)
        pcm, rate = m.decode_mp3(data)
        assert pcm.shape == (2 * 1152, 2)
        assert np.abs(pcm).max() == 0

    def test_id3v2_prefix_skipped(self):
        body = m.mp3_bytes([[[Z()], [Z()]]])
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 10]) + b"x" * 10
        pcm, _ = m.decode_mp3(tag + body)
        assert pcm.shape == (1152, 1)


class TestDirectMath:
    def test_long_blocks_match_reference(self):
        g0 = _granule((0, 1), (5, -2), (40, 1), (100, -1), (161, 2))
        g1 = _granule((3, 2), (77, -2))
        data = m.mp3_bytes([[[g0], [g1]]], global_gain=226)
        pcm, _ = m.decode_mp3(data)
        ref = _ref_decode_mono([g0, g1], 226)
        assert np.array_equal(pcm[:, 0], ref)
        assert np.abs(pcm).max() > 100   # genuinely nonzero audio

    def test_scalefactors_match_reference(self):
        g0 = _granule((2, 1), (30, -1), (70, 1))
        sf = [3, 1, 0, 2, 0, 1, 0, 0, 4, 0, 1,
              0, 2, 0, 1, 0, 0, 1, 0, 0, 2]
        data = m.mp3_bytes([[[g0], [Z()]]], global_gain=230,
                           scalefac_compress=10, scalefactors=sf,
                           scalefac_scale=1, preflag=1)
        pcm, _ = m.decode_mp3(data)
        ref = _ref_decode_mono([g0, Z()], 230, sf,
                               scalefac_scale=1, preflag=1)
        assert np.array_equal(pcm[:, 0], ref)

    def test_short_blocks_match_reference(self):
        g0 = Z()
        # wire order [band][window][line]: bands 0-2, varied windows
        g0[0], g0[5], g0[10], g0[14], g0[25] = 1, -1, 2, 1, -2
        data = m.mp3_bytes([[[g0], [Z()]]], global_gain=226,
                           block_type=2)
        pcm, _ = m.decode_mp3(data)
        ref = _ref_decode_mono([g0, Z()], 226, block_type=2)
        assert np.array_equal(pcm[:, 0], ref)
        assert np.abs(pcm).max() > 0

    def test_overlap_add_spans_frames(self):
        g0 = _granule((7, 2))
        frames = [[[g0], [Z()]], [[Z()], [Z()]]]
        data = m.mp3_bytes(frames, global_gain=226)
        pcm, _ = m.decode_mp3(data)
        ref = _ref_decode_mono([g0, Z(), Z(), Z()], 226)
        assert np.array_equal(pcm[:, 0], ref)
        # IMDCT tail + synthesis FIFO ring into the second frame
        assert np.abs(pcm[1152:]).max() > 0


class TestMultiRate:
    @pytest.mark.parametrize("rate", [48000, 32000])
    def test_silent_exact_zero(self, rate):
        data = m.mp3_bytes([[[Z()], [Z()]]] * 2, rate=rate,
                           count1_zeros=20)
        pcm, got_rate = m.decode_mp3(data)
        assert got_rate == rate and pcm.shape == (2 * 1152, 1)
        assert np.abs(pcm).max() == 0

    @pytest.mark.parametrize("rate", [48000, 32000])
    def test_long_blocks_match_reference(self, rate):
        # lines chosen to straddle band boundaries that DIFFER
        # between the three geometries (42/44, 384/418/448)
        g0 = _granule((0, 1), (6, -2), (43, 1), (120, -1), (161, 2))
        g1 = _granule((2, 2), (90, -2))
        data = m.mp3_bytes([[[g0], [g1]]], rate=rate,
                           global_gain=226)
        pcm, _ = m.decode_mp3(data)
        ref = _ref_decode_mono([g0, g1], 226, rate=rate)
        assert np.array_equal(pcm[:, 0], ref)
        assert np.abs(pcm).max() > 100

    @pytest.mark.parametrize("rate", [48000, 32000])
    def test_scalefactors_match_reference(self, rate):
        g0 = _granule((2, 1), (29, -1), (64, 1))
        sf = [2, 0, 1, 0, 3, 0, 0, 1, 0, 2, 0,
              1, 0, 0, 2, 0, 1, 0, 0, 1, 0]
        data = m.mp3_bytes([[[g0], [Z()]]], rate=rate,
                           global_gain=230, scalefac_compress=10,
                           scalefactors=sf, preflag=1)
        pcm, _ = m.decode_mp3(data)
        ref = _ref_decode_mono([g0, Z()], 230, sf, preflag=1,
                               rate=rate)
        assert np.array_equal(pcm[:, 0], ref)

    @pytest.mark.parametrize("rate", [48000, 32000])
    def test_short_blocks_match_reference(self, rate):
        g0 = Z()
        g0[0], g0[5], g0[10], g0[14], g0[25] = 1, -1, 2, 1, -2
        data = m.mp3_bytes([[[g0], [Z()]]], rate=rate,
                           global_gain=226, block_type=2)
        pcm, _ = m.decode_mp3(data)
        ref = _ref_decode_mono([g0, Z()], 226, block_type=2,
                               rate=rate)
        assert np.array_equal(pcm[:, 0], ref)
        assert np.abs(pcm).max() > 0

    def test_rates_produce_different_audio(self):
        # same spectra through different band geometries must
        # requantize differently once scalefactors are in play
        g0 = _granule((43, 1))       # in band 9 at 44.1k, band 10 at 48k
        sf = list(range(21))
        pcm44, _ = m.decode_mp3(m.mp3_bytes(
            [[[g0], [Z()]]], rate=44100, global_gain=226,
            scalefac_compress=15, scalefactors=sf))
        pcm48, _ = m.decode_mp3(m.mp3_bytes(
            [[[g0], [Z()]]], rate=48000, global_gain=226,
            scalefac_compress=15, scalefactors=sf))
        assert not np.array_equal(pcm44, pcm48)


class TestEscTables:
    def test_large_values_roundtrip_via_escape(self):
        # |x| in (2, 16] routes through ESC table 16 (linbits 1);
        # up to 30 through table 24 (linbits 4)
        g0 = _granule((0, 9), (1, -16), (8, 30), (9, -23), (40, 4))
        data = m.mp3_bytes([[[g0], [Z()]]], global_gain=198)
        pcm, _ = m.decode_mp3(data)
        ref = _ref_decode_mono([g0, Z()], 198)
        assert np.array_equal(pcm[:, 0], ref)
        assert np.abs(pcm).max() > 0

    def test_esc_table_selection_per_region(self):
        # the encoder picks the smallest covering table per region —
        # verify by decoding (self-consistency) and range errors
        g0 = _granule((0, 1), (40, 16))
        pcm, _ = m.decode_mp3(
            m.mp3_bytes([[[g0], [Z()]]], global_gain=200))
        ref = _ref_decode_mono([g0, Z()], 200)
        assert np.array_equal(pcm[:, 0], ref)
        with pytest.raises(ValueError, match="table range"):
            m.mp3_bytes([[[_granule((0, 31))], [Z()]]])

    def test_esc_codes_are_prefix_free(self):
        tab = m.HUFF_TABLES[16]
        assert len(tab) == 256
        codes = sorted(format(c, f"0{ln}b") for c, ln in tab.values())
        for a, b in zip(codes, codes[1:]):
            assert not b.startswith(a)


class TestScfsi:
    def test_shared_scalefactors_decode_like_explicit(self):
        g0 = _granule((2, 1), (30, -1))
        g1 = _granule((7, 2))
        sf = [2, 1, 0, 2, 0, 1, 0, 0, 3, 0, 1,
              0, 2, 0, 1, 0, 0, 1, 0, 0, 2]
        kw = dict(global_gain=228, scalefac_compress=9,
                  scalefactors=sf)
        plain = m.decode_mp3(m.mp3_bytes([[[g0], [g1]]], **kw))[0]
        shared = m.decode_mp3(m.mp3_bytes(
            [[[g0], [g1]]], scfsi=(1, 1, 1, 1), **kw))[0]
        assert np.array_equal(plain, shared)
        # partial sharing too (groups 0 and 2 only)
        part = m.decode_mp3(m.mp3_bytes(
            [[[g0], [g1]]], scfsi=(1, 0, 1, 0), **kw))[0]
        assert np.array_equal(plain, part)

    def test_scfsi_actually_shrinks_granule1(self):
        sf = [3] * 21
        kw = dict(scalefac_compress=13, scalefactors=sf,
                  count1_zeros=4)
        a = m.mp3_bytes([[[Z()], [Z()]]], **kw)
        b = m.mp3_bytes([[[Z()], [Z()]]], scfsi=(1, 1, 1, 1), **kw)
        # same frame length (padded), but part2_3_length in side info
        # differs — compare the scalefactor bit totals via side info
        assert a != b

    def test_scfsi_rejected_for_short_blocks(self):
        with pytest.raises(ValueError, match="long blocks"):
            m.mp3_bytes([[[Z()], [Z()]]], block_type=2,
                        scfsi=(1, 0, 0, 0))


class TestGainLaws:
    def _peak(self, **kw):
        g0 = _granule((12, 1))
        data = m.mp3_bytes([[[g0], [Z()]]], **kw)
        pcm, _ = m.decode_mp3(data)
        return float(np.abs(pcm).max())

    def test_global_gain_quarter_powers(self):
        p1 = self._peak(global_gain=214)
        p2 = self._peak(global_gain=222)   # +8 → ×4
        assert p2 == pytest.approx(4 * p1, rel=0.02)

    def test_scalefac_scale_doubles_step(self):
        sf = [2] * 21
        a = self._peak(global_gain=226, scalefac_compress=8,
                       scalefactors=sf, scalefac_scale=0)  # ×2^-1
        b = self._peak(global_gain=226, scalefac_compress=8,
                       scalefactors=sf, scalefac_scale=1)  # ×2^-2
        assert a == pytest.approx(2 * b, rel=0.02)

    def test_subblock_gain(self):
        g0 = Z()
        g0[0] = 2
        base = m.decode_mp3(m.mp3_bytes(
            [[[g0], [Z()]]], global_gain=218, block_type=2))[0]
        cut = m.decode_mp3(m.mp3_bytes(
            [[[g0], [Z()]]], global_gain=218, block_type=2,
            subblock_gain=(1, 1, 1)))[0]   # -8/4 → ×1/4
        assert float(np.abs(base).max()) == pytest.approx(
            4 * float(np.abs(cut).max()), rel=0.02)


class TestStereo:
    def test_lr_stereo_channels_independent(self):
        gl = _granule((4, 1))
        data = m.mp3_bytes([[[gl, Z()], [Z(), Z()]]], mode="stereo",
                           global_gain=226)
        pcm, _ = m.decode_mp3(data)
        assert pcm.shape == (1152, 2)
        assert np.abs(pcm[:, 0]).max() > 0
        assert np.abs(pcm[:, 1]).max() == 0

    def test_ms_stereo_side_zero_collapses_to_mid(self):
        mid = _granule((4, 2), (40, -1))
        data = m.mp3_bytes([[[mid, Z()], [Z(), Z()]]], mode="joint",
                           mode_ext=2, global_gain=226)
        pcm, _ = m.decode_mp3(data)
        # S = 0 → L = R = M/√2 exactly (same float ops per channel)
        assert np.array_equal(pcm[:, 0], pcm[:, 1])
        assert np.abs(pcm[:, 0]).max() > 0

    def test_ms_stereo_equal_ms_cancels_right(self):
        s = _granule((4, 2), (40, -1))
        data = m.mp3_bytes([[[s, s], [Z(), Z()]]], mode="joint",
                           mode_ext=2, global_gain=226)
        pcm, _ = m.decode_mp3(data)
        assert np.abs(pcm[:, 1]).max() == 0        # (M-S)/√2 = 0
        assert np.abs(pcm[:, 0]).max() > 0


class TestBitReservoir:
    def test_spliced_reservoir_decodes_identically(self):
        g0 = _granule((0, 1), (30, -2), (100, 1))
        g1 = _granule((9, 2))
        frames = [[[g0], [g1]], [[g1], [g0]]]
        data = bytearray(m.mp3_bytes(frames, global_gain=226))
        want, _ = m.decode_mp3(bytes(data))

        h = m.parse_frame_header(bytes(data), 0)
        flen = h["frame_bytes"]
        f2 = flen                     # frame 2 offset
        main2_start = f2 + 4 + 17     # mono side info
        k = 20                        # bytes moved into the reservoir
        # frame 1's tail is zero padding by construction
        assert bytes(data[flen - k:flen]) == b"\x00" * k
        moved = bytes(data[main2_start:main2_start + k])
        data[flen - k:flen] = moved
        rest = bytes(data[main2_start + k:f2 + flen])
        data[main2_start:f2 + flen] = rest + b"\x00" * k
        # main_data_begin: first 9 bits of frame 2's side info
        data[f2 + 4] = k >> 1
        data[f2 + 5] = ((k & 1) << 7) | (data[f2 + 5] & 0x7F)
        got, _ = m.decode_mp3(bytes(data))
        assert np.array_equal(got, want)

    def test_reservoir_underrun_raises(self):
        data = bytearray(m.mp3_bytes([[[Z()], [Z()]]]))
        data[4] = 0x80                # main_data_begin = 256 on frame 1
        with pytest.raises(m.Mp3Error, match="reservoir"):
            m.decode_mp3(bytes(data))


class TestPipeline:
    def test_audio_pcm_stats_routes_mp3(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import BinaryType

        from tika_spark.analysis.pcm import audio_pcm_stats

        @pandas_udf(BinaryType())
        def wrap(ids: pd.Series) -> pd.Series:
            out = []
            for i in ids:
                n = 1 + int(i) % 3
                out.append(m.mp3_bytes(
                    [[[Z()], [Z()]]] * n, count1_zeros=24))
            return pd.Series(out)

        df = (spark.range(6).select(
            F.col("id"), wrap(F.col("id")).alias("payload"),
            F.lit("audio/mpeg").alias("media_type")))
        got = {r.id: r for r in audio_pcm_stats(df).collect()}
        for i in range(6):
            n = 1 + i % 3
            assert got[i].status == "ok"
            assert got[i].sample_rate == 44100
            assert got[i].n_samples == n * 1152
            assert got[i].rms_micro == 0 and got[i].peak_micro == 0
