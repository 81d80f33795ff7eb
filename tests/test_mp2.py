"""From-scratch MP2 Layer II codec (tika_spark/analysis/mp2codec.py).

The production decoder is verified against an INDEPENDENT plain-loop
implementation of the Layer II math (allocation walk → scalefactor
parts → grouped/ungrouped dequantization → polyphase synthesis)
written directly from the ISO/IEC 11172-3 Annex B formulas with
math.cos loops — no shared numpy basis matrices — plus closed-form
silent streams and layer-sniff routing.
"""

import math

import numpy as np
import pytest

from tika_spark.analysis import mp2codec as m
from tika_spark.analysis import mp3codec as m3
from tika_spark.analysis.mp3codec import Mp3Error

# ------------------------------------------------- direct-math ref


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
        d = m3.SYNTH_WINDOW
        return [sum(u[j + 32 * i] * d[j + 32 * i] for i in range(16))
                for j in range(32)]


def _ref_dequant(code, nlevels):
    """Annex B Table B.4, written independently: s'' = C(s''' + D)."""
    if nlevels == 5:
        c, d, div = 8.0 / 5.0, 0.5, 4
    elif nlevels == 9:
        c, d, div = 16.0 / 9.0, 0.5, 8
    else:
        k = int(math.log2(nlevels + 1))
        c, d, div = 2.0 ** k / (2.0 ** k - 1), 2.0 ** (1 - k), \
            2 ** (k - 1)
    return c * (code / div - 1.0 + d)


def _ref_quant(x, nlevels):
    if nlevels == 5:
        c, d, div = 8.0 / 5.0, 0.5, 4
    elif nlevels == 9:
        c, d, div = 16.0 / 9.0, 0.5, 8
    else:
        k = int(math.log2(nlevels + 1))
        c, d, div = 2.0 ** k / (2.0 ** k - 1), 2.0 ** (1 - k), \
            2 ** (k - 1)
    return max(0, min(nlevels - 1, round((x / c - d + 1.0) * div)))


def _ref_decode(frames, allocation, sf_idx=(0, 0, 0), nch=1):
    """Plain-loop Layer II reconstruction: quantize targets with
    _ref_quant, dequantize, scale per frame third, synthesize."""
    synth = [_RefSynth() for _ in range(nch)]
    out = []
    for fr in frames:
        a = np.asarray(fr, dtype=float)
        if a.ndim == 2:
            a = a[:, :, None]
        pcm = [[] for _ in range(nch)]
        for t in range(36):
            sfv = m.SCALEFACTORS[sf_idx[(t // 3) // 4]]
            for ch in range(nch):
                s = [0.0] * 32
                for sb, nlev in allocation.items():
                    code = _ref_quant(a[t, sb, ch] / sfv, nlev)
                    s[sb] = _ref_dequant(code, nlev) * sfv
                pcm[ch].extend(synth[ch].step(s))
        blk = np.array(pcm).T
        out.append(blk)
    x = np.concatenate(out, axis=0)
    return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(
        np.int16)


Z36 = lambda nch=1: np.zeros((36, 32) if nch == 1            # noqa
                             else (36, 32, nch))


# --------------------------------------------------------- tests


class TestTables:
    def test_table_shapes(self):
        assert len(m.TABLE_A) == 27
        assert len(m.TABLE_B) == 30
        assert len(m.TABLE_C) == 8
        assert len(m.TABLE_D) == 12

    def test_selection(self):
        # 48 kHz never uses the 30-subband table
        assert m.alloc_table(48000, 192, 2) is m.TABLE_A
        assert m.alloc_table(48000, 384, 2) is m.TABLE_A
        assert m.alloc_table(48000, 48, 1) is m.TABLE_C
        # 44.1/32 kHz: 56-80 kbps/ch → A, >=96 → B, low → C/D
        assert m.alloc_table(44100, 64, 1) is m.TABLE_A
        assert m.alloc_table(44100, 160, 2) is m.TABLE_A
        assert m.alloc_table(44100, 192, 1) is m.TABLE_B
        assert m.alloc_table(44100, 256, 2) is m.TABLE_B
        assert m.alloc_table(44100, 48, 1) is m.TABLE_C
        assert m.alloc_table(32000, 48, 1) is m.TABLE_D
        assert m.alloc_table(32000, 224, 2) is m.TABLE_B

    def test_quant_classes(self):
        grouped, bits, c, d = m._quant_class(3)
        assert (grouped, bits) == (True, 5)
        assert c == pytest.approx(4.0 / 3.0) and d == 0.5
        grouped, bits, c, d = m._quant_class(5)
        assert (grouped, bits) == (True, 7)
        assert c == pytest.approx(8.0 / 5.0) and d == 0.5
        grouped, bits, c, d = m._quant_class(9)
        assert (grouped, bits) == (True, 10)
        assert c == pytest.approx(16.0 / 9.0) and d == 0.5
        grouped, bits, c, d = m._quant_class(7)
        assert (grouped, bits) == (False, 3)
        assert c == pytest.approx(8.0 / 7.0) and d == 0.25
        grouped, bits, c, d = m._quant_class(65535)
        assert (grouped, bits) == (False, 16)
        assert c == pytest.approx(65536.0 / 65535.0)

    def test_dequant_symmetry(self):
        for nlev in (3, 5, 7, 9, 15, 63, 65535):
            _, _, c, d = m._quant_class(nlev)
            vals = [m._dequant_digit(i, nlev, c, d)
                    for i in range(nlev)]
            mid = vals[(nlev - 1) // 2]
            assert mid == pytest.approx(0.0, abs=1e-12)
            assert vals[0] == pytest.approx(-vals[-1])


class TestBitstream:
    def test_header_fields(self):
        raw = m.mp2_bytes([Z36()], rate=48000, mode="mono",
                          bitrate=192)
        hdr = m.parse_frame_header(raw, 0)
        assert hdr["bitrate"] == 192
        assert hdr["samplerate"] == 48000
        assert hdr["mode"] == "mono" and hdr["nch"] == 1
        assert hdr["frame_bytes"] == 144 * 192000 // 48000
        assert len(raw) == hdr["frame_bytes"]

    def test_layer3_header_rejected(self):
        z = np.zeros(576, dtype=np.int64)
        raw3 = m3.mp3_bytes([[[z], [z]]], mode="mono", bitrate=64)
        assert m.parse_frame_header(raw3, 0) is None
        assert m3.parse_frame_header(raw3, 0) is not None

    def test_bad_allocation_rejected(self):
        with pytest.raises(ValueError, match="not selectable"):
            m.mp2_bytes([Z36()], allocation={26: 7})   # nbal-2 row

    def test_garbage_raises(self):
        with pytest.raises(Mp3Error):
            m.decode_mp2(b"\x00" * 4096)


class TestSilence:
    @pytest.mark.parametrize("mode,nch", [("mono", 1), ("stereo", 2)])
    @pytest.mark.parametrize("scfsi", [0, 1, 2, 3])
    def test_silent_exact_zero(self, mode, nch, scfsi):
        raw = m.mp2_bytes([Z36(nch)] * 3, rate=48000, mode=mode,
                          bitrate=384, scfsi=scfsi,
                          scalefactor_idx=20)
        pcm, rate = m.decode_mp2(raw)
        assert rate == 48000
        assert pcm.shape == (3 * 1152, nch)
        assert not pcm.any()

    def test_low_rate_table_c(self):
        raw = m.mp2_bytes([Z36()], rate=44100, mode="mono",
                          bitrate=48)
        pcm, rate = m.decode_mp2(raw)
        assert rate == 44100 and pcm.shape == (1152, 1)
        assert not pcm.any()

    def test_id3v2_prefix_skipped(self):
        raw = m.mp2_bytes([Z36()], bitrate=192)
        tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\xff" * 10
        pcm, rate = m.decode_mp2(tag + raw)
        assert pcm.shape == (1152, 1)


class TestAgainstReference:
    def test_grouped_and_ungrouped_match_reference(self):
        rng = np.random.RandomState(7)
        alloc = {0: 65535, 1: 7, 4: 3, 6: 5, 12: 9, 24: 3}
        fr = np.zeros((36, 32))
        for sb in alloc:
            fr[:, sb] = rng.uniform(-0.9, 0.9, 36)
        raw = m.mp2_bytes([fr], rate=48000, mode="mono",
                          bitrate=384, allocation=alloc)
        pcm, _ = m.decode_mp2(raw)
        ref = _ref_decode([fr], alloc)
        assert np.abs(pcm.astype(int) - ref.astype(int)).max() <= 1

    def test_stereo_matches_reference(self):
        rng = np.random.RandomState(11)
        alloc = {2: 15, 9: 9}
        fr = np.zeros((36, 32, 2))
        for sb in alloc:
            fr[:, sb, :] = rng.uniform(-0.8, 0.8, (36, 2))
        raw = m.mp2_bytes([fr], rate=48000, mode="stereo",
                          bitrate=384, allocation=alloc)
        pcm, _ = m.decode_mp2(raw)
        ref = _ref_decode([fr], alloc, nch=2)
        assert pcm.shape == ref.shape == (1152, 2)
        assert np.abs(pcm.astype(int) - ref.astype(int)).max() <= 1

    def test_scalefactor_parts_match_reference(self):
        alloc = {3: 7}
        fr = np.zeros((36, 32))
        fr[:12, 3] = 0.5        # part 0 (granules 0-3)
        fr[12:24, 3] = -0.25    # part 1
        fr[24:, 3] = 0.125      # part 2
        sf_idx = (0, 3, 6)      # factors 2.0, 1.0, 0.5
        raw = m.mp2_bytes([fr], bitrate=192, allocation=alloc,
                          scalefactor_idx=sf_idx, scfsi=0)
        pcm, _ = m.decode_mp2(raw)
        ref = _ref_decode([fr], alloc, sf_idx=sf_idx)
        assert np.abs(pcm.astype(int) - ref.astype(int)).max() <= 1
        assert np.abs(pcm).max() > 0     # actually nonzero audio

    @pytest.mark.parametrize("scfsi,sf_idx", [
        (1, (9, 9, 15)), (2, (12, 12, 12)), (3, (6, 18, 18))])
    def test_scfsi_sharing_matches_reference(self, scfsi, sf_idx):
        alloc = {5: 9}
        fr = np.zeros((36, 32))
        fr[:, 5] = np.linspace(-0.7, 0.7, 36)
        raw = m.mp2_bytes([fr], bitrate=192, allocation=alloc,
                          scalefactor_idx=sf_idx, scfsi=scfsi)
        pcm, _ = m.decode_mp2(raw)
        ref = _ref_decode([fr], alloc, sf_idx=sf_idx)
        assert np.abs(pcm.astype(int) - ref.astype(int)).max() <= 1

    def test_scfsi_conflict_rejected(self):
        with pytest.raises(ValueError, match="conflict"):
            m.mp2_bytes([Z36()], scalefactor_idx=(1, 2, 3), scfsi=2)

    def test_filterbank_continuity_across_frames(self):
        """Synthesis history must carry across frames: decoding two
        frames together differs from restarting at frame 2."""
        alloc = {0: 65535}
        fr = np.zeros((36, 32))
        fr[:, 0] = 0.5
        raw2 = m.mp2_bytes([fr, fr], bitrate=192, allocation=alloc)
        raw1 = m.mp2_bytes([fr], bitrate=192, allocation=alloc)
        both, _ = m.decode_mp2(raw2)
        one, _ = m.decode_mp2(raw1)
        assert np.array_equal(both[:1152], one)
        assert not np.array_equal(both[1152:], one)
        ref = _ref_decode([fr, fr], alloc)
        assert np.abs(both.astype(int) - ref.astype(int)).max() <= 1


def _ref_decode_l1(frames, allocation, sf_idx=0, nch=1):
    """Plain-loop Layer I reconstruction: one scalefactor per frame,
    one sample per granule, ungrouped 2^nb - 1 quantizers (the same
    Annex B affine form, so _ref_quant/_ref_dequant apply)."""
    synth = [_RefSynth() for _ in range(nch)]
    sfv = m.SCALEFACTORS[sf_idx]
    out = []
    for fr in frames:
        a = np.asarray(fr, dtype=float)
        if a.ndim == 2:
            a = a[:, :, None]
        pcm = [[] for _ in range(nch)]
        for t in range(12):
            for ch in range(nch):
                s = [0.0] * 32
                for sb, code in allocation.items():
                    nlev = (1 << (code + 1)) - 1
                    q = _ref_quant(a[t, sb, ch] / sfv, nlev)
                    s[sb] = _ref_dequant(q, nlev) * sfv
                pcm[ch].extend(synth[ch].step(s))
        out.append(np.array(pcm).T)
    x = np.concatenate(out, axis=0)
    return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(
        np.int16)


Z12 = lambda nch=1: np.zeros((12, 32) if nch == 1            # noqa
                             else (12, 32, nch))


class TestLayerI:
    def test_header_fields(self):
        raw = m.mp1_bytes([Z12()], rate=32000, mode="mono",
                          bitrate=288)
        hdr = m.parse_frame_header_l1(raw, 0)
        assert hdr["bitrate"] == 288 and hdr["samplerate"] == 32000
        assert hdr["mode"] == "mono" and hdr["nch"] == 1
        assert hdr["frame_bytes"] == 12 * 288000 // 32000 * 4
        assert len(raw) == hdr["frame_bytes"]
        # a Layer II header is not a Layer I header and vice versa
        raw2 = m.mp2_bytes([Z36()], bitrate=192)
        assert m.parse_frame_header_l1(raw2, 0) is None
        assert m.parse_frame_header(raw, 0) is None

    @pytest.mark.parametrize("mode,nch", [("mono", 1), ("stereo", 2)])
    def test_silent_exact_zero(self, mode, nch):
        raw = m.mp1_bytes([Z12(nch)] * 3, rate=44100, mode=mode,
                          bitrate=448, scalefactor_idx=20)
        pcm, rate = m.decode_mp1(raw)
        assert rate == 44100
        assert pcm.shape == (3 * 384, nch)
        assert not pcm.any()

    def test_matches_reference(self):
        rng = np.random.RandomState(3)
        alloc = {0: 14, 1: 2, 7: 1, 15: 5, 31: 8}
        fr = np.zeros((12, 32))
        for sb in alloc:
            fr[:, sb] = rng.uniform(-0.9, 0.9, 12)
        raw = m.mp1_bytes([fr], rate=44100, mode="mono",
                          bitrate=448, allocation=alloc,
                          scalefactor_idx=4)
        pcm, _ = m.decode_mp1(raw)
        ref = _ref_decode_l1([fr], alloc, sf_idx=4)
        assert pcm.shape == ref.shape == (384, 1)
        assert np.abs(pcm.astype(int) - ref.astype(int)).max() <= 1
        assert np.abs(pcm).max() > 0

    def test_stereo_continuity_across_frames(self):
        alloc = {0: 10}
        fr = np.zeros((12, 32, 2))
        fr[:, 0, 0] = 0.5
        fr[:, 0, 1] = -0.25
        raw2 = m.mp1_bytes([fr, fr], mode="stereo", bitrate=448,
                           allocation=alloc)
        raw1 = m.mp1_bytes([fr], mode="stereo", bitrate=448,
                           allocation=alloc)
        both, _ = m.decode_mp1(raw2)
        one, _ = m.decode_mp1(raw1)
        assert np.array_equal(both[:384], one)
        assert not np.array_equal(both[384:], one)
        ref = _ref_decode_l1([fr, fr], alloc, nch=2)
        assert np.abs(both.astype(int) - ref.astype(int)).max() <= 1

    def test_bad_allocation_rejected(self):
        with pytest.raises(ValueError, match="1..14"):
            m.mp1_bytes([Z12()], allocation={0: 15})

    def test_garbage_raises(self):
        with pytest.raises(Mp3Error):
            m.decode_mp1(b"\x00" * 4096)


class TestRouting:
    def test_sniff_layer(self):
        raw2 = m.mp2_bytes([Z36()], bitrate=192)
        z = np.zeros(576, dtype=np.int64)
        raw3 = m3.mp3_bytes([[[z], [z]]], mode="mono", bitrate=64)
        assert m.sniff_layer(raw2) == 2
        assert m.sniff_layer(raw3) == 3
        assert m.sniff_layer(b"\x00" * 64) == 0
        tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
        assert m.sniff_layer(tag + raw2) == 2

    def test_decode_mpeg_audio_routes_all_layers(self):
        raw1 = m.mp1_bytes([Z12()], bitrate=192, rate=32000)
        pcm, rate = m.decode_mpeg_audio(raw1)
        assert rate == 32000 and pcm.shape == (384, 1)
        raw2 = m.mp2_bytes([Z36()], bitrate=192, rate=48000)
        pcm, rate = m.decode_mpeg_audio(raw2)
        assert rate == 48000 and pcm.shape == (1152, 1)
        z = np.zeros(576, dtype=np.int64)
        raw3 = m3.mp3_bytes([[[z], [z]]], mode="mono", bitrate=64)
        pcm, rate = m.decode_mpeg_audio(raw3)
        assert rate == 44100 and pcm.shape[0] == 1152
        assert m.sniff_layer(raw1) == 1
