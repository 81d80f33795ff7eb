"""FLAC decode (analysis/flac.py): subframe types, stereo
decorrelation, Rice residuals, and the STREAMINFO-MD5 self-oracle."""

import numpy as np
import pytest

from tika_spark.analysis.flac import decode_flac, flac_bytes


def test_verbatim_roundtrip_mono_stereo_multiframe():
    rng = np.random.RandomState(3)
    for shape in ((500,), (9000,), (600, 2)):
        a = rng.randint(-32768, 32768, size=shape).astype(np.int16)
        dec, rate = decode_flac(flac_bytes(a, 44100, mode="verbatim"))
        want = a[:, None] if a.ndim == 1 else a
        assert rate == 44100
        assert np.array_equal(dec, want)


def test_constant_subframe():
    c = np.full(1000, -1234, np.int16)
    dec, rate = decode_flac(flac_bytes(c, 8000, mode="constant"))
    assert rate == 8000
    assert np.array_equal(dec[:, 0], c)


def test_fixed2_rice_actually_compresses_and_roundtrips():
    t = np.arange(10000)
    smooth = (3000 * np.sin(t / 50.0)).astype(np.int16)
    blob = flac_bytes(smooth, 8000, mode="fixed2", rice_param=6)
    assert len(blob) < smooth.nbytes // 2   # real compression
    dec, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], smooth)


def test_square_wave_roundtrip():
    sq = np.tile(np.array([1001, -1001], np.int16), 400)
    dec, _ = decode_flac(flac_bytes(sq, 8000, mode="fixed2",
                                    rice_param=13))
    assert np.array_equal(dec[:, 0], sq)


def test_md5_tamper_detected():
    a = (1000 * np.sin(np.arange(100) / 9.0)).astype(np.int16)
    blob = bytearray(flac_bytes(a, 8000, mode="verbatim"))
    blob[-3] ^= 0x40
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(blob))


def test_garbage_rejected():
    for g in (b"", b"fLaC", b"fLaC" + b"\x00" * 20, b"RIFF...."):
        with pytest.raises(ValueError):
            decode_flac(g)


def test_flac_through_operator(spark):
    from tika_spark.analysis.pcm import audio_pcm_stats
    amp = 1001
    sq = np.tile(np.array([amp, -amp], np.int16), 400)
    df = spark.createDataFrame(
        [(1, flac_bytes(sq, 8000, mode="fixed2", rice_param=13),
          "audio/flac"),
         (2, b"not flac", "audio/flac")],
        "id long, payload binary, media_type string")
    out = {r["id"]: r for r in audio_pcm_stats(df).collect()}
    ok = out[1]
    assert ok["status"] == "ok" and ok["sample_rate"] == 8000
    # same closed form as the PCM16 square wave: A/32768 micro-units
    want = int(np.floor(amp * 1_000_000 / 32768 + 0.5))
    assert ok["rms_micro"] == want and ok["peak_micro"] == want
    assert ok["duration_ms"] == 100
    assert out[2]["status"] == "error"


# --------------------------------------------------- AU / AIFF PCM --

def test_au_roundtrip_and_mulaw():
    from tika_spark.analysis.pcm import (_ulaw_table, au_bytes,
                                         decode_au)
    a = np.array([100, -32768, 32767, 0], np.int16)
    dec, rate = decode_au(au_bytes(a, 16000))
    assert rate == 16000
    assert np.array_equal(dec[:, 0], a.astype(np.int32))
    # encoding 1: mu-law codes through the G.711 table
    import struct as st
    codes = bytes(range(8))
    blob = (b".snd" + st.pack(">IIIII", 24, len(codes), 1, 8000, 1)
            + codes)
    dec2, _ = decode_au(blob)
    assert np.array_equal(dec2[:, 0], _ulaw_table()[list(range(8))])


def test_aiff_roundtrip():
    from tika_spark.analysis.pcm import aiff_bytes, decode_aiff
    a = np.array([[5, -5], [700, -700], [32767, -32768]], np.int16)
    dec, rate = decode_aiff(aiff_bytes(a, 44100))
    assert rate == 44100
    assert np.array_equal(dec, a.astype(np.int32))


def test_au_aiff_reject_garbage():
    from tika_spark.analysis.pcm import decode_aiff, decode_au
    for bad in (b"", b".snd", b"FORM1234AIFX"):
        with pytest.raises(ValueError):
            decode_au(bad)
        with pytest.raises(ValueError):
            decode_aiff(bad)
