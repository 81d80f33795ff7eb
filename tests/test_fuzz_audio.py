"""Property-based robustness for the round-4 MPEG audio tier
(tika_spark/analysis/mp2codec.py + mp3codec.py).

Contract: every decoder entry point either returns a decoded
``(int16 ndarray, rate)`` or raises a clean ``ValueError``
(``Mp3Error`` included) — never any other exception type, never a
hang — so the mapInPandas stats stage can contain arbitrary crawl
bytes as status rows.
"""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tika_spark.analysis import mp2codec as m2
from tika_spark.analysis import mp3codec as m3

_SETTINGS = dict(max_examples=120, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


def _decode_or_valueerror(fn, data):
    try:
        pcm, rate = fn(data)
    except ValueError:
        return None
    assert isinstance(pcm, np.ndarray) and pcm.dtype == np.int16
    assert rate in m3.SAMPLERATES
    return pcm


@settings(**_SETTINGS)
@given(st.binary(max_size=2048))
def test_random_bytes_contained(data):
    _decode_or_valueerror(m2.decode_mpeg_audio, data)
    _decode_or_valueerror(m2.decode_mp1, data)
    _decode_or_valueerror(m2.decode_mp2, data)
    _decode_or_valueerror(m3.decode_mp3, data)


@settings(**_SETTINGS)
@given(st.binary(max_size=512))
def test_sniff_layer_total(data):
    assert m2.sniff_layer(data) in (0, 1, 2, 3)


def _genuine_streams():
    z12 = np.zeros((12, 32))
    z36 = np.zeros((36, 32))
    z576 = np.zeros(576, dtype=np.int64)
    return (
        m2.mp1_bytes([z12] * 2, bitrate=192),
        m2.mp2_bytes([z36] * 2, bitrate=192),
        m3.mp3_bytes([[[z576], [z576]]] * 2, count1_zeros=8),
    )


_STREAMS = _genuine_streams()


@settings(**_SETTINGS)
@given(st.integers(0, 2), st.data())
def test_mutated_genuine_frames_contained(which, data):
    raw = bytearray(_STREAMS[which])
    n_flips = data.draw(st.integers(1, 8))
    for _ in range(n_flips):
        i = data.draw(st.integers(0, len(raw) - 1))
        raw[i] ^= data.draw(st.integers(1, 255))
    _decode_or_valueerror(m2.decode_mpeg_audio, bytes(raw))


@settings(**_SETTINGS)
@given(st.integers(0, 2), st.data())
def test_truncated_genuine_frames_contained(which, data):
    raw = _STREAMS[which]
    cut = data.draw(st.integers(0, len(raw)))
    out = _decode_or_valueerror(m2.decode_mpeg_audio, raw[:cut])
    if out is not None and cut == len(raw):
        assert not out.any()        # the full silent stream decodes


@settings(**_SETTINGS)
@given(st.binary(min_size=10, max_size=64))
def test_id3_prefix_never_crashes(prefix):
    # an ID3 header with an arbitrary (possibly lying) size field
    data = b"ID3\x04\x00\x00" + prefix + _STREAMS[1]
    _decode_or_valueerror(m2.decode_mpeg_audio, data)
