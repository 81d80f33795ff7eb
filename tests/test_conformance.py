"""Cross-implementation codec conformance (SURVEY §7.4 item 7 /
VERDICT r4 task 6): decode streams produced by an INDEPENDENT public
implementation (the zstd/brotli codecs bundled with pyarrow) with the
from-scratch decoders and require byte-exactness. Complements the
own-encoder round-trips, which cannot catch shared misreadings of the
spec. Full sweep results are ledgered in BENCH/CONFORMANCE.md."""

import random

import pyarrow as pa
import pytest

TEXT = (b"The information about the world government and public "
        b"development management of international understanding "
        b"window.location document.getElementById background-color "
        b"description of the education university performance data. ")


def _corpus(seed=11, n=60):
    rng = random.Random(seed)
    words = TEXT.split()
    out = [b"", b"a", TEXT, TEXT * 40]
    for _ in range(n):
        k = rng.randint(1, 80)
        out.append(b" ".join(rng.choice(words) for _ in range(k)))
    for _ in range(n // 3):
        out.append(bytes(rng.getrandbits(8)
                         for _ in range(rng.randint(0, 400))))
    return out


class TestBrotliConformance:
    @pytest.mark.parametrize("quality", [1, 5, 9, 11])
    def test_reference_encoder_streams(self, quality):
        from tika_spark.analysis.brotlicodec import decompress
        codec = pa.Codec("brotli", compression_level=quality)
        for t in _corpus():
            comp = codec.compress(t, asbytes=True)
            assert decompress(comp) == t

    def test_long_input_streams(self):
        # long-input widening (the zstd FSE bug class: table states
        # only reached by long matches/large offsets)
        import random
        from tika_spark.analysis.brotlicodec import decompress
        rng = random.Random(3)
        words = TEXT.split()
        cases = [b"x" * 300_000, b"ab" * 150_000,
                 b" ".join(rng.choice(words) for _ in range(40_000))]
        for q in (1, 11):
            codec = pa.Codec("brotli", compression_level=q)
            for t in cases:
                comp = codec.compress(t, asbytes=True)
                assert decompress(comp, max_out=1 << 26) == t

    def test_dictionary_heavy_stream(self):
        # quality 11 on pure dictionary words forces static-dictionary
        # references with transforms (the round-5 feature)
        from tika_spark.analysis.brotlicodec import decompress
        codec = pa.Codec("brotli", compression_level=11)
        t = (b"This is the time of the year when people from the "
             b"world work together. Additional information about "
             b"the University Department of Development.")
        comp = codec.compress(t, asbytes=True)
        assert len(comp) < len(t) // 2      # only possible via dict
        assert decompress(comp) == t


class TestOwnEncodersThroughReferenceDecoders:
    """Reverse direction: streams from OUR fixture encoders must be
    accepted byte-exactly by the reference decoders — own-decoder
    round-trips alone cannot prove spec-validity (round 5 caught the
    lz-mode encoder emitting a trailing empty command whose bits lay
    past the declared meta-block content; sometimes tolerated,
    sometimes rejected as corrupt)."""

    def test_brotli_encoder_modes(self):
        import random
        from tika_spark.analysis import brotlicodec as B
        rng = random.Random(31)
        codec = pa.Codec("brotli")
        texts = [b"", b"a", TEXT, b"the quick brown fox " * 200,
                 b"abcd" * 2000,
                 bytes(rng.getrandbits(8) for _ in range(5000))]
        for t in texts:
            for mode in ("raw", "literals", "lz"):
                s = B.compress(t, mode=mode)
                assert bytes(codec.decompress(s, len(t))) == t, \
                    (mode, len(t))
            for fn in (B.compress_blocks, B.compress_ctx):
                s = fn(t)
                assert bytes(codec.decompress(s, len(t))) == t, \
                    (fn.__name__, len(t))

    def test_zstd_encoder(self):
        import random
        from tika_spark.analysis import zstdcodec as Z
        rng = random.Random(37)
        codec = pa.Codec("zstd")
        for t in [b"", b"a", TEXT, b"xy" * 5000,
                  bytes(rng.getrandbits(8) for _ in range(4000))]:
            s = Z.compress(t)
            assert bytes(codec.decompress(s, len(t))) == t, len(t)


class TestZstdConformance:
    @pytest.mark.parametrize("level", [1, 3, 9, 19])
    def test_reference_encoder_streams(self, level):
        from tika_spark.analysis.zstdcodec import decompress
        codec = pa.Codec("zstd", compression_level=level)
        for t in _corpus(seed=13):
            comp = codec.compress(t, asbytes=True)
            assert decompress(comp) == t

    def test_long_match_and_large_offset_streams(self):
        # pins the round-5 FSE low-probability-cell fix: predefined
        # ML/OF table states that land in the "less than 1" cells
        # (any match length >= ~8k, large offsets) only occur in
        # long inputs — the earlier short-corpus sweep never reached
        # them and the reversed cell placement mis-decoded every
        # such frame
        import random
        from tika_spark.analysis.zstdcodec import decompress
        rng = random.Random(5)
        words = TEXT.split()
        cases = [b"x" * 16389, b"x" * 400_000,
                 b"ab" * 120_000,
                 b" ".join(rng.choice(words)
                           for _ in range(60_000))]
        for level in (1, 19, 22):
            codec = pa.Codec("zstd", compression_level=level)
            for t in cases:
                comp = codec.compress(t, asbytes=True)
                assert decompress(comp, max_out=1 << 24) == t
