"""Round-5 hardening fuzz: corruption robustness of the new
brotli-dictionary/zstd paths, and the H1 fault-isolation contract
under mass adversarial payloads WITH the input byte-cap active."""

import random
import time

import pandas as pd
import pyarrow as pa


class TestCodecCorruption:
    """Bit-flipped valid reference-encoder streams must fail CLEANLY
    (ValueError or bounded output) and in bounded time — never an
    unexpected exception class, never a hang."""

    def _flipped(self, s, rng, n=400):
        for _ in range(n):
            b = bytearray(s)
            for _ in range(rng.randint(1, 4)):
                i = rng.randrange(len(b))
                b[i] ^= 1 << rng.randrange(8)
            yield bytes(b)

    def test_brotli_corruption(self):
        from tika_spark.analysis.brotlicodec import decompress
        rng = random.Random(17)
        text = (b"the information about world management development "
                b"background-color document.getElementById ") * 50
        for s in (pa.Codec("brotli", compression_level=11)
                  .compress(text, asbytes=True),
                  pa.Codec("brotli", compression_level=11)
                  .compress(b"x" * 50000, asbytes=True)):
            for b in self._flipped(s, rng):
                t0 = time.time()
                try:
                    out = decompress(b, max_out=1 << 22)
                    assert len(out) <= 1 << 22
                except ValueError:
                    pass
                assert time.time() - t0 < 5

    def test_zstd_corruption(self):
        from tika_spark.analysis.zstdcodec import decompress
        rng = random.Random(19)
        text = (b"the information about world management development "
                b"and the description of the public data ") * 50
        for s in (pa.Codec("zstd", compression_level=19)
                  .compress(text, asbytes=True),
                  pa.Codec("zstd", compression_level=19)
                  .compress(b"x" * 200000, asbytes=True)):
            for b in self._flipped(s, rng):
                t0 = time.time()
                try:
                    out = decompress(b, max_out=1 << 22)
                    assert len(out) <= 1 << 22
                except ValueError:
                    pass
                assert time.time() - t0 < 5


def test_extract_mass_fuzz_with_input_cap():
    """4,000 adversarial payloads (random bytes, bit-flipped and
    truncated real fixtures) through one process_batch with the
    input cap active: every row must come back with a known status;
    no exception may escape the batch (H1)."""
    from tika_spark.config import ExtractConfig
    from tika_spark.fixtures.pages import generate_pages_pandas
    from tika_spark.pipeline.stages import process_batch

    rng = random.Random(23)
    base = [bytes(h) for h in generate_pages_pandas(300)["html"]]
    rows = []
    for i in range(4000):
        r = rng.random()
        if r < 0.4:
            b = bytes(rng.getrandbits(8)
                      for _ in range(rng.randint(0, 3000)))
        elif r < 0.8:
            src = bytearray(rng.choice(base))
            if src:
                for _ in range(rng.randint(1, 30)):
                    src[rng.randrange(len(src))] ^= \
                        1 << rng.randrange(8)
                if rng.random() < 0.4:
                    src = src[:rng.randrange(len(src) + 1)]
            b = bytes(src)
        else:
            b = rng.choice(base)[:rng.randint(0, 200)]
        rows.append((f"fuzz://{i}", bytearray(b)))
    pdf = pd.DataFrame(rows, columns=["url", "html"])
    out = process_batch(pdf, ExtractConfig(mode="text-main",
                                           max_input_bytes=1 << 20))
    assert len(out) == len(pdf)
    assert set(out["status"].unique()) <= {
        "ok", "error", "no_parser", "input_capped", "metadata_only"}


def test_xhtml_sink_is_well_formed_xml():
    """Reverse-oracle on the A4 sink: every non-empty xhtml-mode
    output must parse under a STRICT XML parser — downstream
    consumers of the -x projection depend on well-formedness, and
    own-serializer round-trips can't prove it."""
    import xml.etree.ElementTree as ET

    from tika_spark.config import ExtractConfig
    from tika_spark.fixtures.pages import generate_pages_pandas
    from tika_spark.pipeline.stages import process_batch

    pdf = generate_pages_pandas(400)
    out = process_batch(pdf, ExtractConfig(mode="xhtml"))
    checked = 0
    for text, status in zip(out["text"], out["status"]):
        if not text or status == "no_parser":
            continue
        ET.fromstring(text)        # raises on malformed output
        checked += 1
    assert checked > 300
    # the -y (XMP packet) and -j (JSON metadata) sinks carry the
    # same contract under their own strict parsers
    import json as _json
    for mode, check in (("xmp", ET.fromstring), ("json", _json.loads)):
        out = process_batch(pdf, ExtractConfig(mode=mode))
        for text in out["text"]:
            if text:
                check(text)
