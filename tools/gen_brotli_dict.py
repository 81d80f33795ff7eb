"""Extract the RFC 7932 brotli static-dictionary spec data from the
system's public brotli implementation (bundled inside pyarrow's
libarrow) and write it into the repo:

- tika_spark/analysis/data/brotli_dictionary.bin   (122,784 bytes,
  RFC 7932 Appendix A: 13,504 words in 21 length sections)
- tika_spark/analysis/brotli_transforms.py         (generated module:
  the 50 prefix/suffix strings + 121 transform triples of RFC 7932
  section 8 / Appendix B)

The tables are pure spec data; extracting them from the linked
library (rather than transcribing 122 KB by hand) keeps them
byte-exact and auditable — rerun this script and `git diff`.

Anchors used (all structural facts from the RFC):
- the dictionary starts with the length-4 words "time","down","life",
  "left","back" and is exactly 122,784 bytes;
- kPrefixSuffix parses as exactly 50 length-prefixed segments over
  217 bytes, beginning "\\x01 \\x02, \\x08 of the ";
- kTransformsData is 121 (prefix_id, type, suffix_id) triples whose
  first transform is ("", Identity, "") = (49, 0, 49), ids < 50,
  types < 21.
"""
from __future__ import annotations

import os

DICT_LEN = 122_784
# words per length 4..24 (RFC 7932 Appendix A NDBITS)
NDBITS = (10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8, 7, 7,
          6, 6, 5, 5)


def _libarrow_bytes() -> bytes:
    import glob

    import pyarrow
    d = os.path.dirname(pyarrow.__file__)
    so = sorted(glob.glob(os.path.join(d, "libarrow.so*")))[0]
    with open(so, "rb") as f:
        return f.read()


def extract_dictionary(data: bytes) -> bytes:
    s = data.find(b"timedownlifeleftbackcodedatashowonly")
    assert s >= 0, "dictionary anchor not found"
    blob = data[s:s + DICT_LEN]
    # structural check: length-5 section begins at +4096
    assert blob[4096:4106] == b"firstvideo"
    assert sum((1 << b) * (i + 4)
               for i, b in enumerate(NDBITS)) == DICT_LEN
    return blob


def extract_prefix_suffix(data: bytes) -> list[bytes]:
    i = data.find(b"\x01 \x02, \x08 of the \x04 of \x02s ")
    assert i >= 0, "kPrefixSuffix anchor not found"
    pos, segs = i, []
    while len(segs) < 50:
        ln = data[pos]
        segs.append(data[pos + 1:pos + 1 + ln])
        pos += 1 + ln
    assert pos - i == 217 and segs[49] == b""
    return segs


def extract_transforms(data: bytes, near: int) -> list[tuple]:
    region = data[max(0, near - 65536):near + 65536]
    base = max(0, near - 65536)
    j = region.find(bytes([49, 0, 49]))
    while j >= 0:
        chunk = region[j:j + 363]
        trips = [(chunk[k], chunk[k + 1], chunk[k + 2])
                 for k in range(0, 363, 3)]
        if len(chunk) == 363 and all(
                a < 50 and t < 21 and b < 50 for a, t, b in trips) \
                and len({t for _, t, _ in trips}) >= 15:
            return trips
        j = region.find(bytes([49, 0, 49]), j + 1)
    raise AssertionError("kTransformsData not found")


def extract_context_luts(data: bytes) -> dict:
    """kContextLookup (RFC 7932 section 7.1): 4 modes x (lut0[256] +
    lut1[256]).  Anchored by the computable LSB6+MSB6 prefix."""
    pat = bytes(range(64)) * 4 + bytes(256) \
        + bytes((i >> 2) for i in range(256)) + bytes(256)
    i = data.find(pat)
    assert i >= 0, "kContextLookup anchor not found"
    utf8 = data[i + 1024:i + 1536]
    signed = data[i + 1536:i + 2048]
    # structural sanity: ascii lowercase letters context in UTF8 lut0
    assert utf8[ord("a")] in (56, 60) and signed[0] == 0
    return {"UTF8_LUT0": utf8[:256], "UTF8_LUT1": utf8[256:],
            "SIGNED_LUT0": signed[:256], "SIGNED_LUT1": signed[256:]}


def main():
    data = _libarrow_bytes()
    blob = extract_dictionary(data)
    segs = extract_prefix_suffix(data)
    ps_at = data.find(b"\x01 \x02, \x08 of the ")
    trips = extract_transforms(data, ps_at)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_bin = os.path.join(here, "tika_spark", "analysis", "data",
                           "brotli_dictionary.bin")
    with open(out_bin, "wb") as f:
        f.write(blob)
    print("wrote", out_bin, len(blob), "bytes")

    out_py = os.path.join(here, "tika_spark", "analysis",
                          "brotli_transforms.py")
    with open(out_py, "w") as f:
        f.write('"""RFC 7932 section 8 word-transform tables '
                '(GENERATED — tools/gen_brotli_dict.py).\n\n'
                'PREFIX_SUFFIX: the 50 affix strings; TRANSFORMS: the '
                '121 (prefix_id,\ntype, suffix_id) triples. Types: 0 '
                'identity, 1-9 omit-last-N, 10\nuppercase-first, 11 '
                'uppercase-all, 12-20 omit-first-(type-11).\n"""\n\n'
                "PREFIX_SUFFIX = (\n")
        for s in segs:
            f.write(f"    {s!r},\n")
        f.write(")\n\nTRANSFORMS = (\n")
        for i in range(0, 121, 6):
            f.write("    " + " ".join(f"({a}, {t}, {b}),"
                                      for a, t, b in trips[i:i + 6])
                    + "\n")
        f.write(")\n")
    print("wrote", out_py, len(trips), "transforms")

    luts = extract_context_luts(data)
    out_ctx = os.path.join(here, "tika_spark", "analysis",
                           "brotli_context.py")
    with open(out_ctx, "w") as f:
        f.write('"""RFC 7932 section 7.1 literal-context lookup '
                'tables for the UTF8 and\nSigned modes (GENERATED '
                '— tools/gen_brotli_dict.py; the LSB6/MSB6 modes\n'
                'are computed in code). ctx = lut0[p1] | '
                'lut1[p2].\n"""\n\n')
        for name, tab in luts.items():
            f.write(f"{name} = bytes([\n")
            for k in range(0, 256, 16):
                f.write("    " + ", ".join(str(b)
                                           for b in tab[k:k + 16])
                        + ",\n")
            f.write("])\n\n")
    print("wrote", out_ctx)


if __name__ == "__main__":
    main()
