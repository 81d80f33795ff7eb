"""Deterministic WARC builder (fixture surface over the product
record builders in :mod:`tika_spark.sources.warc`).

Emits the Common-Crawl layout: a ``.warc.gz`` is a concatenation of
independently-gzipped members, ONE WARC record per member (the
per-record framing is what makes CC files splittable/seekable — WARC
1.0 / ISO 28500). Response records wrap an HTTP/1.1 response whose
body is the page payload; gzip mtime is pinned so identical inputs
are byte-identical archives.
"""

from __future__ import annotations

from tika_spark.sources.warc import build_record as warc_record
from tika_spark.sources.warc import gzip_member

__all__ = ["warc_record", "gzip_member", "warc_gz", "warc_zst",
           "warc_zst_dict"]


def warc_gz(records: list[tuple[str, str, bytes]]) -> bytes:
    """Multi-record ``.warc.gz``: each (url, date_iso, payload)
    becomes a response record in its own gzip member."""
    return b"".join(gzip_member(warc_record(u, d, p))
                    for (u, d, p) in records)


def warc_zst(records: list[tuple[str, str, bytes]],
             with_dict_frame: bool = True) -> bytes:
    """Multi-record ``.warc.zst`` (IIPC layout): one zstd frame per
    response record (wire form cycles the codec's modes), preceded by
    an empty 0x184D2A5D dictionary skippable frame when
    ``with_dict_frame`` (readers must skip it)."""
    from tika_spark.analysis.zstdcodec import compress
    out = bytearray()
    if with_dict_frame:
        out += (0x184D2A5D).to_bytes(4, "little")
        out += (0).to_bytes(4, "little")
    for k, (u, d, p) in enumerate(records):
        mode = ("lz", "huff", "literals", "fse", "raw")[k % 5]
        out += compress(warc_record(u, d, p), mode=mode,
                        checksum=(k % 2 == 0))
    return bytes(out)


def warc_zst_dict(records: list[tuple[str, str, bytes]],
                  dict_id: int = 2026,
                  compress_dict: bool = True) -> bytes:
    """Dictionary-compressed ``.warc.zst`` (the layout IIPC designed
    the format for): a structured zstd dictionary trained on the
    shared WARC/HTTP boilerplate rides first in the 0x184D2A5D
    skippable frame (itself zstd-compressed when ``compress_dict``),
    then one frame per response record, each naming the
    Dictionary_ID and cycling window-only ("lz"/"huff") and
    entropy-reuse ("dict") wire forms."""
    from tika_spark.analysis.zstdcodec import (build_dict, compress,
                                               parse_dict)
    # the dictionary content is exactly the cross-record boilerplate:
    # a full record for an empty payload (WARC headers + HTTP
    # envelope) — real .warc.zst dictionaries are trained the same
    # way, on record-structure bytes shared across the file
    template = warc_record("http://example.com/", "2026-01-01T00:00:00Z",
                           b"")
    sample = b"".join(warc_record(u, d, p) for u, d, p in records[:4])
    raw_dict = build_dict(template, dict_id, literal_sample=sample)
    zd = parse_dict(raw_dict)
    blob = (compress(raw_dict, mode="lz") if compress_dict
            else raw_dict)
    out = bytearray()
    out += (0x184D2A5D).to_bytes(4, "little")
    out += len(blob).to_bytes(4, "little")
    out += blob
    for k, (u, d, p) in enumerate(records):
        mode = ("dict", "lz", "huff")[k % 3]
        out += compress(warc_record(u, d, p), mode=mode, zdict=zd,
                        checksum=(k % 2 == 0))
    return bytes(out)
