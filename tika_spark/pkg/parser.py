"""Archive parsers: zip, gzip, tar, bzip2 (SURVEY.md §2 E6).

Reimplements the semantics of the reference's PackageParser/
PackageExtractor (tika-parsers/.../pkg/PackageParser.java:40-62,
PackageExtractor.java): each archive entry is announced in the parent
document's text as a package-entry heading (the ``<div
class="package-entry"><h1>name`` frame serialized through the C5
layout contract → one name per line), and the entry bytes are handed
to the embedded-document machinery for recursive parsing.

Spark-native recursion (F1): instead of recursing inside the parser,
entries are returned as a ``children`` list ``[(name, bytes), ...]``;
the driver-side fixpoint in ``tika_spark.pipeline.job.extract_recursive``
explodes them into new rows that re-enter detect → route → parse,
bounded by MAX_EMBED_DEPTH (the reference's package-nesting guard,
tika-core/.../sax/SecureContentHandler.java:80).

Zip-bomb guards (SecureContentHandler.java:65-80 transferred):
- total decompressed bytes ≤ max(1 MB, 100 × input bytes)
- at most MAX_PKG_ENTRIES entries surfaced
- per-entry decompression is streamed with a hard cap, so a
  pathological member cannot OOM an executor.
"""

from __future__ import annotations

import bz2
import io
import tarfile
import zipfile
import zlib

from tika_spark.config import ExtractConfig

_DEFAULT = ExtractConfig()

MAX_PKG_ENTRIES = 1000


def _budget(config: ExtractConfig, n_input: int) -> int:
    return max(config.output_min_chars, config.output_ratio * max(1, n_input))


def _zip_children(data: bytes, budget: int):
    out, used, truncated = [], 0, False
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if len(out) >= MAX_PKG_ENTRIES or used >= budget:
                return out, True
            cap = budget - used
            with zf.open(info) as f:
                payload = f.read(cap + 1)
            if len(payload) > cap:
                payload, truncated = payload[:cap], True
            used += len(payload)
            out.append((info.filename, payload))
    return out, truncated


def _gzip_child(data: bytes, url: str | None, budget: int):
    d = zlib.decompressobj(wbits=31)
    payload = d.decompress(data, budget)
    truncated = bool(d.unconsumed_tail)
    name = "gz-entry"
    if url:
        base = url.rstrip("/").rsplit("/", 1)[-1]
        name = base[:-3] if base.lower().endswith(".gz") else base
    return [(name, payload)], truncated


def _tar_children(data: bytes, budget: int):
    out, used, truncated = [], 0, False
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:") as tf:
        for member in tf:
            if not member.isfile():
                continue
            if len(out) >= MAX_PKG_ENTRIES or used >= budget:
                return out, True
            f = tf.extractfile(member)
            if f is None:
                continue
            cap = budget - used
            payload = f.read(cap + 1)
            if len(payload) > cap:
                payload, truncated = payload[:cap], True
            used += len(payload)
            out.append((member.name, payload))
    return out, truncated


def _bzip2_child(data: bytes, url: str | None, budget: int):
    d = bz2.BZ2Decompressor()
    payload = d.decompress(data, budget)
    truncated = not d.eof
    name = "bz2-entry"
    if url:
        base = url.rstrip("/").rsplit("/", 1)[-1]
        name = base[:-4] if base.lower().endswith(".bz2") else base
    return [(name, payload)], truncated


def extract_package(data: bytes, url: str | None = None,
                    declared_type: str | None = None,
                    config: ExtractConfig = _DEFAULT,
                    mime: str | None = None) -> dict:
    """Extract one archive: entry-name text + children for recursion."""
    data = bytes(data or b"")
    budget = _budget(config, len(data))

    if mime is None:
        mime = ("application/x-gzip" if data[:2] == b"\x1f\x8b" else
                "application/x-bzip2" if data[:3] == b"BZh" else
                "application/x-tar" if data[257:262] == b"ustar" else
                "application/zip")
    error = None
    try:
        if mime == "application/x-gzip":
            children, truncated = _gzip_child(data, url, budget)
        elif mime == "application/x-bzip2":
            children, truncated = _bzip2_child(data, url, budget)
        elif mime == "application/x-tar":
            children, truncated = _tar_children(data, budget)
        else:
            children, truncated = _zip_children(data, budget)
    except Exception as e:  # corrupt container -> error row, never raise
        children, truncated = [], False
        error = f"pkg: {e!r}"[:1000]

    # package-entry frame: one <h1>name per entry → name + NEWLINE
    text = "".join(name + "\n" for name, _ in children)
    spans, pos = [], 0
    for name, _ in children:
        spans.append((pos, pos + len(name), "package-entry"))
        pos += len(name) + 1
    return {
        "charset": None,
        "title": None,
        "text": text,
        "spans": spans,
        "links": [],
        "metadata": {"Content-Type": [mime],
                     "package-entry-count": [str(len(children))]},
        "status": ("error" if error else
                   "output_limit" if truncated else "ok"),
        "error": error,
        "children": children,
    }
