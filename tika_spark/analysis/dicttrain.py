"""Distributed zstd dictionary training + dictionary-compressed
.warc.zst export.

Compression dictionaries earn their keep on exactly the corpus this
repo targets: millions of small, same-shaped documents (WARC/HTTP
boilerplate, shared site templates) where per-member compression can't
see the cross-member redundancy. The training step here is the COVER
idea reduced to its Spark-native core: find the byte substrings that
recur most across a sample of the corpus and pack them into the
dictionary window, most-frequent material LAST (nearest offsets — the
zstd convention).

Scale shape: shingling is a JVM-side ``transform(sequence(...))`` +
``explode`` (no Python per row), counting is one ``groupBy(shingle)``
whose shuffle carries fixed-width shingles (never documents), and only
the top-k rows (bounded by the dictionary size) reach the driver for
assembly — the corpus is never collected. Export is a per-partition
``mapInPandas``: each task emits one self-contained ``.warc.zst``
shard whose leading IIPC skippable frame carries the (zstd-compressed)
dictionary, so every shard is independently readable — the same
property that makes Common-Crawl segments splittable.

Reference parity: none (the reference neither trains dictionaries nor
writes archives); this is pipeline egress for the crawl tier
(sources/warc.py reads these shards back).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def train_zstd_dict(docs: DataFrame, text_col: str = "text",
                    dict_size: int = 4096, shingle: int = 16,
                    stride: int = 8, min_count: int = 2,
                    dict_id: int | None = None) -> bytes:
    """Train a zstd dictionary over ``docs[text_col]``.

    Counts ``shingle``-byte substrings at ``stride`` across the corpus
    (JVM-side), keeps those seen >= ``min_count`` times, and packs the
    winners into ``dict_size`` bytes of content ordered
    least-frequent-first (most frequent nearest the window end).
    Returns raw-content dictionary bytes when ``dict_id`` is None,
    else a structured dictionary (entropy tables + validated repeat
    ring) via :func:`~tika_spark.analysis.zstdcodec.build_dict`.

    Deterministic: ties break on the shingle bytes, so the same
    corpus always trains the same dictionary on any engine.
    """
    shingles = (docs
                .select(F.explode(F.expr(
                    f"transform(sequence(1, greatest(1, "
                    f"length({text_col}) - {shingle} + 1), {stride}),"
                    f" i -> substring({text_col}, i, {shingle}))"
                )).alias("sh"))
                .filter(F.length("sh") == shingle))
    top = (shingles.groupBy("sh").count()
           .filter(F.col("count") >= min_count)
           .orderBy(F.desc("count"), F.asc("sh"))
           # candidate pool: a few × the slots the window can hold —
           # containment-dedup below consumes some candidates
           .limit(max(16, 4 * (dict_size // shingle)))
           .collect())
    picked: list[str] = []
    used = 0
    for row in top:                      # most frequent first
        s = row["sh"]
        if used + len(s.encode("utf-8")) > dict_size:
            continue
        if any(s in p for p in picked):
            continue                     # already covered verbatim
        picked.append(s)
        used += len(s.encode("utf-8"))
    # most-frequent material goes LAST in the content (closest match
    # offsets for the encoder)
    content = "".join(reversed(picked)).encode("utf-8")[:dict_size]
    if not content:
        raise ValueError("no shingle recurred >= min_count times — "
                         "nothing to train on")
    if dict_id is None:
        return content
    from tika_spark.analysis.zstdcodec import build_dict
    return build_dict(content, dict_id, literal_sample=content)


def export_warc_zst(docs: DataFrame, dictionary: bytes,
                    doc_id_col: str = "doc_id",
                    text_col: str = "text",
                    date_iso: str = "2026-01-17T08:30:00Z",
                    mode: str = "lz") -> DataFrame:
    """Write ``docs`` as dictionary-compressed ``.warc.zst`` shards —
    one blob per input partition, each led by the IIPC dictionary
    frame (the dictionary itself zstd-compressed), every member frame
    naming the Dictionary_ID when the dictionary is structured.
    Returns ``(shard_id, blob, n_records)``; blobs are the bytes a
    ``foreachPartition``/binary sink would put on the archive store.
    """
    import pandas as pd

    from tika_spark.analysis.zstdcodec import compress, parse_dict
    zd = parse_dict(dictionary)
    if not zd.dict_id:
        # raw-content dicts carry no id, so member frames could not
        # NAME the dictionary and a reader would not know to apply it
        raise ValueError("export needs a structured dictionary — "
                         "train with dict_id= set")
    dict_blob = compress(dictionary, mode="lz")

    def build(batches):
        from pyspark import TaskContext

        from tika_spark.sources.warc import build_record
        shard = TaskContext.get().partitionId()
        out = bytearray()
        out += (0x184D2A5D).to_bytes(4, "little")
        out += len(dict_blob).to_bytes(4, "little")
        out += dict_blob
        n = 0
        for pdf in batches:
            for i, t in zip(pdf[doc_id_col], pdf[text_col]):
                rec = build_record(f"doc://{int(i)}", date_iso,
                                   str(t).encode("utf-8"))
                out += compress(rec, mode=mode, zdict=zd)
                n += 1
        yield pd.DataFrame({"shard_id": [shard],
                            "blob": [bytes(out)],
                            "n_records": [n]})

    return docs.select(doc_id_col, text_col).mapInPandas(
        build, "shard_id int, blob binary, n_records long")


def read_warc_zst_shards(shards: DataFrame,
                         blob_col: str = "blob") -> DataFrame:
    """Inverse of :func:`export_warc_zst`: parse shard blobs back to
    ``(url, text)`` rows (each shard is self-contained — its own
    dictionary frame rides in front)."""
    import io

    import pandas as pd

    from tika_spark.sources.warc import warc_pages_from

    def parse(batches):
        for pdf in batches:
            rows = [(p["url"],
                     bytes(p["html"] or b"").decode("utf-8",
                                                    "replace"))
                    for b in pdf[blob_col]
                    for p in warc_pages_from(io.BytesIO(bytes(b)).read,
                                             zst=True)
                    if p["status"] == "ok"]
            yield pd.DataFrame(rows, columns=["url", "text"])

    return shards.mapInPandas(parse, "url string, text string")
