"""Distributed zstd dictionary training + dict-compressed .warc.zst
export (analysis/dicttrain.py).

Reference parity: none — the reference neither trains compression
dictionaries nor writes archives; this is crawl-tier egress feeding
sources/warc.py's .warc.zst ingest (which IS reference-shaped:
CommonCrawl's archive layout).
"""

import io

import pytest

from tika_spark.analysis.dicttrain import (
    export_warc_zst,
    read_warc_zst_shards,
    train_zstd_dict,
)

TEMPLATE = ("<html><head><title>shop item %d</title></head>"
            "<body><div class=main>widget number %d in stock"
            "</div><footer>contact sales@example.invalid"
            "</footer></body></html>")


def _corpus(spark, n=60):
    rows = [(i, TEMPLATE % (i, i * 7)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_train_is_deterministic(spark):
    docs = _corpus(spark)
    a = train_zstd_dict(docs, dict_size=1024)
    b = train_zstd_dict(docs.repartition(7), dict_size=1024)
    assert a == b
    assert 0 < len(a) <= 1024


def test_train_structured_dict_parses(spark):
    from tika_spark.analysis.zstdcodec import parse_dict
    blob = train_zstd_dict(_corpus(spark), dict_size=1024, dict_id=42)
    zd = parse_dict(blob)
    assert zd.dict_id == 42
    assert len(zd.content) > 0


def test_train_no_recurrence_raises(spark):
    import string
    # every 16-byte window unique across and within docs
    alphabet = string.ascii_letters + string.digits
    rows = [(i, "".join(alphabet[(i * 37 + j * 11 + j * j) % 62]
                        for j in range(40)))
            for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ValueError):
        train_zstd_dict(docs, min_count=30)


def test_export_requires_structured_dict(spark):
    docs = _corpus(spark, 10)
    raw = train_zstd_dict(docs, dict_size=512)  # no dict_id
    with pytest.raises(ValueError):
        export_warc_zst(docs, raw)


def test_export_read_roundtrip(spark):
    docs = _corpus(spark, 40).repartition(3)
    blob = train_zstd_dict(docs, dict_size=2048, dict_id=9)
    shards = export_warc_zst(docs, blob).collect()
    assert len(shards) == 3
    assert sum(r["n_records"] for r in shards) == 40
    back = read_warc_zst_shards(
        spark.createDataFrame(shards)).collect()
    got = {int(r["url"].split("//")[1]): r["text"] for r in back}
    want = {r["doc_id"]: r["text"]
            for r in docs.collect()}
    assert got == want


def test_dictionary_actually_helps(spark):
    """Per-member dict compression must beat dict-less on a
    template-heavy corpus — the whole point of training."""
    from tika_spark.analysis.zstdcodec import compress, parse_dict
    docs = _corpus(spark, 60)
    blob = train_zstd_dict(docs, dict_size=2048, dict_id=5)
    zd = parse_dict(blob)
    texts = [r["text"].encode() for r in docs.collect()]
    with_d = sum(len(compress(t, mode="lz", zdict=zd)) for t in texts)
    without = sum(len(compress(t, mode="lz")) for t in texts)
    assert with_d < without


def test_shards_self_contained(spark):
    """Each shard must be independently readable (its own dictionary
    frame rides in front) — the splittability property."""
    from tika_spark.sources.warc import warc_pages_from
    docs = _corpus(spark, 20).repartition(4)
    blob = train_zstd_dict(docs, dict_size=1024, dict_id=3)
    for row in export_warc_zst(docs, blob).collect():
        pages = list(warc_pages_from(
            io.BytesIO(bytes(row["blob"])).read, zst=True))
        assert len(pages) == row["n_records"]
        assert all(p["status"] == "ok" for p in pages)
