"""Streaming ingestion tests: incremental extraction with
exactly-once file tracking via the streaming checkpoint."""

import os

from tika_spark.fixtures.pages import generate_pages_pandas
from tika_spark.streaming.ingest import extract_stream


def _write_chunk(spark, pdf, path):
    df = spark.createDataFrame(
        pdf[["url", "warc_ts", "html"]])
    df.coalesce(1).write.mode("append").parquet(path)


def _drain(spark, inp, out, ckpt):
    q = extract_stream(spark, inp, out, ckpt,
                       trigger_available_now=True)
    q.awaitTermination(120)
    q.stop()


def test_stream_ingests_incrementally(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = generate_pages_pandas(40)

    _write_chunk(spark, pages.iloc[:25], inp)
    _drain(spark, inp, out, ckpt)
    got1 = spark.read.parquet(out)
    assert got1.count() == 25
    assert "html" not in got1.columns  # binary never reaches the sink

    # new files arrive → only they are processed (checkpointed offsets)
    _write_chunk(spark, pages.iloc[25:], inp)
    _drain(spark, inp, out, ckpt)
    got2 = spark.read.parquet(out)
    assert got2.count() == 40
    assert got2.select("url").distinct().count() == 40
    # extraction results identical to the batch job for the same rows
    urls_ok = got2.filter("status in ('ok','no_parser')").count()
    assert urls_ok == 40
    assert os.path.isdir(ckpt)
