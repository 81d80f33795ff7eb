"""Streaming writes into the snapshot table (streaming/table_sink.py):
exactly-once under micro-batch replay, availableNow backfill, restart
with a checkpoint."""

import pyspark.sql.functions as F

from tika_spark.pipeline.table import SnapshotTable
from tika_spark.streaming.table_sink import (committed_batch_ids,
                                             stream_to_table,
                                             table_sink)


def _source(spark, tmp_path, lo, hi, name):
    d = str(tmp_path / "src")
    (spark.range(lo, hi).selectExpr(
        "id AS doc_id", "concat('t', id) AS text")
     .write.mode("append").parquet(d))
    return d


def test_available_now_backfill(spark, tmp_path):
    src = _source(spark, tmp_path, 0, 100, "a")
    root = str(tmp_path / "tab")
    stream = (spark.readStream
              .schema("doc_id long, text string").parquet(src))
    q = stream_to_table(stream, root, str(tmp_path / "ckpt"),
                        query_name="ingest", available_now=True)
    q.awaitTermination(300)
    t = SnapshotTable.load(spark, root)
    assert t.read().count() == 100
    ids = committed_batch_ids(t, "ingest")
    assert ids and min(ids) == 0
    # summaries carry the query name + row counts
    assert all(s["summary"]["stream_query"] == "ingest"
               for s in t.snapshots())
    assert sum(s["summary"]["n_rows"] for s in t.snapshots()) == 100


def test_replayed_batch_is_skipped(spark, tmp_path):
    root = str(tmp_path / "tab")
    batch = spark.range(10).selectExpr("id AS doc_id",
                                       "concat('t', id) AS text")
    sink = table_sink(root, "q")
    sink(batch, 7)
    head = SnapshotTable.load(spark, root).current_snapshot()
    sink(batch, 7)                         # Structured Streaming replay
    t = SnapshotTable.load(spark, root)
    assert t.current_snapshot() == head    # no second commit
    assert t.read().count() == 10
    sink(batch, 8)                         # a NEW batch still lands
    assert SnapshotTable.load(spark, root).read().count() == 20


def test_restart_appends_only_new_files(spark, tmp_path):
    src = _source(spark, tmp_path, 0, 50, "a")
    root = str(tmp_path / "tab")
    ckpt = str(tmp_path / "ckpt")
    stream = (spark.readStream
              .schema("doc_id long, text string").parquet(src))
    q = stream_to_table(stream, root, ckpt, available_now=True)
    q.awaitTermination(300)
    assert SnapshotTable.load(spark, root).read().count() == 50

    _source(spark, tmp_path, 50, 80, "b")  # new files arrive
    stream2 = (spark.readStream
               .schema("doc_id long, text string").parquet(src))
    q2 = stream_to_table(stream2, root, ckpt, available_now=True)
    q2.awaitTermination(300)
    t = SnapshotTable.load(spark, root)
    got = t.read()
    assert got.count() == 80               # old files NOT re-ingested
    assert got.select("doc_id").distinct().count() == 80
    assert got.agg(F.sum("doc_id")).collect()[0][0] == 79 * 80 // 2
