"""Exactly-once streaming writes into the snapshot table layer.

Structured Streaming's contract is at-least-once per micro-batch: after
a crash the engine REPLAYS the last possibly-uncommitted batch id, and
it is the sink's job to make that replay a no-op. The lakehouse answer
(the public Delta/Iceberg streaming-sink pattern) is transactional
idempotence: record the (query id, batch id) inside the same atomic
commit as the data, and skip any batch whose id is already committed.

:func:`table_sink` is that writer for
:class:`~tika_spark.pipeline.table.SnapshotTable`: the batch's files
are staged (invisible), then one atomic snapshot commit publishes data
+ per-file lineage + ``{"stream_query": ..., "stream_batch_id": ...}``
in a single rename. A crash between stage and commit leaves vacuum-able
orphans and the replayed batch simply commits again; a crash after the
commit makes the replay hit the batch-id check and skip. Either way the
table holds each micro-batch exactly once.

Scale notes: the batch-id probe reads snapshot manifests (metadata,
O(snapshots)); data files are written once and never rewritten. Use
``expire_snapshots`` + ``vacuum`` on a long-running stream the same way
Iceberg/Delta deployments do. The crawl-ingest shape is::

    pages = read_warc_stream(...)            # or any streaming source
    out   = tika_spark.extract(pages, mode="text")
    q = stream_to_table(out, "/lake/extracted",
                        checkpoint="/lake/_ckpt/extracted")

Reference parity: none — the reference is per-document; continuous
ingest is pipeline infrastructure (streaming/ingest.py's sibling on
the write side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tika_spark.pipeline.table import SnapshotTable


def committed_batch_ids(table: SnapshotTable,
                        query_name: str | None = None) -> set[int]:
    """Stream batch ids already committed (optionally one query's)."""
    out = set()
    for s in table.snapshots():
        summ = s["summary"]
        if "stream_batch_id" not in summ:
            continue
        if query_name is not None and \
                summ.get("stream_query") != query_name:
            continue
        out.add(int(summ["stream_batch_id"]))
    return out


def table_sink(table_root: str, query_name: str = "stream"):
    """``foreachBatch`` function writing each micro-batch into the
    snapshot table at ``table_root`` exactly once (idempotent under
    Structured Streaming's batch replay)."""
    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            table = SnapshotTable.load(spark, table_root)
        except ValueError:
            table = SnapshotTable.create(spark, table_root)
        if int(batch_id) in committed_batch_ids(table, query_name):
            return                       # replayed batch: already in
        entries = table.stage(batch_df)
        table.commit_staged(
            entries, batch_df.schema.json(), "append",
            summary={"stream_query": query_name,
                     "stream_batch_id": int(batch_id),
                     "n_rows": sum(e["rows"] for e in entries)})
    return write


def stream_to_table(stream_df: DataFrame, table_root: str,
                    checkpoint: str, query_name: str = "stream",
                    available_now: bool = False, **trigger):
    """Start a streaming query writing ``stream_df`` into the
    snapshot table. ``available_now=True`` drains the current source
    snapshot and stops (backfill mode); otherwise pass a trigger
    (e.g. ``processingTime='30 seconds'``)."""
    w = (stream_df.writeStream
         .foreachBatch(table_sink(table_root, query_name))
         .option("checkpointLocation", checkpoint)
         .queryName(query_name))
    if available_now:
        w = w.trigger(availableNow=True)
    elif trigger:
        w = w.trigger(**trigger)
    return w.start()
