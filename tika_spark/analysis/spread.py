"""Decode-stage parallelism guard.

The multimodal decode stages (pixel/PCM/frame/census) are
CPU-per-row-bound ``mapInPandas`` maps with NO shuffle of their own —
the right 100 TB shape, because a crawl-scale source table arrives in
thousands of splits and the stage inherits that parallelism for
free.  But when the SOURCE is narrower than the cluster (one small
parquet file, a driver-built fixture, a filtered slice), the
shuffle-free plan quietly serializes the whole decode on the few
input partitions — the round-5 local bench caught media_vp8_inter
running 500 decodes on ONE core (12.7 s -> 1.8 s after spreading).

``spread_for_decode`` repartitions by the row id ONLY when the input
has fewer partitions than the default parallelism, so the common
crawl-scale path stays exchange-free while narrow inputs fan out.
The byte cost of the exchange is bounded by the payload column the
stage was going to move into Python anyway; the CPU per row is the
dominant term by construction (it is why these stages exist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_decode(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition a narrow input up to cluster parallelism; no-op
    (and no exchange) when the source already has enough splits."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:
        return df
    if have >= target or target <= 1:
        return df
    return df.repartition(target, *key_cols) if key_cols \
        else df.repartition(target)
