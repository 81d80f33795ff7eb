"""The staged extraction DataFrame job (the library entry point).

Scale design (SURVEY.md §4 O9-O12, judged at 100TB):

- **One pass over the binary column.** detect+parse+classify run in a
  single ``mapInPandas``; the multi-MB ``html`` column crosses into
  Python exactly once and does NOT appear in the output schema, so no
  downstream stage or shuffle ever carries page bytes.
- **Skew defusal by size buckets.** Rows are repartitioned by
  ``(size_bucket, hash(url))`` so giant pages spread uniformly across
  tasks instead of serializing one straggler partition, then sorted by
  bucket within partitions so each Arrow batch is size-homogeneous.
- **Bounded batches.** Callers should keep
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` moderate (<=1024);
  with bucket-homogeneous batches, peak batch memory is bounded by
  bucket ceiling x batch size.
- **Catalyst-friendly glue.** Everything outside the UDF is plain
  DataFrame code: filters on input columns (e.g. a ``warc_ts`` range)
  push down to the source scan; the lineage aggregation is a stock
  groupBy over the (binary-free) output.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from tika_spark.config import MAX_EMBED_DEPTH, ExtractConfig
from tika_spark.pipeline.stages import EXTRACT_SCHEMA, make_extract_fn

_DEFAULT = ExtractConfig()


def with_size_bucket(df: DataFrame,
                     bounds=_DEFAULT.size_bucket_bounds) -> DataFrame:
    """Add ``size_bucket`` = index of the first bound >= len(html)."""
    expr = F.lit(len(bounds))
    for idx in range(len(bounds) - 1, -1, -1):
        expr = F.when(F.length("html") <= F.lit(bounds[idx]),
                      F.lit(idx)).otherwise(expr)
    return df.withColumn("size_bucket", expr)


def extract(df: DataFrame, mode: str = "text",
            config: ExtractConfig | None = None,
            repartition: int | None = None) -> DataFrame:
    """Run the full extraction pipeline over a pages DataFrame.

    Input columns: url, html (binary); optional warc_ts, declared_type.
    Output: url, warc_ts, mime, charset, lang, lang_distance, title,
    text, spans, links, metadata, status, error, children, n_bytes,
    n_chars, part_id, batch_ms  (NO html — the binary never leaves the
    stage; ``children`` carries archive members for the F1 recursion
    and is empty for non-container rows).

    ``repartition``: number of partitions for the skew-defusing
    (size_bucket, crc32(url)) shuffle; None → defaultParallelism;
    ``0`` → **skip the shuffle** and trust the input partitioning.
    Use 0 when the source table is already written bucketed by content
    size (the recommended Iceberg layout at crawl scale — then the
    heavy binary column is never shuffled at all and the whole job is
    scan → mapInPandas → write with zero exchanges).
    """
    if config is None:
        config = ExtractConfig(mode=mode)
    elif mode and config.mode != mode:
        config = ExtractConfig(**{**config.__dict__, "mode": mode})

    cols = [c for c in ("url", "warc_ts", "html", "declared_type")
            if c in df.columns]
    slim = df.select(*cols)  # column pruning before the python stage

    if repartition == 0:
        arranged = slim
    else:
        bucketed = with_size_bucket(slim, config.size_bucket_bounds)
        n_parts = (repartition
                   or slim.sparkSession.sparkContext.defaultParallelism)
        # spread giants uniformly, then make batches size-homogeneous
        arranged = (bucketed
                    .repartition(n_parts, F.col("size_bucket"),
                                 F.crc32("url"))
                    .sortWithinPartitions("size_bucket")
                    .drop("size_bucket"))
    return arranged.mapInPandas(make_extract_fn(config),
                                schema=EXTRACT_SCHEMA)


def extract_recursive(df: DataFrame, mode: str = "text",
                      config: ExtractConfig | None = None,
                      max_depth: int = MAX_EMBED_DEPTH,
                      repartition: int | None = None) -> DataFrame:
    """Extraction with embedded-document recursion (SURVEY.md §2 F1,
    §3.4): archive members surfaced in ``children`` are exploded into
    new rows (url = ``parent!/name``) that re-enter the same
    detect → route → parse job, iterating to a driver-side fixpoint.

    Depth is bounded by MAX_EMBED_DEPTH, mirroring the reference's
    package-nesting guard (sax/SecureContentHandler.java:80 — depth 10);
    members still unexpanded at the bound are dropped (their parent row
    keeps the entry-name text). Output = extract() schema minus
    ``children``, plus ``depth``.

    The per-level ``isEmpty()`` is the deliberate driver-side fixpoint
    check (no recursion inside a UDF); levels after the first are tiny
    (only container members), so the extra jobs are cheap. Each level
    re-applies the size-bucket repartitioning so a zip full of giant
    members cannot skew one task.

    Each level is **persisted (MEMORY_AND_DISK) before the fixpoint
    probe** so the expensive mapInPandas parse runs exactly once per
    level: without it, every ``isEmpty()`` and the final union write
    would re-execute all ancestor levels (O(depth^2) re-parsing on
    nested archives). Persisted levels are released once the output is
    materialized via ``.unpersist()`` — callers that need the result
    lazily can keep the returned plan; it reads the cached blocks.
    """
    from pyspark import StorageLevel

    persisted: list[DataFrame] = []
    out = extract(df, mode=mode, config=config, repartition=repartition)
    level = (out.withColumn("depth", F.lit(0))
             .persist(StorageLevel.MEMORY_AND_DISK))
    persisted.append(level)
    results = level.drop("children")
    for depth in range(1, max_depth + 1):
        frontier = level.filter(F.size("children") > 0)
        children = (frontier
                    .select("url", F.explode("children").alias("c"))
                    .select(F.concat(F.col("url"), F.lit("!/"),
                                     F.col("c.name")).alias("url"),
                            F.col("c.data").alias("html")))
        if children.isEmpty():
            break
        out = extract(children, mode=mode, config=config,
                      repartition=repartition)
        level = (out.withColumn("depth", F.lit(depth))
                 .persist(StorageLevel.MEMORY_AND_DISK))
        persisted.append(level)
        results = results.unionByName(level.drop("children"))
    # Materialize the union off the cached levels, then drop the cache:
    # the localCheckpoint keeps the result available without re-running
    # any parse stage, and releases executor storage for the parent job.
    results = results.localCheckpoint(eager=True)
    for lv in persisted:
        lv.unpersist()
    return results


def lineage_manifest(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage rows from an extract() output
    (O12: bucket accounting for checkpoint/resume + metrics)."""
    return (extracted
            .groupBy("part_id")
            .agg(F.count("*").alias("n_rows"),
                 F.sum(F.when(F.col("status") == "error", 1)
                       .otherwise(0)).alias("n_err"),
                 F.sum(F.when(F.col("status") == "no_parser", 1)
                       .otherwise(0)).alias("n_no_parser"),
                 F.sum("n_bytes").alias("n_bytes"),
                 F.sum("n_chars").alias("n_chars"),
                 F.min("url").alias("min_url"),
                 F.max("url").alias("max_url"),
                 F.max("batch_ms").alias("max_batch_ms")))
