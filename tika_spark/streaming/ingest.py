"""Streaming ingestion: continuous extraction over an arriving crawl.

The reference is strictly batch per-document (SURVEY.md §2.I — no
streaming operators exist in Tika); this module is the Spark-native
widening: the same staged extraction job run incrementally as new page
files land, with exactly-once progress tracked by the Structured
Streaming checkpoint (offsets + file index), complementing the batch
runner's bucket manifests (pipeline/runner.py).

Design:
- file source (`readStream.parquet`) with `maxFilesPerTrigger` as the
  ingestion rate limiter — each micro-batch is a bounded slice of
  pages, so executor memory is insensitive to backlog size;
- `foreachBatch` applies the identical ``extract()`` DataFrame job —
  one code path for batch and streaming (no semantic drift);
- append-mode parquet/Iceberg sink partitioned like the batch runner;
- no watermarks/stateful ops needed: extraction is per-row pure, so
  the pipeline is trivially exactly-once under the checkpoint.

``trigger_available_now=True`` drains the current backlog and stops —
the batch-catchup mode (and what the tests use).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from tika_spark.config import ExtractConfig
from tika_spark.pipeline.job import extract


def extract_stream(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str, mode: str = "text",
                   schema: str = ("url string, warc_ts timestamp, "
                                  "html binary"),
                   max_files_per_trigger: int = 16,
                   config: ExtractConfig | None = None,
                   trigger_available_now: bool = False):
    """Start (and return) the streaming query. Caller owns lifecycle
    (``.awaitTermination()`` / ``.stop()``)."""
    pages = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .parquet(input_dir))

    def process(batch_df, batch_id: int):
        out = extract(batch_df, mode=mode, config=config)
        (out.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append").parquet(output_dir))

    writer = (pages.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
