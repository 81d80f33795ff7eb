"""Checkpoint/resume batch driver (the spark-submit entry point, H4/O12).

    python -m tika_spark.pipeline.runner \
        --input /path/pages.parquet --output /path/out \
        --mode text-main --buckets 16 [--group-size 4] [--cpus 8]

Partition-range checkpointing: rows are assigned a deterministic
``bucket = pmod(crc32(url), n_buckets)``; buckets are processed in
groups, each group written with dynamic partition overwrite (the
parquet stand-in for Iceberg's overwrite-by-partition commit — the
production target), then acknowledged with one JSON lineage manifest
per bucket under ``<output>/_lineage/``. On restart, buckets with a
manifest are skipped via an anti-join-equivalent pushed-down filter,
so a killed run resumes idempotently: deterministic bucketing + pure
per-row extraction + per-partition overwrite => byte-identical final
snapshot regardless of kill/resume history (tested in
tests/test_pipeline.py::test_resume_after_kill).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from tika_spark.config import ExtractConfig
from tika_spark.pipeline.job import (extract, extract_recursive,
                                     lineage_manifest)


def _lineage_dir(output: str) -> str:
    return os.path.join(output, "_lineage")


def done_buckets(output: str) -> set[int]:
    d = _lineage_dir(output)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("bucket-") and name.endswith(".json"):
            out.add(int(name[len("bucket-"):-len(".json")]))
    return out


def _write_manifest(output: str, bucket: int, payload: dict):
    d = _lineage_dir(output)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".bucket-{bucket}.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, os.path.join(d, f"bucket-{bucket}.json"))  # atomic ack


def run(spark: SparkSession, input_path: str, output: str, mode: str = "text",
        n_buckets: int = 16, group_size: int = 4,
        config: ExtractConfig | None = None, verbose: bool = True,
        recursive: bool = False) -> dict:
    """Execute (or resume) the batch extraction. Returns run metrics."""
    pages = spark.read.parquet(input_path)
    pages = pages.withColumn(
        "bucket", F.pmod(F.crc32(F.col("url")), F.lit(n_buckets)))

    done = done_buckets(output)
    pending = [b for b in range(n_buckets) if b not in done]
    t_start = time.time()
    total_rows = 0

    data_dir = os.path.join(output, "data")
    for g in range(0, len(pending), group_size):
        group = pending[g:g + group_size]
        t0 = time.time()
        # bucket IN (...) prunes at the scan when the source is
        # partitioned by bucket; otherwise it's a pushed-down filter
        subset = pages.filter(F.col("bucket").isin([int(b) for b in group]))
        if recursive:
            extracted = extract_recursive(subset, mode=mode, config=config)
        else:
            # the children binary column never reaches the sink
            extracted = extract(subset, mode=mode,
                                config=config).drop("children")
        # children (url = "parent!/name") bucket by their PARENT url so
        # they land inside this group's partitions — otherwise a later
        # group's dynamic overwrite would clobber them
        root_url = F.substring_index(F.col("url"), "!/", 1)
        with_bucket = extracted.withColumn(
            "bucket", F.pmod(F.crc32(root_url), F.lit(n_buckets)))
        (with_bucket.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("bucket").parquet(data_dir))
        # lineage rows for the group (from the written snapshot so the
        # manifest reflects durable state, not in-flight counts)
        snap = spark.read.parquet(data_dir).filter(
            F.col("bucket").isin([int(b) for b in group]))
        stats = (snap.groupBy("bucket")
                 .agg(F.count("*").alias("n_rows"),
                      F.sum(F.when(F.col("status") == "error", 1)
                            .otherwise(0)).alias("n_err"),
                      F.sum("n_bytes").alias("n_bytes"))).collect()
        wall_ms = (time.time() - t0) * 1000
        found = {row["bucket"] for row in stats}
        for row in stats:
            total_rows += row["n_rows"]
            _write_manifest(output, int(row["bucket"]), {
                "bucket": int(row["bucket"]), "n_rows": row["n_rows"],
                "n_err": row["n_err"], "n_bytes": row["n_bytes"],
                "wall_ms": wall_ms, "attempt": 1,
                "ts": time.time()})
        for b in group:  # empty buckets still need an ack to not re-run
            if b not in found:
                _write_manifest(output, int(b), {
                    "bucket": int(b), "n_rows": 0, "n_err": 0,
                    "n_bytes": 0, "wall_ms": wall_ms, "attempt": 1,
                    "ts": time.time()})
        if verbose:
            print(f"[runner] buckets {group} done in {wall_ms:.0f} ms")

    wall = time.time() - t_start
    metrics = {"buckets_total": n_buckets, "buckets_resumed_from": len(done),
               "rows_processed": total_rows, "wall_sec": wall,
               "docs_per_sec": total_rows / wall if wall > 0 else None}
    if verbose:
        print("[runner]", json.dumps(metrics))
    return metrics


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--mode", default="text",
                   choices=["text", "text-main", "metadata", "xhtml",
                            "detect", "language", "xmp", "json"])
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--group-size", type=int, default=4)
    p.add_argument("--cpus", type=int,
                   default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    p.add_argument("--recursive", action="store_true",
                   help="explode archive/mail members into child rows "
                        "(embedded-document recursion, depth <= 10)")
    args = p.parse_args(argv)

    spark = (SparkSession.builder
             .master(f"local[{args.cpus}]")
             .appName("tika-spark-extract")
             .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    try:
        run(spark, args.input, args.output, args.mode,
            args.buckets, args.group_size, recursive=args.recursive)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
