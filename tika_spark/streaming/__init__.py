"""Structured Streaming ingestion for the extraction pipeline."""

from tika_spark.streaming.ingest import extract_stream

__all__ = ["extract_stream"]
