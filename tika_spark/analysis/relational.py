"""Relational widenings over the event/document tables (SURVEY.md
§2.I): operators Spark lacks as built-ins, composed from DataFrame
primitives so Catalyst keeps planning them.

The reference has no counterpart (it is a per-document extraction
library); these are the query-side ops a crawl/event warehouse runs
next to extraction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              value_cols: list[str] | None = None,
              tolerance: str | None = None) -> DataFrame:
    """As-of join: each ``left`` row picks the latest ``right`` row
    with ``right.ts <= left.ts`` per ``on`` key (DuckDB/kdb ASOF JOIN
    semantics, inner variant is a post-filter).

    Implementation is the **union + window** form, NOT a range join:
    tag both sides, union them, and run ``last(value, ignorenulls)``
    over a window ordered by (ts, side) per key. One shuffle on the
    key, one sort — O(n log n) per key and skew-bounded by the key
    distribution, where the naive ``left.ts >= right.ts`` theta-join
    explodes to O(|L|x|R|) per key at crawl scale. Right rows at the
    exact same timestamp win (side tiebreak orders right before
    left), matching ASOF's <= contract.

    ``value_cols``: right-side columns to carry (default: all but
    key/ts). ``tolerance``: optional max staleness (e.g. "1 hour") —
    matches older than it become NULL.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, ts)]
    lcols = [c for c in left.columns]
    # side 0 = right (dimension), side 1 = left (probe): right sorts
    # first at equal ts so <= matches include same-instant rows
    r = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lcols])
    lf = left.select(
        F.col(on), F.col(ts), F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType)
          .alias(f"__v_{c}") for c in value_cols],
        *[F.col(c).alias(f"__l_{c}") for c in lcols])
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = r.unionByName(lf).select(
        "*",
        *[F.last(f"__v_{c}", ignorenulls=True).over(w)
          .alias(f"__f_{c}") for c in value_cols],
        F.last(F.when(F.col("__side") == 0, F.col(ts)),
               ignorenulls=True).over(w).alias("__match_ts"))
    out = (filled.filter(F.col("__side") == 1)
           .select(*[F.col(f"__l_{c}").alias(c) for c in lcols],
                   *[F.col(f"__f_{c}").alias(c) for c in value_cols],
                   F.col("__match_ts")))
    if tolerance is not None:
        stale = F.col("__match_ts") < \
            F.col(ts) - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *lcols,
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c)
              for c in value_cols],
            "__match_ts")
    return out.drop("__match_ts")


def range_join(events: DataFrame, intervals: DataFrame,
               ts: str = "ts", start: str = "start", end: str = "end",
               key: str | None = None,
               bucket_seconds: int = 3600) -> DataFrame:
    """Interval-containment join: every (event, interval) pair with
    ``start <= ts <= end`` (optionally also matching ``key``).

    A naive ``ts BETWEEN start AND end`` theta-join has no equi-key,
    so Spark plans BroadcastNestedLoopJoin — O(|E|x|I|) and undoable
    at crawl scale. Instead both sides are mapped onto coarse time
    buckets: events to their containing bucket, intervals exploded to
    every bucket they overlap (``sequence`` — bounded by interval
    length / bucket size), then a plain **equi-join on (key, bucket)**
    + exact range filter. Shuffle keys are (key, bucket) — add the
    interval key when present so hot buckets split per key; pick
    ``bucket_seconds`` ≈ median interval length so explosion stays
    O(1) per interval.
    """
    b = F.lit(bucket_seconds)
    ev = events.withColumn(
        "__bucket", (F.unix_timestamp(F.col(ts)) / b).cast("long"))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            (F.unix_timestamp(F.col(start)) / b).cast("long"),
            (F.unix_timestamp(F.col(end)) / b).cast("long"))))
    keys = ["__bucket"] + ([key] if key else [])
    out = (ev.join(iv, keys)
           .filter((F.col(ts) >= F.col(start))
                   & (F.col(ts) <= F.col(end)))
           .drop("__bucket"))
    return out
