"""Deterministic Bloom filters for frontier seen-sets.

No reference counterpart (SURVEY §2.I widening): a crawl frontier at
10^10 URLs answers "have we fetched this?" with a Bloom filter, not
a join against the full URL table — the filter is gigabytes where
the table is terabytes, and it broadcasts.

Everything here is exact integer arithmetic so the filter a cluster
builds is bit-identical to the one a SQL replay builds:

    bit_i(key) = ('0x' + md5(key || '#' + i)[:8]) mod m,  i < k

(the first 8 md5 hex digits as a 32-bit draw — the same derivation
family as `stratified_sample`/`assign_splits`; independence across i
comes from the salt suffix).

Two physical forms:
- **relational** (`build_bits` → distinct `bit_index` rows,
  `probe_bits` → equi-join + count==k): shuffle-friendly, exactly
  SQL-replayable, and how the filter is STORED (a parquet of set
  bits compresses to ~the information content);
- **bitmap** (`to_bitmap` → one numpy array, `probe_bitmap` → a
  pandas-UDF batch probe against the broadcast array): the serving
  form — O(1) per probe, `m/8` bytes resident per executor.

False positives are inherent (and deterministic here); false
negatives are impossible — both properties carry across forms
because the bit derivation is shared.

Scale: `build_bits` is one explode + distinct over keys (k rows per
key, 8-byte values); `to_bitmap` aggregates per-partition bitmaps
OR-wise (driver receives one m/8-byte array per partition tree-
reduce step, not per row).
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module scope: pandas_udf resolves the string
#                      type hints of nested UDFs via __globals__
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _bit_cols(key: F.Column, m_bits: int, k: int) -> F.Column:
    """Array of the k bit indexes for one key (BIGINT, exact)."""
    return F.array(*[
        F.pmod(F.conv(F.substring(
            F.md5(F.concat(key, F.lit(f"#{i}"))), 1, 8), 16, 10)
            .cast("long"), F.lit(m_bits))
        for i in range(k)])


def build_bits(df: DataFrame, key_col: str = "url",
               m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """The filter in relational form: distinct set-bit indexes."""
    return (df.select(F.explode(
        _bit_cols(F.col(key_col), m_bits, k)).alias("bit_index"))
        .distinct())


def probe_bits(df: DataFrame, bits: DataFrame, key_col: str = "url",
               m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Relational probe: a key is maybe-seen iff all k of its bits
    are set. One equi-join on bit_index (the bits side broadcasts
    when the filter is small; bucket both sides on bit_index when it
    is not) + one groupBy key."""
    exploded = df.select(
        F.col(key_col).alias("key"),
        F.explode(_bit_cols(F.col(key_col), m_bits, k))
        .alias("bit_index"))
    hits = (exploded.join(bits, "bit_index")
            .groupBy("key").agg(F.count(F.lit(1)).alias("n_hits")))
    return (df.select(F.col(key_col).alias("key")).distinct()
            .join(hits, "key", "left")
            .select(F.col("key").alias(key_col),
                    (F.coalesce("n_hits", F.lit(0)) == k)
                    .alias("maybe_seen")))


def to_bitmap(bits: DataFrame, m_bits: int = 1 << 20) -> bytes:
    """Materialize the relational form as one bitmap (the serving
    artifact). Per-partition numpy bitmaps OR-merge on the driver —
    O(partitions × m/8) driver bytes, never row-at-a-time."""
    n_bytes = (m_bits + 7) // 8

    def part(rows):
        arr = np.zeros(n_bytes, dtype=np.uint8)
        for r in rows:
            b = r[0]
            arr[b >> 3] |= (1 << (b & 7))
        yield bytes(arr)

    out = np.zeros(n_bytes, dtype=np.uint8)
    for chunk in bits.select("bit_index").rdd.mapPartitions(part) \
            .collect():
        out |= np.frombuffer(chunk, dtype=np.uint8)
    return bytes(out)


def probe_bitmap(df: DataFrame, bitmap: bytes, key_col: str = "url",
                 m_bits: int = 1 << 20, k: int = 5) -> DataFrame:
    """Serving-form probe: broadcast the bitmap, test k bits per key
    in one Arrow batch pass."""
    from pyspark.sql.functions import pandas_udf
    bc = df.sparkSession.sparkContext.broadcast(bitmap)

    @pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        import hashlib
        arr = np.frombuffer(bc.value, dtype=np.uint8)
        out = []
        for key in keys:
            seen = True
            for i in range(k):
                b = int(hashlib.md5(
                    f"{key}#{i}".encode()).hexdigest()[:8], 16) % m_bits
                if not (arr[b >> 3] >> (b & 7)) & 1:
                    seen = False
                    break
            out.append(seen)
        return pd.Series(out)

    return df.withColumn("maybe_seen", probe(F.col(key_col)))


# ---------------------------------------------- count-min sketch --


def _cms_bucket(key: F.Column, row: int, width: int) -> F.Column:
    return F.pmod(F.conv(F.substring(
        F.md5(F.concat(key, F.lit(f"@{row}"))), 1, 8), 16, 10)
        .cast("long"), F.lit(width))


def cms_build(df: DataFrame, key_col: str, width: int = 1 << 14,
              depth: int = 4,
              weight_col: str | None = None) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) in relational
    form: (row, bucket, cnt) counters — the bounded-memory frequency
    structure for heavy-hitter tracking when the exact groupBy's
    key cardinality (10^10 URLs/hosts) exceeds memory budgets.

    Same determinism contract as the Bloom filter: bucket =
    md5(key || '@row') mod width, integer counts — a SQL replay
    builds the identical sketch. depth×width counters total
    (e.g. 4×16384 = 64k rows) regardless of key cardinality; the
    build is one explode + groupBy with map-side combine.
    """
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    rows = [df.select(F.lit(r).alias("row"),
                      _cms_bucket(F.col(key_col), r, width)
                      .alias("bucket"), w.alias("w"))
            for r in range(depth)]
    union = rows[0]
    for other in rows[1:]:
        union = union.unionByName(other)
    return (union.groupBy("row", "bucket")
            .agg(F.sum("w").cast("long").alias("cnt")))


def cms_query(df: DataFrame, sketch: DataFrame, key_col: str,
              width: int = 1 << 14, depth: int = 4) -> DataFrame:
    """Point-frequency estimates: est = min over rows of the key's
    counter (never under-counts; over-counts bounded by eN/width with
    probability 1-(1/2)^depth). The sketch side broadcasts."""
    probes = [df.select(F.col(key_col).alias("key"),
                        F.lit(r).alias("row"),
                        _cms_bucket(F.col(key_col), r, width)
                        .alias("bucket"))
              for r in range(depth)]
    union = probes[0]
    for other in probes[1:]:
        union = union.unionByName(other)
    est = (union.join(F.broadcast(sketch), ["row", "bucket"], "left")
           .groupBy("key")
           .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long")
                .alias("est_count")))
    return est.select(F.col("key").alias(key_col), "est_count")
