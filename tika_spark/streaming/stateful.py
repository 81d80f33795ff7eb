"""Streaming stateful operators over the crawl/event stream.

The reference has no streaming surface (SURVEY.md §2.I); these are the
Spark-native widenings a continuously-ingesting extraction fleet
needs, built on Structured Streaming's own state machinery:

- ``windowed_mime_counts``: event-time tumbling-window MIME census
  with a watermark for late pages — the streaming form of the
  ``detect_mime_counts`` batch query. Pure built-ins
  (withWatermark + window + groupBy), so state eviction and late-row
  handling are the engine's, not ours.

- ``sessionize_stream``: gap-based per-key sessionization via
  ``applyInPandasWithState`` (GroupState + processing-time timeout) —
  the custom-stateful-operator pattern: state is (session_start,
  last_ts, n_events); a session closes when the inactivity gap
  exceeds ``gap`` or the state times out between batches. Mirrors the
  batch ``events_sessionize`` query's semantics for in-order data.

Both run identically under ``trigger(availableNow=True)`` for batch
catch-up — which is what the tests drive.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import (GroupState,
                                         GroupStateTimeout)

SESSION_SCHEMA = ("user_id string, session_start timestamp, "
                  "session_end timestamp, n_events long")
_STATE_SCHEMA = "start long, last long, n long"


def windowed_mime_counts(pages_stream: DataFrame,
                         window: str = "10 minutes",
                         watermark: str = "30 minutes") -> DataFrame:
    """Tumbling event-time window counts by detected mime.

    Input: a streaming DataFrame with (warc_ts timestamp,
    mime string) — e.g. the detect-mode output of the ingest stream.
    Late pages beyond the watermark are dropped by the engine; state
    for closed windows is evicted automatically.
    """
    return (pages_stream
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("w"), "mime")
            .agg(F.count("*").cast("long").alias("n"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"), "mime", "n"))


def _make_sessionizer(gap_s: float, timeout_ms: int):
    def fn(key: tuple, batches: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        start, last, n = state.get if state.exists else (None, None, 0)
        if start is not None:
            start, last = start / 1e6, last / 1e6
        closed: list[tuple[Any, Any, Any, int]] = []
        if state.hasTimedOut:
            if n:
                closed.append((user_id, start, last, n))
            state.remove()
        else:
            ts: list[float] = []
            for b in batches:
                ts.extend(t.timestamp() for t in b["ts"])
            for t in sorted(ts):
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_s:
                    closed.append((user_id, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            if n:
                # store microseconds: whole-second truncation would
                # shift cross-batch session bounds vs event time
                state.update((int(round(start * 1e6)),
                              int(round(last * 1e6)), int(n)))
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)
        if closed:
            yield pd.DataFrame(
                [(u, _dt.datetime.fromtimestamp(s, _dt.timezone.utc)
                  .replace(tzinfo=None),
                  _dt.datetime.fromtimestamp(e, _dt.timezone.utc)
                  .replace(tzinfo=None), c)
                 for (u, s, e, c) in closed],
                columns=["user_id", "session_start", "session_end",
                         "n_events"])
    return fn


def sessionize_stream(events_stream: DataFrame,
                      gap: str = "30 minutes",
                      timeout_ms: int | None = 60_000) -> DataFrame:
    """Gap-sessionize a stream of (user_id string, ts timestamp).

    Emits one row per CLOSED session (a new event farther than ``gap``
    after the previous one closes the running session; an idle state
    timeout flushes the remainder). Custom state via
    applyInPandasWithState — the engine checkpoints the per-user
    state tuples with the query.

    ``timeout_ms=None`` disables the idle flush (NoTimeout): only
    gap-closed sessions ever emit. For a replayed static snapshot that
    makes the output a pure function of the data — the deterministic
    configuration the correctness oracle runs.
    """
    gap_s = float(pd.Timedelta(gap).total_seconds())
    conf = (GroupStateTimeout.NoTimeout if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout)
    return (events_stream
            .select("user_id", "ts")
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_sessionizer(gap_s, timeout_ms),
                outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=conf))


# ------------------------------------------------------ streaming dedup


def dedup_stream(docs_stream: DataFrame, ts_col: str = "warc_ts",
                 text_col: str = "text",
                 late: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: keep the first-seen document per
    normalized-text fingerprint, continuously.

    Built on the engine's own streaming-dedup state:
    ``dropDuplicatesWithinWatermark`` on the fingerprint columns keeps
    one state row per distinct fingerprint and **evicts it once the
    event-time watermark passes** — state is bounded by the duplicate
    horizon ``late``, not by the total corpus. (Plain
    ``dropDuplicates`` would never evict: without the event-time
    column in the subset, every fingerprint ever seen stays in the
    state store.) Duplicates recurring beyond the horizon re-emit —
    the right 100 TB trade: exact dedup within the re-crawl window,
    while cross-epoch dedup runs as the batch
    :func:`tika_spark.analysis.dedup.exact_dedup` over the full
    Iceberg table.

    Shuffle carries (fingerprint, ts) + the projected row; the text
    column itself is hashed map-side (xxhash64 + md5 via
    ``fingerprint``'s column expressions) and never keyed on.
    """
    from tika_spark.analysis.textstats import fingerprint
    fp = fingerprint(docs_stream, text_col)
    return (fp.withWatermark(ts_col, late)
              .dropDuplicatesWithinWatermark(["fp_64", "fp_md5"]))


# -------------------------------------------- streaming near-dup


_BUCKET_STATE = "first_id long, n_seen int"
_CAND_SCHEMA = "id_a long, id_b long, band int, bhash long"


def _make_bucket_stater(max_bucket: int, timeout_ms: int | None):
    def stater(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        band, bhash = key
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "band": pd.Series(dtype="int32"),
                 "bhash": pd.Series(dtype="int64")})
            return
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(v) for v in pdf["id"])
        # deterministic under replay: process this batch's arrivals
        # in id order (streams deliver per-batch, not per-row, order)
        ids.sort()
        if state.exists:
            first, n_seen = state.get
        else:
            first, n_seen = ids[0], 0
        out_a, out_b = [], []
        for i in ids:
            if i == first:
                continue
            if n_seen >= max_bucket:
                break  # viral-bucket cap: stop emitting, keep state
            out_a.append(min(first, i))
            out_b.append(max(first, i))
            n_seen += 1
        state.update((first, n_seen))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"id_a": out_a, "id_b": out_b,
                            "band": [band] * len(out_a),
                            "bhash": [bhash] * len(out_a)})
    return stater


def neardup_stream(docs_stream: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 3,
                   num_perm: int = 32, bands: int = 8,
                   max_bucket: int = 1000,
                   timeout_ms: int | None = 3_600_000) -> DataFrame:
    """Streaming near-duplicate candidates: the batch MinHash banded
    LSH (analysis.dedup) as continuous bucket state.

    Each arriving document computes its MinHash signature map-side
    (the identical projection the batch operator uses, so batch and
    stream land documents in identical buckets), explodes into
    (band, bhash) bucket keys, and probes per-bucket GroupState
    holding (first-seen id, emit count): a document landing in a
    non-empty bucket emits a candidate pair against the bucket's
    representative. Downstream verifies candidates exactly (the batch
    verify join in a foreachBatch, or offline).

    Scale contract mirrors the batch operator: state is one tuple per
    distinct bucket (evicted after ``timeout_ms`` idle — the
    duplicate horizon), emissions per bucket capped at ``max_bucket``
    (viral-boilerplate guard), and only (band, bhash, id) ever
    shuffles. Distinct pairs may repeat across bands — dedup
    downstream, as the batch `.distinct()` does.

    Determinism: within one micro-batch a bucket's arrivals are
    processed in id order, so an availableNow replay of a static
    snapshot emits a pure function of the data (the configuration the
    recall check runs).
    """
    from tika_spark.analysis.dedup import (band_hashes,
                                           with_minhash_signature)
    sig = with_minhash_signature(
        docs_stream.select(F.col(id_col).alias("id"),
                           F.col(text_col)),
        text_col, num_perm, k).drop(text_col)
    buckets = sig.select(
        "id", F.posexplode(band_hashes(num_perm, bands))
        .alias("band", "bhash"))
    conf = (GroupStateTimeout.NoTimeout if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout)
    return (buckets
            .groupBy("band", "bhash")
            .applyInPandasWithState(
                _make_bucket_stater(max_bucket, timeout_ms),
                outputStructType=_CAND_SCHEMA,
                stateStructType=_BUCKET_STATE,
                outputMode="append",
                timeoutConf=conf))
