"""CDX indexing of WARC/WET shards: per-record (urlkey, offset,
length, digest) rows.

No reference counterpart (SURVEY §2.I widening) — the Common-Crawl
access layer: a CDX index is what makes a petabyte of .warc.gz
random-accessible (fetch = HTTP range read of [offset, offset+length)
then gunzip one member). CC publishes exactly this index beside every
crawl; pywb/OpenWayback consume it.

- ``urlkey`` is a SURT key (pywb convention, simplified): scheme
  dropped, host lowercased with a leading ``www.`` stripped and its
  labels reversed comma-joined, then ``)/`` + path and raw query —
  e.g. ``http://www.Ex.com/a/b?q=1`` → ``com,ex)/a/b?q=1``. (Full
  pywb canonicalization also sorts/strips query params; that layer
  is deliberately omitted and documented.)
- ``offset``/``clength`` frame the gzip member inside the shard —
  found by actually inflating member-at-a-time (zlib ``unused_data``
  marks the boundary), with resync-at-next-magic on corrupt gaps,
  the same fault posture as the WARC reader.
- ``digest`` is the hex sha256 of the record's payload (HTTP
  envelope stripped for ``response`` records; ``conversion``/WET
  bodies digest as-is) — CC uses sha1-b32; sha256 keeps the whole
  repo on one hash family and is what the SQL oracle can replay.

Scale: one mapInPandas over shard blobs; emitted rows are index
strings only — the payloads never leave the stage.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator
from urllib.parse import urlsplit

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_MAX_MEMBER = 256 << 20     # same per-member inflate cap as warc.py


def surt_key(url: str) -> str:
    """Simplified SURT canonical key (see module docstring)."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.lower()
    host = (parts.hostname or "").lower()
    if host.startswith("www."):
        host = host[4:]
    key = ",".join(reversed(host.split("."))) if host else ""
    path = parts.path or "/"
    q = f"?{parts.query}" if parts.query else ""
    return f"{key}){path}{q}"


def iter_members_with_offsets(
        data: bytes) -> Iterator[tuple[int, int, bytes | None]]:
    """(offset, compressed_length, inflated_bytes | None) per gzip
    member; ``None`` payload for a corrupt/oversized gap (resyncs at
    the next gzip magic)."""
    view = memoryview(data)
    pos = 0
    n = len(view)
    while pos < n:
        if not (view[pos] == 0x1F and pos + 1 < n
                and view[pos + 1] == 0x8B):
            # corrupt gap: scan to the next magic
            nxt = bytes(view[pos:]).find(b"\x1f\x8b", 1)
            gap_end = n if nxt < 0 else pos + nxt
            yield (pos, gap_end - pos, None)
            pos = gap_end
            continue
        d = zlib.decompressobj(31)
        out = bytearray()
        p = pos
        ok = True
        try:
            while not d.eof and p < n:
                chunk = view[p:p + (1 << 20)]
                p += len(chunk)
                out += d.decompress(chunk, _MAX_MEMBER - len(out))
                while d.unconsumed_tail and len(out) < _MAX_MEMBER:
                    out += d.decompress(d.unconsumed_tail,
                                        _MAX_MEMBER - len(out))
                if (d.unconsumed_tail or
                        (not d.eof and len(out) >= _MAX_MEMBER)):
                    ok = False          # over-cap member
                    break
            if not d.eof:
                ok = False              # truncated member
        except zlib.error:
            ok = False
        if ok:
            clen = (p - pos) - len(d.unused_data)
            yield (pos, clen, bytes(out))
            pos += clen
        else:
            nxt = bytes(view[pos + 2:]).find(b"\x1f\x8b")
            gap_end = n if nxt < 0 else pos + 2 + nxt
            yield (pos, gap_end - pos, None)
            pos = gap_end


def _payload_of(rec: dict) -> bytes:
    body = rec["body"]
    if rec["type"] == "response" and body[:5] == b"HTTP/":
        sep = body.find(b"\r\n\r\n")
        if sep >= 0:
            body = body[sep + 4:]
    return body


def cdx_records(data: bytes) -> list[dict]:
    """CDX rows for one shard blob."""
    from tika_spark.sources.warc import parse_record
    out = []
    for offset, clen, member in iter_members_with_offsets(data):
        if member is None:
            continue
        rec = parse_record(member)
        if rec is None or not rec.get("url"):
            continue
        payload = _payload_of(rec)
        out.append({
            "urlkey": surt_key(rec["url"]), "url": rec["url"],
            "rec_type": rec["type"], "warc_date": rec["date"],
            "offset": offset, "clength": clen,
            "digest": hashlib.sha256(payload).hexdigest(),
        })
    return out


CDX_SCHEMA = ("shard string, urlkey string, url string, "
              "rec_type string, warc_date string, offset long, "
              "clength long, digest string")


def cdx_index(shards: DataFrame, shard_col: str = "shard",
              blob_col: str = "blob") -> DataFrame:
    """Index every shard blob: one row per readable WARC record."""
    slim = shards.select(shard_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "urlkey", "url", "rec_type", "warc_date",
                "offset", "clength", "digest"]
        for pdf in batches:
            rows = []
            for shard, blob in zip(pdf[shard_col], pdf[blob_col]):
                try:
                    recs = cdx_records(bytes(blob or b""))
                except Exception:
                    continue    # poison shard: zero rows
                for r in recs:
                    rows.append({"shard": shard, **r})
            yield pd.DataFrame(rows, columns=cols)

    return slim.mapInPandas(run, schema=CDX_SCHEMA)


def zst_cdx_records(data: bytes) -> list[dict]:
    """CDX rows for one ``.warc.zst`` shard, frame-addressed: frame
    spans come from header arithmetic (warc.zstd_frame_end — no
    decompression to find boundaries), each data frame decodes once
    against the shard's IIPC dictionary frame to enumerate its
    records. A row addresses a record as (frame_off, frame_len,
    rec_idx) plus the dictionary span (dict_off, dict_len; 0,0 when
    the shard has none) — everything a range fetcher needs."""
    from tika_spark.analysis.zstdcodec import (ZSTD_MAGIC, decompress,
                                               parse_dict)
    from tika_spark.sources.warc import (_zstd_frame_dict_id,
                                         parse_record,
                                         split_warc_records,
                                         zstd_frame_end)
    out: list[dict] = []
    pos = 0
    zdict = None
    dict_off = dict_len = 0
    n = len(data)
    while pos < n:
        try:
            end = zstd_frame_end(data, pos)
        except ValueError:
            break
        if end is None:
            break
        frame = data[pos:end]
        magic = int.from_bytes(frame[:4], "little")
        if 0x184D2A50 <= magic <= 0x184D2A5F:
            if magic == 0x184D2A5D and len(frame) > 8:
                blob = frame[8:]
                try:
                    if blob[:4] == ZSTD_MAGIC:
                        blob = decompress(blob, max_out=_MAX_MEMBER)
                    zdict = parse_dict(blob)
                    dict_off, dict_len = pos, end - pos
                except ValueError:
                    zdict = None
            pos = end
            continue
        try:
            raw = decompress(
                frame, max_out=_MAX_MEMBER,
                zdict=zdict if _zstd_frame_dict_id(frame) else None)
        except ValueError:
            pos = end
            continue
        for ri, recb in enumerate(split_warc_records(raw)):
            rec = parse_record(recb)
            if rec is None or not rec.get("url"):
                continue
            payload = _payload_of(rec)
            out.append({
                "urlkey": surt_key(rec["url"]), "url": rec["url"],
                "rec_type": rec["type"], "warc_date": rec["date"],
                "frame_off": pos, "frame_len": end - pos,
                "rec_idx": ri, "dict_off": dict_off,
                "dict_len": dict_len,
                "digest": hashlib.sha256(payload).hexdigest(),
            })
        pos = end
    return out


ZST_CDX_SCHEMA = ("shard string, urlkey string, url string, "
                  "rec_type string, warc_date string, "
                  "frame_off long, frame_len long, rec_idx int, "
                  "dict_off long, dict_len long, digest string")


def cdx_index_zst(shards: DataFrame, shard_col: str = "shard",
                  blob_col: str = "blob") -> DataFrame:
    """Frame-addressed CDX index over ``.warc.zst`` shard blobs —
    the zstd sibling of :func:`cdx_index`, making dictionary-
    compressed archives range-readable too."""
    slim = shards.select(shard_col, blob_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["shard", "urlkey", "url", "rec_type", "warc_date",
                "frame_off", "frame_len", "rec_idx", "dict_off",
                "dict_len", "digest"]
        for pdf in batches:
            rows = []
            for shard, blob in zip(pdf[shard_col], pdf[blob_col]):
                try:
                    recs = zst_cdx_records(bytes(blob or b""))
                except Exception:
                    continue
                for r in recs:
                    rows.append({"shard": shard, **r})
            yield pd.DataFrame(rows, columns=cols)

    return slim.mapInPandas(run, schema=ZST_CDX_SCHEMA)


def cdx_fetch_zst(index: DataFrame, path_col: str = "path"
                  ) -> DataFrame:
    """Range-fetch records from ``.warc.zst`` shards by a
    :func:`cdx_index_zst` row: read [dict_off, dict_off+dict_len)
    once per shard (parsed dictionary cached per open path), read
    [frame_off, frame_off+frame_len), decompress the ONE frame,
    split, take ``rec_idx``. Same posture as :func:`cdx_fetch`:
    shards open once per consecutive path run, bad rows yield
    status rows, only requested byte ranges are read."""
    from tika_spark.analysis.zstdcodec import (ZSTD_MAGIC, decompress,
                                               parse_dict)
    from tika_spark.sources.warc import (_zstd_frame_dict_id,
                                         parse_record,
                                         split_warc_records)
    slim = index.select(path_col, "frame_off", "frame_len",
                        "rec_idx", "dict_off", "dict_len")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path", "url", "rec_type", "payload", "status"]
        open_path, f = None, None
        zdict_key, zdict = None, None
        for pdf in batches:
            rows = []
            for path, fo, fl, ri, do, dl in zip(
                    pdf[path_col], pdf["frame_off"],
                    pdf["frame_len"], pdf["rec_idx"],
                    pdf["dict_off"], pdf["dict_len"]):
                row = {"path": path, "url": "", "rec_type": "",
                       "payload": b"", "status": "fetch_error"}
                try:
                    if path != open_path:
                        if f is not None:
                            f.close()
                        f = _open_file(str(path))
                        open_path = path
                        zdict_key = None
                    if int(dl) > 0 and zdict_key != (path, int(do)):
                        f.seek(int(do))
                        dframe = f.read(int(dl))
                        blob = dframe[8:]
                        if blob[:4] == ZSTD_MAGIC:
                            blob = decompress(blob,
                                              max_out=_MAX_MEMBER)
                        zdict = parse_dict(blob)
                        zdict_key = (path, int(do))
                    elif int(dl) == 0:
                        zdict, zdict_key = None, None
                    f.seek(int(fo))
                    frame = f.read(int(fl))
                    raw = decompress(
                        frame, max_out=_MAX_MEMBER,
                        zdict=zdict if _zstd_frame_dict_id(frame)
                        else None)
                    recs = split_warc_records(raw)
                    rec = parse_record(recs[int(ri)])
                    if rec is not None:
                        row.update(url=rec["url"],
                                   rec_type=rec["type"],
                                   payload=_payload_of(rec),
                                   status="ok")
                except Exception:
                    if f is not None:
                        try:
                            f.close()
                        except Exception:
                            pass
                    open_path, f = None, None
                    zdict_key, zdict = None, None
                rows.append(row)
            if f is not None:
                f.close()
                open_path, f = None, None
            yield pd.DataFrame(rows, columns=cols)

    return slim.mapInPandas(run, schema=FETCH_SCHEMA)


def _open_file(path: str):
    """Random-access (seekable) pyarrow file for any FS scheme."""
    from pyarrow import fs as pafs
    if path.startswith("file:"):
        local = path[5:]
        while local.startswith("//"):
            local = local[1:]
        return pafs.LocalFileSystem().open_input_file(local)
    if "://" not in path:
        return pafs.LocalFileSystem().open_input_file(path)
    filesystem, p = pafs.FileSystem.from_uri(path)
    return filesystem.open_input_file(p)


FETCH_SCHEMA = ("path string, url string, rec_type string, "
                "payload binary, status string")


def cdx_fetch(index: DataFrame, path_col: str = "path",
              offset_col: str = "offset",
              clength_col: str = "clength") -> DataFrame:
    """Range-fetch the records a CDX index points at: per row, open
    the shard, seek to ``offset``, read ``clength`` bytes, gunzip the
    one member, parse — the petabyte-archive random-access pattern
    (an HTTP Range read against s3/hdfs in production; pyarrow's
    seekable file here).

    Efficiency at scale: rows are grouped per (partition, path) so a
    shard opens once per task; sort/repartition the index by path
    upstream to maximize that reuse. Only the requested byte ranges
    are ever read — a 1 GB shard costs what its fetched members cost.
    Failure posture: a bad offset/corrupt member yields a status row
    (`fetch_error`), never a task failure (H1)."""
    import gzip as _gzip

    from tika_spark.sources.warc import parse_record
    slim = index.select(path_col, offset_col, clength_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["path", "url", "rec_type", "payload", "status"]
        for pdf in batches:
            rows = []
            order = pdf.sort_values(path_col)
            open_path, f = None, None
            for path, off, clen in zip(order[path_col],
                                       order[offset_col],
                                       order[clength_col]):
                row = {"path": path, "url": "", "rec_type": "",
                       "payload": None, "status": "fetch_error"}
                try:
                    if path != open_path:
                        if f is not None:
                            f.close()
                        f = _open_file(str(path))
                        open_path = path
                    f.seek(int(off))
                    member = _gzip.decompress(f.read(int(clen)))
                    rec = parse_record(member)
                    if rec is not None:
                        row.update(url=rec["url"],
                                   rec_type=rec["type"],
                                   payload=_payload_of(rec),
                                   status="ok")
                except Exception:
                    if f is not None:
                        try:  # don't leak the fd (or the object-store
                            f.close()  # connection behind it)
                        except Exception:
                            pass
                    open_path, f = None, None
                rows.append(row)
            if f is not None:
                f.close()
            yield pd.DataFrame(rows, columns=cols)

    return slim.mapInPandas(run, schema=FETCH_SCHEMA)


def revisit_census(records: DataFrame, digest_col: str = "digest",
                   date_col: str = "warc_date",
                   url_col: str = "url") -> DataFrame:
    """WARC revisit semantics over an index of records: the first
    capture of each payload digest is the original; every later
    capture of the same digest is a ``revisit`` (what a conformant
    writer would store as a WARC ``revisit`` record pointing at the
    original — the archive-side exact-dedup that keeps recurring
    crawls from storing unchanged pages twice).

    Adds per record:

      capture_idx  1-based capture order within the digest, by
                   (date, url) — deterministic given unique pairs
      is_revisit   capture_idx > 1
      n_copies     captures sharing the digest

    Scale: one digest-keyed window (row_number + count over the same
    partitioning — a single hash shuffle on the 32-byte digest; the
    payloads themselves never move).
    """
    from pyspark.sql import Window
    w = Window.partitionBy(digest_col).orderBy(
        F.asc(date_col), F.asc(url_col))
    wall = Window.partitionBy(digest_col)
    return (records
            .withColumn("capture_idx",
                        F.row_number().over(w).cast("long"))
            .withColumn("is_revisit", F.col("capture_idx") > 1)
            .withColumn("n_copies",
                        F.count(F.lit(1)).over(wall).cast("long")))


def main(argv=None):
    """CLI: index a directory of .warc[.wet].gz shards to parquet.

        python -m tika_spark.sources.cdx --input <dir> --output <dir>
    """
    import argparse
    import os

    from pyspark.sql import SparkSession
    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--glob", default="*.gz")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args(argv)
    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("tika-spark-cdx")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .getOrCreate())
    try:
        shards = (spark.read.format("binaryFile")
                  .option("pathGlobFilter", args.glob).load(args.input)
                  .select(F.col("path").alias("shard"),
                          F.col("content").alias("blob")))
        out = cdx_index(shards)
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(f"[cdx] {n} records -> {args.output}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
