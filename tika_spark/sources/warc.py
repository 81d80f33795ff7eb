"""WARC ingestion — the Common-Crawl entry format, as a Spark source.

This is the step upstream of everything else in this repo: turning raw
crawl archives into the ``(url, warc_ts, html)`` pages table the
extraction job consumes. The reference ingests per-stream (its
``Fetcher`` SPI hands each captured stream to ``AutoDetectParser``);
here the whole crawl is one DataFrame job:

    pages = read_warc(spark, "s3://crawl/segments/*.warc.gz")
    out   = tika_spark.extract(pages, mode="text-main")

Format notes (WARC 1.0 / ISO 28500, Common-Crawl layout): a
``.warc.gz`` is a concatenation of independently-gzipped members, one
record per member. A record is ``WARC/1.0 CRLF`` + headers + CRLFCRLF
+ ``Content-Length`` bytes of content + CRLFCRLF. ``response``
records hold an HTTP/1.1 envelope; the page body follows the HTTP
headers' first CRLFCRLF.

Scale (100 TB): one CC crawl is ~90k files x ~1 GB — file-granular
parallelism is ample, so ingest is ``binaryFile`` scan →
``mapInPandas`` over whole files. Each file is decompressed
member-by-member in a single streaming pass (``zlib`` with
``unused_data`` chaining — bounded by one record in memory, never the
inflated file). Malformed members/records become ``status`` rows
instead of poisoning the file (H1 fault isolation, same philosophy as
the extraction stages). The emitted binary column feeds the job's
size-bucketed write directly, so page bytes shuffle zero times
between the archive and the parser.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_date string, warc_ts timestamp, "
                "html binary, declared_type string, status string")

_MAX_HEADER = 64 * 1024  # bound a malformed record's header scan
_CRLF = b"\r\n"


# ------------------------------------------------- record builders --
# (shared by the WET sink below and the fixtures.warcgen builder)


def build_record(url: str, date_iso: str, payload: bytes,
                 rec_type: str = "response",
                 http_content_type: str = "text/html; charset=utf-8",
                 record_id: str | None = None) -> bytes:
    """One plain (uncompressed) WARC record per the ISO 28500 grammar.

    ``response`` records wrap the payload in an HTTP/1.1 envelope like
    a crawl capture; ``conversion`` records (the WET layout) carry
    text/plain bare; anything else carries the payload bare as
    octet-stream. Ends with the grammar's CRLFCRLF separator.
    """
    if rec_type == "response":
        body = (b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: " + http_content_type.encode("ascii")
                + _CRLF
                + b"Content-Length: " + str(len(payload)).encode("ascii")
                + _CRLF + _CRLF + payload)
        content_type = b"application/http; msgtype=response"
    else:
        body = payload
        content_type = (b"text/plain" if rec_type == "conversion"
                        else b"application/octet-stream")
    # header values must not contain CR/LF (a crafted url column
    # could otherwise inject/override WARC headers in the egress)
    def _hv(s: str) -> str:
        return s.replace("\r", "").replace("\n", "")
    url, date_iso = _hv(url), _hv(date_iso)
    # content-derived id: str hash() is salted per-process
    # (PYTHONHASHSEED), which would break the byte-identical-archive
    # guarantee across runs/executors; the date is mixed in so the
    # same url at two capture times gets distinct (WARC-required
    # globally unique) ids while staying deterministic
    rid = record_id or "<urn:uuid:{}>".format(
        hashlib.md5((url + "\n" + date_iso).encode("utf-8"))
        .hexdigest()[:16])
    head = (b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + rec_type.encode("ascii") + _CRLF
            + b"WARC-Record-ID: " + _hv(rid).encode("ascii") + _CRLF
            + b"WARC-Date: " + date_iso.encode("ascii") + _CRLF
            + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
            + b"Content-Type: " + content_type + _CRLF
            + b"Content-Length: " + str(len(body)).encode("ascii")
            + _CRLF + _CRLF)
    return head + body + _CRLF + _CRLF


def gzip_member(record: bytes) -> bytes:
    """One record, one gzip member, mtime pinned so identical inputs
    are byte-identical archives."""
    import gzip
    import io
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


_INFLATE_CHUNK = 1 << 20
_MAX_MEMBER = 256 << 20    # per-member inflate cap (gzip-bomb guard)
_GZ_MAGIC = b"\x1f\x8b\x08"


def iter_gzip_members(data: bytes) -> Iterator[bytes | None]:
    """Decompress a concatenation of gzip members one member at a
    time (the CC per-record framing).

    Fault isolation: a corrupt/truncated/oversized member does NOT
    discard the rest of the file — the scanner yields ``None`` once
    per corrupt gap (callers surface it as a status row) and resyncs
    at the next gzip magic. Per-member inflated size is capped at
    ``_MAX_MEMBER`` (zip-bomb guard, same philosophy as the output
    guards): an over-cap member counts as corrupt.

    The input is walked through a ``memoryview`` in bounded chunks —
    zero-copy slices, O(filesize) total work. (Feeding
    ``data[pos:]`` per member would re-copy the remaining tail for
    every one of a CC file's ~50k members: O(members × filesize) in
    memcpy.)
    """
    view = memoryview(data)
    pos, n = 0, len(data)
    in_gap = False  # collapse a run of resync failures to one None
    while pos < n:
        dec = zlib.decompressobj(wbits=31)
        out: list[bytes] = []
        total = 0
        p = pos
        failed = False
        try:
            while p < n and not dec.eof:
                if total >= _MAX_MEMBER:
                    # at-cap with input left: zlib treats
                    # max_length=0 as UNLIMITED, so never call
                    # decompress with an exhausted budget — a member
                    # that lands exactly on the cap and still has
                    # bytes to inflate is over-cap by definition
                    failed = True
                    break
                chunk = view[p:p + _INFLATE_CHUNK]
                piece = dec.decompress(chunk, _MAX_MEMBER - total)
                out.append(piece)
                total += len(piece)
                if dec.unconsumed_tail:   # inflate cap exceeded
                    failed = True
                    break
                p += len(chunk)
        except zlib.error:
            failed = True
        if failed or not dec.eof:
            if not in_gap:
                in_gap = True
                yield None
            nxt = data.find(_GZ_MAGIC, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        in_gap = False
        yield b"".join(out)
        consumed = (p - len(dec.unused_data)) - pos
        if consumed <= 0:
            return
        pos += consumed


def parse_record(raw: bytes) -> dict | None:
    """One plain WARC record → {type, url, date, body} (content block
    only, HTTP envelope not yet stripped). None if the member is not
    a WARC record."""
    if not raw.startswith(b"WARC/"):
        return None
    head_end = raw.find(b"\r\n\r\n", 0, _MAX_HEADER)
    if head_end < 0:
        return None
    headers: dict[str, str] = {}
    for line in raw[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        if _:
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
    try:
        length = int(headers.get("content-length", ""))
        body = raw[head_end + 4:head_end + 4 + length]
    except ValueError:
        # tolerate a missing/garbled Content-Length: member framing
        # bounds the record, but the grammar's trailing CRLFCRLF
        # separator must not leak into the body
        body = raw[head_end + 4:]
        if body.endswith(b"\r\n\r\n"):
            body = body[:-4]
    return {"type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "body": body}


def http_body(content: bytes) -> bytes:
    """Strip the HTTP/1.1 envelope of a response record's content
    block (body starts after the first CRLFCRLF; a content block that
    does not look like HTTP is returned whole)."""
    return http_parts(content)[1]


def http_parts(content: bytes) -> tuple[str | None, bytes]:
    """(content_type, body) of an HTTP/1.1 response block. The
    Content-Type header is the crawl server's declared type — the
    same detection *hint* the reference lifts into Metadata
    (``TikaInputStream``/HttpHeaders); it seeds, never overrides, the
    magic-byte detector downstream."""
    if not content.startswith(b"HTTP/"):
        return None, content
    sep = content.find(b"\r\n\r\n", 0, _MAX_HEADER)
    if sep < 0:
        return None, content
    ctype = None
    for line in content[:sep].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        if _ and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return ctype, content[sep + 4:]


def warc_pages(data: bytes) -> Iterator[dict]:
    """All response-record pages of one ``.warc.gz`` blob. Non-response
    records (warcinfo, request, metadata) are skipped silently — they
    are expected structure, not faults; members that fail to parse as
    WARC yield a status row."""
    for member in iter_gzip_members(data):
        rec = parse_record(member) if member is not None else None
        if rec is None:
            yield {"url": "", "warc_date": "", "html": None,
                   "declared_type": None,
                   "status": "warc_malformed_member"}
            continue
        if rec["type"] != "response":
            continue
        ctype, body = http_parts(rec["body"])
        yield {"url": rec["url"], "warc_date": rec["date"],
               "html": body, "declared_type": ctype, "status": "ok"}


_PAGES_PER_CHUNK = 1024


def _pages_frame(rows: list[dict]) -> pd.DataFrame:
    out = pd.DataFrame(
        rows, columns=["url", "warc_date", "html",
                       "declared_type", "status"])
    # tz-aware UTC: Arrow then stores the true instant regardless of
    # spark.sql.session.timeZone (naive values would be reinterpreted
    # in the session zone on non-UTC clusters)
    out["warc_ts"] = pd.to_datetime(
        out["warc_date"], format="ISO8601", errors="coerce", utc=True)
    return out[["url", "warc_date", "warc_ts", "html",
                "declared_type", "status"]]


def _blobs_to_pages(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
    # yield in bounded chunks: peak memory is _PAGES_PER_CHUNK pages,
    # not the whole inflated file (a 1 GB CC archive inflates ~4-5x)
    rows: list[dict] = []
    for pdf in batches:
        for blob in pdf["content"]:
            for page in warc_pages(bytes(blob or b"")):
                rows.append(page)
                if len(rows) >= _PAGES_PER_CHUNK:
                    yield _pages_frame(rows)
                    rows = []
    if rows:
        yield _pages_frame(rows)


def to_wet(df: DataFrame, url_col: str = "url",
           text_col: str = "text",
           date_iso: str = "1970-01-01T00:00:00Z") -> DataFrame:
    """Extraction output → WET blobs (the Common-Crawl extracted-text
    egress: WARC ``conversion`` records, UTF-8 text/plain, one gzip
    member per record). One blob per Arrow batch, so a downstream
    binary-file sink writes CC-shaped ``.warc.wet.gz`` shards whose
    size follows the batch size — no driver collect, no reshuffle of
    the text column beyond what the caller already arranged."""
    cols = df.select(F.col(url_col).alias("u"),
                     F.col(text_col).alias("t"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blob = b"".join(
                gzip_member(build_record(
                    u or "", date_iso, (t or "").encode("utf-8"),
                    rec_type="conversion"))
                for u, t in zip(pdf["u"], pdf["t"]))
            yield pd.DataFrame({"blob": [blob]})

    return cols.mapInPandas(build, "blob binary")


def wet_texts(data: bytes) -> Iterator[dict]:
    """Parse a WET blob back into ``{url, warc_date, text, status}``
    rows (conversion records; UTF-8 with replacement on decode)."""
    for member in iter_gzip_members(data):
        rec = parse_record(member) if member is not None else None
        if rec is None:
            yield {"url": "", "warc_date": "", "text": "",
                   "status": "warc_malformed_member"}
            continue
        if rec["type"] != "conversion":
            continue
        yield {"url": rec["url"], "warc_date": rec["date"],
               "text": rec["body"].decode("utf-8", "replace"),
               "status": "ok"}


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``.warc.gz`` files → pages DataFrame
    ``(url, warc_date, warc_ts, html, status)``.

    ``binaryFile`` gives one row per file; parallelism = file count
    (ample for CC's ~90k files/crawl). The per-file parse streams
    gzip members and yields output in ``_PAGES_PER_CHUNK``-page
    frames, so peak memory is one bounded chunk of inflated pages
    (plus the compressed blob binaryFile already materialized), never
    the whole inflated file; a single member inflates at most
    ``_MAX_MEMBER`` bytes (bomb guard).
    """
    blobs = (spark.read.format("binaryFile").load(path)
             .select("content"))
    return blobs.mapInPandas(_blobs_to_pages, PAGES_SCHEMA)


_BINARYFILE_SCHEMA = ("path string, modificationTime timestamp, "
                      "length long, content binary")


def stream_warc(spark: SparkSession, path: str,
                max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming variant of :func:`read_warc` for a live crawl drop
    directory: each newly-arrived ``.warc.gz`` becomes pages rows on
    the next trigger. Compose with ``writeStream`` (or
    ``streaming.ingest`` for the exactly-once foreachBatch extract).

    ``max_files_per_trigger`` bounds per-batch work (1 GB files →
    keep it near the executor count so a trigger is one wave).
    """
    reader = spark.readStream.format("binaryFile") \
        .schema(_BINARYFILE_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    blobs = reader.load(path).select("content")
    return blobs.mapInPandas(_blobs_to_pages, PAGES_SCHEMA)
