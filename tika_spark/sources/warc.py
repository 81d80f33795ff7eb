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
parallelism is ample, so ingest is a ``binaryFile`` PATH listing →
``mapInPandas`` that opens each file via ``pyarrow.fs`` and streams
it. Each file is decompressed member-by-member in a single streaming
pass (``zlib`` with ``unused_data`` chaining), so peak task memory is
O(largest member) — one input chunk + one inflating record + one
output frame — never the compressed blob and never the inflated file
(the whole-blob shape would cost file_bytes + largest member per
task on 1 GB segments). Malformed members/records become ``status``
rows instead of poisoning the file (H1 fault isolation, same
philosophy as the extraction stages). The emitted binary column feeds
the job's size-bucketed write directly, so page bytes shuffle zero
times between the archive and the parser.
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
                 record_id: str | None = None,
                 http_status: int = 200,
                 http_headers: tuple = ()) -> bytes:
    """One plain (uncompressed) WARC record per the ISO 28500 grammar.

    ``response`` records wrap the payload in an HTTP/1.1 envelope like
    a crawl capture; ``conversion`` records (the WET layout) carry
    text/plain bare; anything else carries the payload bare as
    octet-stream. Ends with the grammar's CRLFCRLF separator.
    """
    if rec_type == "response":
        body = (b"HTTP/1.1 " + str(http_status).encode("ascii")
                + b" OK" + _CRLF
                + b"Content-Type: " + http_content_type.encode("ascii")
                + _CRLF
                + b"".join(k.encode("ascii") + b": "
                           + v.encode("ascii") + _CRLF
                           for k, v in http_headers)
                + b"Content-Length: " + str(len(payload)).encode("ascii")
                + _CRLF + _CRLF + payload)
        content_type = b"application/http; msgtype=response"
    else:
        body = payload
        content_type = (b"text/plain" if rec_type == "conversion"
                        else b"application/json"
                        if rec_type == "metadata"      # WAT layout
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


# compressed bytes of the CURRENT member retained for corrupt-member
# resync; CC members are ~100 KB-1 MB compressed, so this never binds
# in practice — a pathological member larger than the retention simply
# resyncs from the current stream position instead of its own start
_RESYNC_RETAIN = 64 << 20


def iter_gzip_members_from(read) -> Iterator[bytes | None]:
    """Decompress a concatenation of gzip members one member at a
    time (the CC per-record framing) from a ``read(n)`` callable.

    Fault isolation: a corrupt/truncated/oversized member does NOT
    discard the rest of the file — the scanner yields ``None`` once
    per corrupt gap (callers surface it as a status row) and resyncs
    at the next gzip magic. Per-member inflated size is capped at
    ``_MAX_MEMBER`` (zip-bomb guard, same philosophy as the output
    guards): an over-cap member counts as corrupt.

    Memory envelope (the 100 TB contract): at any instant the scanner
    holds one input chunk, the inflating member's OUTPUT
    (<= ``_MAX_MEMBER``), and the current member's compressed bytes
    up to ``_RESYNC_RETAIN`` — i.e. O(largest member), NEVER O(file).
    A 1 GB Common-Crawl segment therefore streams through a task in
    ~single-megabyte working memory instead of needing the whole blob
    materialized.
    """
    buf = b""           # compressed bytes not yet fed to the inflater
    eof_in = False

    def fill() -> bool:
        nonlocal buf, eof_in
        if eof_in:
            return False
        chunk = read(_INFLATE_CHUNK)
        if not chunk:
            eof_in = True
            return False
        buf += bytes(chunk)
        return True

    in_gap = False  # collapse a run of resync failures to one None
    while buf or fill():
        dec = zlib.decompressobj(wbits=31)
        out: list[bytes] = []
        total = 0
        fed = bytearray()   # this member's compressed bytes (resync)
        failed = False
        try:
            while not dec.eof:
                if total >= _MAX_MEMBER:
                    # at-cap with input left: zlib treats
                    # max_length=0 as UNLIMITED, so never call
                    # decompress with an exhausted budget — a member
                    # that lands exactly on the cap and still has
                    # bytes to inflate is over-cap by definition
                    failed = True
                    break
                if not buf and not fill():
                    break       # truncated trailing member
                chunk, buf = buf, b""
                if len(fed) < _RESYNC_RETAIN:
                    fed += chunk
                piece = dec.decompress(chunk, _MAX_MEMBER - total)
                out.append(piece)
                total += len(piece)
                if dec.unconsumed_tail:   # inflate cap exceeded
                    failed = True
                    break
        except zlib.error:
            failed = True
        if not failed and dec.eof:
            in_gap = False
            yield b"".join(out)
            buf = dec.unused_data + buf
            continue
        if not in_gap:
            in_gap = True
            yield None
        # resync: scan for the next gzip magic from one byte into the
        # failed member's retained compressed bytes, reading further
        # chunks as needed (only the last 2 bytes are kept between
        # reads — the magic may span a chunk boundary)
        scan = bytes(fed[1:]) + buf
        buf = b""
        while True:
            idx = scan.find(_GZ_MAGIC)
            if idx >= 0:
                buf = scan[idx:]
                break
            scan = scan[-2:]
            chunk = read(_INFLATE_CHUNK)
            if not chunk:
                return
            scan += bytes(chunk)


def iter_gzip_members(data: bytes) -> Iterator[bytes | None]:
    """Whole-blob convenience wrapper over
    :func:`iter_gzip_members_from` (zero-copy memoryview chunks)."""
    view = memoryview(data)
    pos = 0

    def read(n: int):
        nonlocal pos
        chunk = view[pos:pos + n]
        pos += len(chunk)
        return chunk

    return iter_gzip_members_from(read)


def zstd_frame_end(data: bytes, pos: int) -> int | None:
    """End offset of the zstd (or skippable) frame at ``pos`` by
    header arithmetic alone (no decompression): frame header fields
    then 3-byte block headers. None = need more bytes."""
    if pos + 8 > len(data):
        return None
    magic = int.from_bytes(data[pos:pos + 4], "little")
    if 0x184D2A50 <= magic <= 0x184D2A5F:        # skippable
        sz = int.from_bytes(data[pos + 4:pos + 8], "little")
        end = pos + 8 + sz
        return end if end <= len(data) else None
    if data[pos:pos + 4] != b"\x28\xb5\x2f\xfd":
        raise ValueError("bad zstd magic in .warc.zst stream")
    p = pos + 4
    if p >= len(data):
        return None
    fhd = data[p]
    p += 1
    if not ((fhd >> 5) & 1):
        p += 1                                   # window descriptor
    p += (0, 1, 2, 4)[fhd & 3]                   # dictionary id
    fcs = (1 if (fhd >> 5) & 1 else 0, 2, 4, 8)[fhd >> 6]
    p += fcs
    while True:
        if p + 3 > len(data):
            return None
        bh = int.from_bytes(data[p:p + 3], "little")
        p += 3
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        p += 1 if btype == 1 else bsize
        if p > len(data):
            return None
        if bh & 1:
            break
    if (fhd >> 2) & 1:
        p += 4                                   # content checksum
    return p if p <= len(data) else None


def split_warc_records(raw: bytes):
    """Consecutive plain WARC records in one buffer (a .warc.zst
    frame may hold several) -> list of record byte spans."""
    out = []
    pos = 0
    n = len(raw)
    while pos < n:
        if not raw.startswith(b"WARC/", pos):
            break
        head_end = raw.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
        if head_end < 0:
            break
        m = None
        for line in raw[pos:head_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if _ and k.strip().lower() == b"content-length":
                try:
                    m = int(v.strip())
                except ValueError:
                    pass
        if m is None:
            out.append(raw[pos:])
            break
        end = head_end + 4 + m
        out.append(raw[pos:end])
        pos = end
        while raw.startswith(b"\r\n", pos):
            pos += 2
    return out


def _zstd_frame_dict_id(frame: bytes) -> int:
    """Dictionary_ID a zstd frame names in its header (0 = none)."""
    if len(frame) < 5:
        return 0
    fhd = frame[4]
    p = 5
    if not ((fhd >> 5) & 1):
        p += 1                                   # window descriptor
    nb = (0, 1, 2, 4)[fhd & 3]
    if not nb or p + nb > len(frame):
        return 0
    return int.from_bytes(frame[p:p + nb], "little")


def iter_zstd_members_from(read) -> Iterator[bytes | None]:
    """WARC records of a ``.warc.zst`` stream: walk frame boundaries
    by header arithmetic, decompress one frame at a time (bounded by
    the same member inflate cap as gzip), split multi-record frames.

    The IIPC dictionary frame (skippable magic 0x184D2A5D, first in
    the file, holding a shared dictionary that may itself be
    zstd-compressed) is USED, not skipped: record frames that name a
    Dictionary_ID decode against it. A frame that names a dictionary
    the stream never provided fails its own decode and yields one
    error member, like a corrupt gzip member; other skippable frames
    are skipped per spec."""
    from tika_spark.analysis.zstdcodec import (ZSTD_MAGIC, decompress,
                                               parse_dict)
    zdict = None
    buf = b""
    eof = False
    pos = 0
    while True:
        try:
            end = None if eof and pos >= len(buf) else                 zstd_frame_end(buf, pos)
        except ValueError:
            yield None
            return
        if end is None:
            if eof:
                if pos < len(buf):
                    yield None                   # trailing garbage
                return
            chunk = read(1 << 20)
            if not chunk:
                eof = True
            else:
                if pos:
                    buf = buf[pos:]
                    pos = 0
                buf += chunk
            continue
        frame = buf[pos:end]
        pos = end
        magic = int.from_bytes(frame[:4], "little")
        if 0x184D2A50 <= magic <= 0x184D2A5F:
            if magic == 0x184D2A5D and len(frame) > 8:
                blob = frame[8:]
                try:
                    if blob[:4] == ZSTD_MAGIC:   # compressed dict
                        blob = decompress(blob, max_out=_MAX_MEMBER)
                    zdict = parse_dict(blob)
                except ValueError:
                    zdict = None                 # garbled dict frame
            continue                             # other skippables
        try:
            raw = decompress(
                frame, max_out=_MAX_MEMBER,
                zdict=zdict if _zstd_frame_dict_id(frame) else None)
        except ValueError:
            yield None
            continue
        for rec in split_warc_records(raw):
            yield rec


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


def _members_to_pages(members: Iterator[bytes | None]) -> Iterator[dict]:
    """Gzip members → response-record page rows. Non-response records
    (warcinfo, request, metadata) are skipped silently — they are
    expected structure, not faults; members that fail to parse as WARC
    yield a status row."""
    for member in members:
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


def warc_pages(data: bytes) -> Iterator[dict]:
    """All response-record pages of one ``.warc.gz`` blob."""
    return _members_to_pages(iter_gzip_members(data))


def warc_pages_from(read, zst: bool = False) -> Iterator[dict]:
    """All response-record pages from a ``read(n)`` callable —
    O(largest member) memory, never O(file)."""
    if zst:
        return _members_to_pages(iter_zstd_members_from(read))
    return _members_to_pages(iter_gzip_members_from(read))


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


def parse_http_envelope(body: bytes) -> dict | None:
    """HTTP response envelope of a WARC ``response`` body →
    {status, headers (lowercased first-wins), payload_len}. None
    when the body carries no envelope."""
    if body[:5] != b"HTTP/":
        return None
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        return None
    lines = body[:sep].split(b"\r\n")
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        if _:
            key = k.strip().lower().decode("latin-1")
            headers.setdefault(key, v.strip().decode("latin-1"))
    return {"status": status, "headers": headers,
            "payload_len": len(body) - sep - 4}


def http_headers_census(shards: DataFrame, shard_col: str = "shard",
                        blob_col: str = "blob") -> DataFrame:
    """Crawl-side HTTP analytics over .warc.gz shard blobs: one row
    per response record — (url, status, content_type, server,
    location, payload_len). Status-class mixes, redirect targets,
    and server/content-type censuses are one groupBy away; the
    payloads never leave the stage (index-string economics, like
    cdx_index)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "status", "content_type", "server",
                "location", "payload_len"]
        for pdf in batches:
            rows = []
            for blob in pdf[blob_col]:
                for member in iter_gzip_members(bytes(blob or b"")):
                    rec = (parse_record(member)
                           if member is not None else None)
                    if rec is None or rec["type"] != "response":
                        continue
                    env = parse_http_envelope(rec["body"])
                    if env is None:
                        continue
                    h = env["headers"]
                    rows.append((
                        rec["url"], env["status"],
                        h.get("content-type", ""),
                        h.get("server", ""),
                        h.get("location", ""),
                        env["payload_len"]))
            yield pd.DataFrame(rows, columns=cols)

    return shards.select(blob_col).mapInPandas(
        run, schema="url string, status int, content_type string, "
                    "server string, location string, "
                    "payload_len long")


def to_wat(df: DataFrame, url_col: str = "url",
           title_col: str = "title", links_col: str = "links",
           date_iso: str = "1970-01-01T00:00:00Z") -> DataFrame:
    """Extraction output → WAT blobs (the Common-Crawl metadata
    egress beside WET): WARC ``metadata`` records whose JSON payload
    follows the WAT envelope layout — Envelope → Payload-Metadata →
    HTTP-Response-Metadata → HTML-Metadata with Head.Title and the
    outlink list. JSON is emitted with sorted keys and compact
    separators so identical inputs are byte-identical archives (the
    same guarantee as :func:`to_wet`). One blob per Arrow batch."""
    import json as _json
    cols = df.select(F.col(url_col).alias("u"),
                     F.col(title_col).alias("t"),
                     F.col(links_col).alias("l"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parts = []
            for u, t, links in zip(pdf["u"], pdf["t"], pdf["l"]):
                lrows = [{"path": (lk["kind"] or ""),
                          "url": (lk["uri"] or ""),
                          "text": (lk["text"] or "")}
                         for lk in (links if links is not None
                                    else [])]
                env = {"Envelope": {
                    "WARC-Header-Metadata": {
                        "WARC-Target-URI": u or "",
                        "WARC-Date": date_iso,
                        "WARC-Type": "response"},
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {
                                "Head": {"Title": t or ""},
                                "Links": lrows}}}}}
                payload = _json.dumps(
                    env, sort_keys=True,
                    separators=(",", ":")).encode("utf-8")
                parts.append(gzip_member(build_record(
                    u or "", date_iso, payload,
                    rec_type="metadata")))
            yield pd.DataFrame({"blob": [b"".join(parts)]})

    return cols.mapInPandas(build, "blob binary")


def wat_entries(data: bytes) -> Iterator[dict]:
    """Parse a WAT blob back into ``{url, title, links, status}``
    rows (``links`` = [{path, url, text}])."""
    import json as _json
    for member in iter_gzip_members(data):
        rec = parse_record(member) if member is not None else None
        if rec is None:
            yield {"url": "", "title": "", "links": [],
                   "status": "warc_malformed_member"}
            continue
        if rec["type"] != "metadata":
            continue
        try:
            env = _json.loads(rec["body"].decode("utf-8",
                                                 "replace"))
            html_md = (env["Envelope"]["Payload-Metadata"]
                       ["HTTP-Response-Metadata"]["HTML-Metadata"])
            yield {"url": rec["url"],
                   "title": html_md.get("Head", {}).get("Title", ""),
                   "links": html_md.get("Links", []),
                   "status": "ok"}
        except Exception:
            yield {"url": rec["url"], "title": "", "links": [],
                   "status": "wat_malformed_json"}


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


def _open_stream(path: str):
    """Open a binaryFile ``path`` value as a pyarrow input stream.
    Handles Hadoop-style ``file:/x`` URIs plus anything
    ``pyarrow.fs.FileSystem.from_uri`` resolves (hdfs://, s3://)."""
    # compression=None: pyarrow would otherwise auto-inflate by the
    # .gz extension — the member scanner needs the RAW bytes (it owns
    # the per-member framing, bomb cap, and corrupt-member resync)
    from pyarrow import fs as pafs
    if path.startswith("file:"):
        local = path[5:]
        while local.startswith("//"):
            local = local[1:]
        return pafs.LocalFileSystem().open_input_stream(
            local, compression=None)
    if "://" not in path:
        return pafs.LocalFileSystem().open_input_stream(
            path, compression=None)
    filesystem, p = pafs.FileSystem.from_uri(path)
    return filesystem.open_input_stream(p, compression=None)


def _paths_to_pages(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
    """Stream each file through the bounded member scanner: peak task
    memory is one input chunk + one inflating member + one
    ``_PAGES_PER_CHUNK`` output frame — never the compressed blob and
    never the inflated file. (The previous shape materialized the
    whole ``content`` column per file: a 1 GB CC segment cost
    file_bytes + largest member per task; this one costs megabytes.)
    """
    rows: list[dict] = []
    for pdf in batches:
        for path in pdf["path"]:
            try:
                stream = _open_stream(str(path))
            except Exception:
                rows.append({"url": str(path), "warc_date": "",
                             "html": None, "declared_type": None,
                             "status": "warc_open_failed"})
                continue
            zst = str(path).lower().endswith(".zst")
            with stream as f:
                for page in warc_pages_from(f.read, zst=zst):
                    rows.append(page)
                    if len(rows) >= _PAGES_PER_CHUNK:
                        yield _pages_frame(rows)
                        rows = []
    if rows:
        yield _pages_frame(rows)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``.warc.gz`` files → pages DataFrame
    ``(url, warc_date, warc_ts, html, status)``.

    ``binaryFile`` lists one row per file but only the ``path``
    column is selected, so the datasource never loads file contents
    into Spark rows (binary-file column pruning); each task opens its
    files via pyarrow.fs and streams gzip members with the
    O(largest-member) envelope of :func:`iter_gzip_members_from`.
    Parallelism = file count (ample for CC's ~90k files/crawl);
    output leaves in ``_PAGES_PER_CHUNK``-page frames.
    """
    paths = (spark.read.format("binaryFile").load(path)
             .select("path"))
    return paths.mapInPandas(_paths_to_pages, PAGES_SCHEMA)


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
    paths = reader.load(path).select("path")
    return paths.mapInPandas(_paths_to_pages, PAGES_SCHEMA)
