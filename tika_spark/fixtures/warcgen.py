"""Deterministic WARC builder (fixture for the sources.warc reader).

Emits the Common-Crawl layout: a ``.warc.gz`` is a concatenation of
independently-gzipped members, ONE WARC record per member (that
per-record framing is what makes CC files splittable/seekable — see
the WARC 1.0 / ISO 28500 record grammar). Response records wrap an
HTTP/1.1 response whose body is the page payload; gzip mtime is
pinned to 0 so identical inputs are byte-identical archives.
"""

from __future__ import annotations

import gzip
import io

_CRLF = b"\r\n"


def warc_record(url: str, date_iso: str, payload: bytes,
                rec_type: str = "response",
                http_content_type: str = "text/html; charset=utf-8",
                record_id: str | None = None) -> bytes:
    """One plain (uncompressed) WARC record.

    ``response`` records carry an HTTP/1.1 envelope (status line +
    headers + CRLFCRLF + body) as their content block, like a crawl
    capture; other types (request, warcinfo, metadata) carry the
    payload bare. Ends with the grammar's CRLFCRLF record separator.
    """
    if rec_type == "response":
        http = (b"HTTP/1.1 200 OK" + _CRLF
                + b"Content-Type: " + http_content_type.encode("ascii")
                + _CRLF
                + b"Content-Length: " + str(len(payload)).encode("ascii")
                + _CRLF + _CRLF + payload)
        content_type = b"application/http; msgtype=response"
    else:
        http = payload
        content_type = b"application/octet-stream"
    rid = record_id or f"<urn:uuid:{abs(hash(url)) % 10**12:012d}>"
    head = (b"WARC/1.0" + _CRLF
            + b"WARC-Type: " + rec_type.encode("ascii") + _CRLF
            + b"WARC-Record-ID: " + rid.encode("ascii") + _CRLF
            + b"WARC-Date: " + date_iso.encode("ascii") + _CRLF
            + b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
            + b"Content-Type: " + content_type + _CRLF
            + b"Content-Length: " + str(len(http)).encode("ascii")
            + _CRLF + _CRLF)
    return head + http + _CRLF + _CRLF


def gzip_member(record: bytes) -> bytes:
    """One record, one gzip member, mtime pinned for determinism."""
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def warc_gz(records: list[tuple[str, str, bytes]]) -> bytes:
    """Multi-record ``.warc.gz``: each (url, date_iso, payload)
    becomes a response record in its own gzip member."""
    return b"".join(gzip_member(warc_record(u, d, p))
                    for (u, d, p) in records)
