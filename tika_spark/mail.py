"""Mail parsers: RFC822 messages and mbox archives (SURVEY.md §2 E5).

Reimplements the semantics of the reference's mail chain
(tika-parsers/.../mail/RFC822Parser.java + MailContentHandler.java:
headers → metadata, body parts walked recursively;
mbox/MboxParser.java:251: ``From `` separator splitting) on the stdlib
``email`` package:

- Subject → title (and an <h1>-equivalent first text line, matching
  MailContentHandler's body heading), From → Author, To/Cc/Date →
  metadata;
- text/plain parts decoded with their declared charset; text/html
  parts run through the HTML extraction chain (C1-C5);
- attachments (parts with a filename) surface as ``children`` and
  re-enter the pipeline through the F1 recursion — the reference's
  embedded-document machinery;
- mbox: each ``From ``-delimited message becomes a child
  (``msg-N.eml``), so one archive row explodes into per-message rows.
"""

from __future__ import annotations

import email
import email.policy
import re

from tika_spark.config import ExtractConfig
from tika_spark.html.extract import extract_html
from tika_spark.html.layout import safe_chars

_DEFAULT = ExtractConfig()

_MBOX_SEP = re.compile(rb"^From .*\d{4}\r?\n", re.MULTILINE)


def _decoded_payload(part) -> bytes:
    try:
        return part.get_payload(decode=True) or b""
    except Exception:
        return b""


def _part_text(part, config: ExtractConfig) -> str:
    ctype = part.get_content_type()
    payload = _decoded_payload(part)
    if ctype == "text/html":
        return extract_html(payload, None, None, config)["text"]
    charset = part.get_content_charset() or "utf-8"
    try:
        return payload.decode(charset, "replace")
    except LookupError:
        return payload.decode("utf-8", "replace")


def extract_rfc822(data: bytes, url: str | None = None,
                   declared_type: str | None = None,
                   config: ExtractConfig = _DEFAULT) -> dict:
    data = bytes(data or b"")
    msg = email.message_from_bytes(data, policy=email.policy.default)

    metadata: dict[str, list[str]] = {
        "Content-Type": ["message/rfc822"]}
    subject = str(msg.get("Subject", "")) or None
    if subject:
        metadata["title"] = [subject]
        metadata["subject"] = [subject]
    for header, key in (("From", "Author"), ("To", "Message-To"),
                        ("Cc", "Message-Cc"), ("Bcc", "Message-Bcc"),
                        ("Date", "date"), ("Message-ID", "Message-Id")):
        v = msg.get(header)
        if v:
            metadata[key] = [str(v)]

    parts: list[str] = []
    children: list[tuple[str, bytes]] = []
    if subject:
        parts.append(subject + "\n")  # the <h1> heading line
    for part in msg.walk():
        if part.is_multipart():
            continue
        filename = part.get_filename()
        if filename:
            children.append((filename, _decoded_payload(part)))
            continue
        if part.get_content_maintype() == "text":
            body = _part_text(part, config)
            if body:
                parts.append(body if body.endswith("\n") else body + "\n")

    text = safe_chars("".join(parts))
    limit = max(config.output_min_chars,
                config.output_ratio * max(1, len(data)))
    status = "ok"
    if len(text) > limit:
        text, status = text[:limit], "output_limit"
    return {
        "charset": None,
        "title": subject,
        "text": text,
        "spans": [(0, len(text), "body")] if text else [],
        "links": [],
        "metadata": metadata,
        "status": status,
        "children": children,
    }


def extract_mbox(data: bytes, url: str | None = None,
                 declared_type: str | None = None,
                 config: ExtractConfig = _DEFAULT) -> dict:
    """Split an mbox into per-message children (MboxParser semantics);
    each child re-enters the pipeline as message/rfc822."""
    data = bytes(data or b"")
    starts = [m.start() for m in _MBOX_SEP.finditer(data)]
    children: list[tuple[str, bytes]] = []
    for n, s in enumerate(starts):
        e = starts[n + 1] if n + 1 < len(starts) else len(data)
        body = data[s:e]
        # drop the "From ..." envelope line itself
        nl = body.find(b"\n")
        children.append((f"msg-{n}.eml", body[nl + 1:] if nl >= 0
                         else body))
        if len(children) >= 1000:
            break
    text = "".join(name + "\n" for name, _ in children)
    return {
        "charset": None,
        "title": None,
        "text": text,
        "spans": [(0, len(text), "body")] if text else [],
        "links": [],
        "metadata": {"Content-Type": ["application/mbox"],
                     "message-count": [str(len(children))]},
        "status": "ok",
        "children": children,
    }
