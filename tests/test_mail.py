"""Mail parser tests (E5): RFC822, multipart, attachments, mbox."""

from tika_spark.config import ExtractConfig
from tika_spark.mail import extract_mbox, extract_rfc822
from tika_spark.mime.detector import detect

CFG = ExtractConfig()

SIMPLE = (b"From: Alice <alice@example.com>\r\n"
          b"To: bob@example.com\r\n"
          b"Subject: Meeting notes\r\n"
          b"Date: Mon, 10 Aug 2026 10:00:00 +0000\r\n"
          b"Message-ID: <m1@example.com>\r\n"
          b"Content-Type: text/plain; charset=utf-8\r\n\r\n"
          b"Agenda item one.\nAgenda item two.\n")

MULTIPART = (b"From: a@e.com\r\n"
             b"Subject: Report\r\n"
             b"MIME-Version: 1.0\r\n"
             b'Content-Type: multipart/mixed; boundary="B"\r\n\r\n'
             b"--B\r\n"
             b"Content-Type: text/html; charset=utf-8\r\n\r\n"
             b"<html><body><p>html body</p></body></html>\r\n"
             b"--B\r\n"
             b"Content-Type: text/plain\r\n"
             b'Content-Disposition: attachment; filename="notes.txt"\r\n'
             b"Content-Transfer-Encoding: base64\r\n\r\n"
             b"aGVsbG8gYXR0YWNobWVudA==\r\n"
             b"--B--\r\n")


def test_detect_rfc822_and_mbox():
    assert detect(SIMPLE) == "message/rfc822"
    mbox = b"From alice@e.com Mon Aug 10 10:00:00 2026\n" + SIMPLE
    assert detect(mbox) == "application/mbox"
    assert detect(b"plain text here") == "text/plain"


def test_simple_message():
    r = extract_rfc822(SIMPLE)
    assert r["title"] == "Meeting notes"
    assert r["metadata"]["Author"] == ["Alice <alice@example.com>"]
    assert r["metadata"]["Message-To"] == ["bob@example.com"]
    assert r["text"] == ("Meeting notes\n"
                         "Agenda item one.\nAgenda item two.\n")


def test_multipart_html_and_attachment():
    r = extract_rfc822(MULTIPART)
    assert "html body\n" in r["text"]
    assert r["children"] == [("notes.txt", b"hello attachment")]


def test_mbox_split():
    m1 = SIMPLE
    m2 = SIMPLE.replace(b"Meeting notes", b"Second message")
    mbox = (b"From alice Mon Aug 10 10:00:00 2026\n" + m1
            + b"\nFrom alice Tue Aug 11 11:00:00 2026\n" + m2)
    r = extract_mbox(mbox)
    assert [c[0] for c in r["children"]] == ["msg-0.eml", "msg-1.eml"]
    assert r["metadata"]["message-count"] == ["2"]
    # children re-parse as rfc822
    c0 = extract_rfc822(r["children"][0][1])
    assert c0["title"] == "Meeting notes"
    c1 = extract_rfc822(r["children"][1][1])
    assert c1["title"] == "Second message"


def test_mbox_through_recursion(spark):
    from tika_spark.pipeline.job import extract_recursive
    mbox = b"From alice Mon Aug 10 10:00:00 2026\n" + SIMPLE
    df = spark.createDataFrame([("u://mail.mbox", mbox)],
                               "url string, html binary")
    out = {r["url"]: r for r in extract_recursive(df, mode="text").collect()}
    assert out["u://mail.mbox"]["mime"] == "application/mbox"
    child = out["u://mail.mbox!/msg-0.eml"]
    assert child["mime"] == "message/rfc822"
    assert child["title"] == "Meeting notes"
    assert child["depth"] == 1


# ------------------------------------------------------------------ TNEF


def make_tnef(subject: str | None = None, body: str | None = None,
              attachments: list[tuple[str, bytes]] | None = None,
              long_names: bool = False) -> bytes:
    """Deterministic TNEF builder (MS-OXTNEF §2.1 layout): signature +
    key + level-prefixed attribute stream."""
    import struct

    def attr(level: int, attr_id: int, attr_type: int,
             payload: bytes) -> bytes:
        checksum = sum(payload) & 0xFFFF
        return (bytes([level])
                + struct.pack("<HH", attr_id, attr_type)
                + struct.pack("<I", len(payload)) + payload
                + struct.pack("<H", checksum))

    out = [struct.pack("<IH", 0x223E9F78, 0x1234)]
    if subject is not None:
        out.append(attr(1, 0x8004, 0x0001,
                        subject.encode("cp1252") + b"\x00"))
    if body is not None:
        out.append(attr(1, 0x800C, 0x0002,
                        body.encode("cp1252") + b"\x00"))
    for name, payload in attachments or []:
        out.append(attr(2, 0x9002, 0x0006, b"\x00" * 14))  # rend
        if long_names:
            # MAPI prop blob: one PT_STRING8 PidTagAttachLongFilename
            val = name.encode("cp1252") + b"\x00"
            pad = (-len(val)) % 4
            blob = (struct.pack("<I", 1)
                    + struct.pack("<HH", 0x001E, 0x3707)
                    # string/binary types always carry the value-count
                    # dword, even single-valued (MS-OXTNEF)
                    + struct.pack("<I", 1)
                    + struct.pack("<I", len(val)) + val + b"\x00" * pad)
            out.append(attr(2, 0x9005, 0x0006, blob))
            out.append(attr(2, 0x8010, 0x0001, b"SHORTN~1.TXT\x00"))
        else:
            out.append(attr(2, 0x8010, 0x0001,
                            name.encode("cp1252") + b"\x00"))
        out.append(attr(2, 0x800F, 0x0006, payload))
    return b"".join(out)


def test_detect_tnef():
    t = make_tnef(subject="S")
    assert detect(t) == "application/vnd.ms-tnef"
    # binary payload + the literal-name glob -> the hint specializes
    # octet-stream; a *text* payload named winmail.dat stays text/plain
    assert detect(b"\x00\x01\x02\x03", "http://h/winmail.dat") == \
        "application/vnd.ms-tnef"
    assert detect(b"plain text", "http://h/winmail.dat") == "text/plain"


def test_tnef_subject_body_attachments():
    from tika_spark.mail import extract_tnef
    t = make_tnef(subject="Quarterly report", body="See attached.",
                  attachments=[("notes.txt", b"hello tnef"),
                               ("data.bin", b"\x00\x01\x02")])
    r = extract_tnef(t)
    assert r["title"] == "Quarterly report"
    assert r["text"] == "Quarterly report\nSee attached.\n"
    assert r["children"] == [("notes.txt", b"hello tnef"),
                             ("data.bin", b"\x00\x01\x02")]
    assert r["status"] == "ok"


def test_tnef_mapi_long_filename_wins():
    from tika_spark.mail import extract_tnef
    t = make_tnef(attachments=[("a long descriptive name.txt",
                                b"payload")], long_names=True)
    r = extract_tnef(t)
    assert r["children"] == [("a long descriptive name.txt",
                              b"payload")]


def test_tnef_garbage_is_error_row():
    from tika_spark.mail import extract_tnef
    r = extract_tnef(b"\x00" * 32)
    assert r["status"] == "error"
    r2 = extract_tnef(make_tnef(subject="S")[:9])  # truncated attr
    assert r2["status"] == "ok"   # lenient: stops at truncation


def test_tnef_through_recursion(spark):
    from tika_spark.pipeline.job import extract_recursive
    t = make_tnef(subject="Wrapped", body="outer body",
                  attachments=[("inner.txt", b"inner text")])
    df = spark.createDataFrame([("http://e.com/winmail.dat", t)],
                               "url string, html binary")
    rows = {r["url"]: r for r in
            extract_recursive(df, mode="text").collect()}
    assert rows["http://e.com/winmail.dat"]["text"] == \
        "Wrapped\nouter body\n"
    inner = rows["http://e.com/winmail.dat!/inner.txt"]
    assert inner["text"] == "inner text\n"
    assert inner["depth"] == 1


class TestFoxmail:
    BASE = ("/root/reference/tika-parsers/src/test/resources/"
            "test-documents")

    def test_box_splits_into_messages(self):
        import os

        import pytest as _p

        from tika_spark.mail import extract_foxmail
        p = os.path.join(self.BASE, "testFOXMAIL.box")
        if not os.path.isfile(p):
            _p.skip("corpus not present")
        with open(p, "rb") as f:
            out = extract_foxmail(f.read())
        assert out["metadata"]["message-count"] == ["5"]
        # furniture headers stripped: every child starts at a real
        # RFC822 header that magic detection recognizes
        from tika_spark.mime.detector import detect
        for name, body in out["children"]:
            assert detect(body, name) == "message/rfc822", name

    def test_non_foxmail_is_metadata_only(self):
        from tika_spark.mail import extract_foxmail
        out = extract_foxmail(b"not a foxmail store")
        assert out["status"] == "metadata_only"
        assert out["children"] == []
