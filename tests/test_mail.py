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
