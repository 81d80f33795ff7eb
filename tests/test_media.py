"""Metadata-only media parser tests (E12): header-dims extraction."""

import struct
import zlib

from tika_spark.media import extract_media
from tika_spark.mime.detector import detect


def make_png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def make_jpeg(w: int, h: int) -> bytes:
    sof = b"\xff\xc0" + struct.pack(">H", 8 + 3) + b"\x08" \
        + struct.pack(">HH", h, w) + b"\x01"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def make_bmp(w: int, h: int) -> bytes:
    return (b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)
            + b"\x00" * 10)


def test_detect_images():
    assert detect(make_png(1, 1)) == "image/png"
    assert detect(make_gif(1, 1)) == "image/gif"
    assert detect(make_jpeg(1, 1)) == "image/jpeg"
    assert detect(make_bmp(1, 1)) == "image/bmp"


def test_dims():
    for maker, mime, (w, h) in (
            (make_png, "image/png", (640, 480)),
            (make_gif, "image/gif", (320, 200)),
            (make_jpeg, "image/jpeg", (1024, 768)),
            (make_bmp, "image/bmp", (12, 34))):
        r = extract_media(maker(w, h), mime=mime)
        assert r["metadata"]["width"] == [str(w)], mime
        assert r["metadata"]["height"] == [str(h)], mime
        assert r["text"] == "" and r["status"] == "ok"


def test_corrupt_image_is_metadata_only_ok():
    r = extract_media(b"\x89PNG\r\n\x1a\nXX", mime="image/png")
    assert r["status"] == "ok"
    assert "width" not in r["metadata"]


def _make_id3v2(title: str, artist: str) -> bytes:
    def frame(fid, text):
        body = b"\x03" + text.encode("utf-8")
        return fid + struct.pack(">I", len(body)) + b"\x00\x00" + body
    frames = frame(b"TIT2", title) + frame(b"TPE1", artist)
    n = len(frames)
    size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])
    return b"ID3\x04\x00\x00" + size + frames + b"\xff\xfb" + b"\x00" * 64


def test_mp3_id3v2():
    from tika_spark.media import extract_media
    r = extract_media(_make_id3v2("My Song", "The Band"),
                      mime="audio/mpeg")
    assert r["title"] == "My Song"
    assert r["metadata"]["Author"] == ["The Band"]


def test_mp3_id3v1():
    tag = (b"TAG" + b"Old Title".ljust(30, b"\x00")
           + b"Old Artist".ljust(30, b"\x00")
           + b"Old Album".ljust(30, b"\x00") + b"1999"
           + b"\x00" * 31)
    data = b"\xff\xfb" + b"\x00" * 200 + tag
    from tika_spark.media import extract_media
    r = extract_media(data, mime="audio/mpeg")
    assert r["title"] == "Old Title"
    assert r["metadata"]["releaseDate"] == ["1999"]


def test_detect_mp3():
    assert detect(_make_id3v2("t", "a")) == "audio/mpeg"


def test_through_pipeline(spark):
    from tika_spark.pipeline.job import extract
    df = spark.createDataFrame(
        [("u://p.png", make_png(99, 7))], "url string, html binary")
    row = extract(df, mode="text").collect()[0]
    assert row["mime"] == "image/png"
    assert row["metadata"]["width"] == ["99"]
    assert row["text"] == ""
