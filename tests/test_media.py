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
    # planes=1 / bpp=24 at offsets 26/28: the magic's false-positive
    # confirms (TestMimeTypes testBMPfp) require a structurally
    # plausible DIB header, not just "BM"
    return (b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h)
            + struct.pack("<HH", 1, 24) + b"\x00" * 6)


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


def _make_id3v22(title: str, artist: str) -> bytes:
    # v2.2: 6-byte frame headers — 3-byte IDs, 3-byte BE sizes
    def frame(fid, text):
        body = b"\x00" + text.encode("latin-1")
        return fid + len(body).to_bytes(3, "big") + body
    frames = frame(b"TT2", title) + frame(b"TP1", artist)
    n = len(frames)
    size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                  (n >> 7) & 0x7F, n & 0x7F])
    return b"ID3\x02\x00\x00" + size + frames + b"\xff\xfb" + b"\x00" * 64


def test_mp3_id3v22_three_byte_frames():
    # regression: v2.2 frames parsed with the 10-byte v2.3 layout read
    # garbage IDs and returned {} with status=parsed
    from tika_spark.media import extract_media
    r = extract_media(_make_id3v22("Old Song", "Duo"), mime="audio/mpeg")
    assert r["title"] == "Old Song"
    assert r["metadata"]["Author"] == ["Duo"]


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


# ---- TIFF / EXIF ----------------------------------------------------------

def _make_tiff(entries_ascii=None, gps=False, bo="<"):
    """Minimal TIFF: IFD0 with dims + Make/Model, optional EXIF sub-IFD
    (DateTimeOriginal) and GPS IFD (lat/lon rationals)."""
    import struct as st
    e = "<" if bo == "<" else ">"
    out = bytearray(b"II*\x00" if bo == "<" else b"MM\x00*")
    out += st.pack(e + "I", 8)

    blobs = bytearray()          # out-of-line values, appended after IFDs
    ifd0 = []

    def entry(tag, typ, count, val_bytes):
        nonlocal blobs
        if len(val_bytes) <= 4:
            ifd0.append(st.pack(e + "HHI", tag, typ, count)
                        + val_bytes.ljust(4, b"\x00"))
        else:
            ifd0.append([tag, typ, count, len(blobs)])  # patch later
            blobs += val_bytes

    entry(256, 3, 1, st.pack(e + "H", 640))
    entry(257, 3, 1, st.pack(e + "H", 480))
    make = b"CamCo\x00"
    entry(271, 2, len(make), make)
    entry(274, 3, 1, st.pack(e + "H", 6))

    sub_ifds = bytearray()
    if entries_ascii:
        dto = entries_ascii.encode() + b"\x00"
        # EXIF sub-IFD with one ASCII tag 36867
        entry(34665, 4, 1, st.pack(e + "I", 0xAAAA))  # patched below
    if gps:
        entry(34853, 4, 1, st.pack(e + "I", 0xBBBB))

    # layout: header(8) + ifd0 + next(4) + [sub ifds] + blobs
    n = len(ifd0)
    ifd0_size = 2 + 12 * n + 4
    pos_after_ifd0 = 8 + ifd0_size

    sub_offsets = {}
    p = pos_after_ifd0
    if entries_ascii:
        sub_offsets["exif"] = p
        dto = entries_ascii.encode() + b"\x00"
        sub = st.pack(e + "H", 1) + st.pack(e + "HHI", 36867, 2, len(dto))
        if len(dto) <= 4:
            sub += dto.ljust(4, b"\x00")
        else:
            sub += st.pack(e + "I", 0)  # patch after blobs known
        sub += st.pack(e + "I", 0)
        sub_ifds += sub
        p += len(sub)
        sub_dto_far = len(dto) > 4
    if gps:
        sub_offsets["gps"] = p
        rat = lambda d, m, s: st.pack(e + "II", d, 1) + st.pack(e + "II", m, 1) \
            + st.pack(e + "II", s, 1)
        lat_off_pos = None
        gps_entries = []
        gps_blob_base = None
        # build with two rational-seq entries + two refs
        gps_ifd = bytearray(st.pack(e + "H", 4))
        # refs fit inline
        gps_ifd += st.pack(e + "HHI", 1, 2, 2) + b"N\x00\x00\x00"
        gps_ifd += st.pack(e + "HHI", 2, 5, 3) + st.pack(e + "I", 0)  # patch
        gps_ifd += st.pack(e + "HHI", 3, 2, 2) + b"W\x00\x00\x00"
        gps_ifd += st.pack(e + "HHI", 4, 5, 3) + st.pack(e + "I", 0)  # patch
        gps_ifd += st.pack(e + "I", 0)
        sub_ifds += gps_ifd
        p += len(gps_ifd)

    blob_base = p
    # patch ifd0 out-of-line entries and write it
    ifd0_raw = bytearray(st.pack(e + "H", n))
    for item in ifd0:
        if isinstance(item, bytes):
            ifd0_raw += item
        else:
            tag, typ, count, rel = item
            ifd0_raw += st.pack(e + "HHI", tag, typ, count) \
                + st.pack(e + "I", blob_base + rel)
    ifd0_raw += st.pack(e + "I", 0)
    # patch sub-IFD pointers inside ifd0_raw
    raw = bytes(ifd0_raw)
    if entries_ascii:
        raw = raw.replace(st.pack(e + "I", 0xAAAA),
                          st.pack(e + "I", sub_offsets["exif"]))
    if gps:
        raw = raw.replace(st.pack(e + "I", 0xBBBB),
                          st.pack(e + "I", sub_offsets["gps"]))
    sub_raw = bytes(sub_ifds)
    if entries_ascii and len(entries_ascii) + 1 > 4:
        dto = entries_ascii.encode() + b"\x00"
        sub_raw = sub_raw.replace(
            st.pack(e + "HHI", 36867, 2, len(dto)) + st.pack(e + "I", 0),
            st.pack(e + "HHI", 36867, 2, len(dto))
            + st.pack(e + "I", blob_base + len(blobs)))
        blobs += dto
    if gps:
        lat = st.pack(e + "II", 48, 1) + st.pack(e + "II", 51, 1) \
            + st.pack(e + "II", 0, 1)
        lon = st.pack(e + "II", 2, 1) + st.pack(e + "II", 21, 1) \
            + st.pack(e + "II", 0, 1)
        sub_raw = sub_raw.replace(
            st.pack(e + "HHI", 2, 5, 3) + st.pack(e + "I", 0),
            st.pack(e + "HHI", 2, 5, 3)
            + st.pack(e + "I", blob_base + len(blobs)))
        blobs += lat
        sub_raw = sub_raw.replace(
            st.pack(e + "HHI", 4, 5, 3) + st.pack(e + "I", 0),
            st.pack(e + "HHI", 4, 5, 3)
            + st.pack(e + "I", blob_base + len(blobs)))
        blobs += lon
    return bytes(out) + raw + sub_raw + bytes(blobs)


def test_tiff_dims_survive_exif_walk_failure(monkeypatch):
    # regression: when the full EXIF IFD walk raises, the dims-only
    # first-IFD scan must still produce width/height
    import tika_spark.media as M

    def boom(data):
        raise IndexError("corrupt sub-IFD")

    monkeypatch.setattr(M, "_exif_metadata", boom)
    r = M.extract_media(_make_tiff(), mime="image/tiff")
    assert r["metadata"]["width"] == ["640"]
    assert r["metadata"]["height"] == ["480"]


def test_tiff_detect_and_dims():
    t = _make_tiff()
    assert detect(t, "http://x/a.tif") == "image/tiff"
    r = extract_media(t, mime="image/tiff")
    assert r["metadata"]["width"] == ["640"]
    assert r["metadata"]["height"] == ["480"]
    assert r["metadata"]["tiff:Make"] == ["CamCo"]
    assert r["metadata"]["tiff:Orientation"] == ["6"]


def test_tiff_exif_and_gps():
    t = _make_tiff(entries_ascii="2021:05:04 10:20:30", gps=True)
    r = extract_media(t, mime="image/tiff")
    assert r["metadata"]["exif:DateTimeOriginal"] == ["2021:05:04 10:20:30"]
    assert r["metadata"]["geo:lat"] == ["48.850000"]
    assert r["metadata"]["geo:long"] == ["-2.350000"]


def test_tiff_big_endian():
    t = _make_tiff(bo=">")
    r = extract_media(t, mime="image/tiff")
    assert r["metadata"]["width"] == ["640"]


def test_jpeg_exif_app1():
    tiff = _make_tiff()
    app1 = b"Exif\x00\x00" + tiff
    seg = struct.pack(">H", len(app1) + 2) + app1
    sof = b"\xff\xc0" + struct.pack(">HBHH", 8, 8, 480, 640)
    jpg = b"\xff\xd8" + b"\xff\xe1" + seg + sof + b"\xff\xd9"
    r = extract_media(jpg, mime="image/jpeg")
    assert r["metadata"]["tiff:Make"] == ["CamCo"]
    assert r["metadata"]["width"] == ["640"]


def test_webp_exif_chunk():
    tiff = _make_tiff()
    exif_body = b"Exif\x00\x00" + tiff
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x08\x00\x00\x00" \
        + (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    exif = b"EXIF" + struct.pack("<I", len(exif_body)) + exif_body
    if len(exif_body) & 1:
        exif += b"\x00"
    riff = b"WEBP" + vp8x + exif
    raw = b"RIFF" + struct.pack("<I", len(riff)) + riff
    assert detect(raw, "http://x/p.webp") == "image/webp"
    r = extract_media(raw, mime="image/webp")
    assert r["metadata"]["tiff:Make"] == ["CamCo"]
    assert r["metadata"]["width"] == ["640"]   # VP8X dims, not EXIF


def test_tiff_corrupt_never_raises():
    for junk in (b"II*\x00", b"II*\x00\xff\xff\xff\xff", b"MM\x00*" + b"\x00" * 3):
        r = extract_media(junk, mime="image/tiff")
        assert r["status"] == "ok"


# ---- TrueType / FLV / Java class (E12 tail) -------------------------------

def _make_ttf(family="Fam Sans", full="Fam Sans Regular"):
    import struct as st
    recs = [(1, family), (4, full)]
    strings = b""
    name_recs = b""
    for nid, val in recs:
        enc = val.encode("utf-16-be")
        name_recs += st.pack(">HHHHHH", 3, 1, 0x409, nid,
                             len(enc), len(strings))
        strings += enc
    name_table = st.pack(">HHH", 0, len(recs), 6 + 12 * len(recs)) \
        + name_recs + strings
    off = 12 + 16
    head = st.pack(">IHHHH", 0x00010000, 1, 16, 0, 0)
    rec = b"name" + st.pack(">III", 0, off, len(name_table))
    return head + rec + name_table


def _make_flv(duration=12.5, width=640, height=360):
    import struct as st

    def amf_str(s):
        return st.pack(">H", len(s)) + s.encode()

    body = b"\x02" + amf_str("onMetaData") + b"\x08" + st.pack(">I", 3)
    for k, v in (("duration", duration), ("width", width),
                 ("height", height)):
        body += amf_str(k) + b"\x00" + st.pack(">d", float(v))
    body += st.pack(">H", 0) + b"\x09"
    tag = b"\x12" + st.pack(">I", len(body))[1:] + b"\x00" * 7 + body
    return b"FLV\x01\x05" + st.pack(">I", 9) + st.pack(">I", 0) + tag


def _make_class(name="com/example/Widget"):
    import struct as st
    # cp: 1=utf8 name, 2=class->1
    cp = b"\x01" + st.pack(">H", len(name)) + name.encode() \
        + b"\x07" + st.pack(">H", 1)
    return b"\xca\xfe\xba\xbe" + st.pack(">HH", 0, 52) \
        + st.pack(">H", 3) + cp + st.pack(">HH", 0x21, 2)


def _make_woff(family="Web Sans", full="Web Sans Bold",
               compress=True):
    import struct as st
    import zlib as zl
    sfnt = _make_ttf(family, full)
    name_tbl = sfnt[28:]                 # after head(12) + 1 dir rec
    comp = zl.compress(name_tbl) if compress else name_tbl
    if len(comp) >= len(name_tbl):
        comp = name_tbl                  # WOFF stores smaller form
    off = 44 + 20
    hdr = b"wOFF" + st.pack(">I", 0x00010000) \
        + st.pack(">I", off + len(comp)) + st.pack(">HH", 1, 0) \
        + st.pack(">I", 12 + 16 + len(name_tbl)) \
        + st.pack(">HH", 1, 0) + st.pack(">IIIII", 0, 0, 0, 0, 0)
    rec = b"name" + st.pack(">IIII", off, len(comp), len(name_tbl), 0)
    return hdr + rec + comp


def test_ttf_name_table():
    t = _make_ttf()
    assert detect(t, "http://x/f.ttf") == "application/x-font-ttf"
    r = extract_media(t, mime="application/x-font-ttf")
    assert r["title"] == "Fam Sans Regular"
    assert r["metadata"]["font-family"] == ["Fam Sans"]


def test_woff_name_table():
    for compress in (True, False):
        t = _make_woff(compress=compress)
        assert detect(t, "http://x/f.woff") == "font/woff"
        r = extract_media(t, mime="font/woff")
        assert r["title"] == "Web Sans Bold"
        assert r["metadata"]["font-family"] == ["Web Sans"]
    # corrupt deflate stream → graceful empty metadata
    bad = bytearray(_make_woff())
    bad[-5] ^= 0xFF
    r = extract_media(bytes(bad), mime="font/woff")
    assert "font-family" not in r["metadata"]


def test_flv_metadata():
    f = _make_flv()
    assert detect(f, "http://x/v.flv") == "video/x-flv"
    r = extract_media(f, mime="video/x-flv")
    assert r["metadata"]["hasVideo"] == ["true"]
    assert r["metadata"]["hasAudio"] == ["true"]
    assert r["metadata"]["duration"] == ["12.5"]
    assert r["metadata"]["width"] == ["640"]


def test_java_class():
    c = _make_class()
    assert detect(c, None) == "application/java-vm"
    r = extract_media(c, mime="application/java-vm")
    assert r["title"] == "com.example.Widget"
    assert r["metadata"]["version"] == ["52.0"]


def test_e12_tail_corrupt_never_raises():
    for mime in ("application/x-font-ttf", "video/x-flv",
                 "application/java-vm"):
        for junk in (b"", b"\x00\x01\x00\x00", b"FLV\x01",
                     b"\xca\xfe\xba\xbe\x00"):
            r = extract_media(junk, mime=mime)
            assert r["status"] == "ok"


def test_psd_dims():
    psd = b"8BPS" + struct.pack(">H", 1) + b"\x00" * 6 \
        + struct.pack(">H", 3) + struct.pack(">II", 600, 800)
    assert detect(psd, "http://x/a.psd") == "image/vnd.adobe.photoshop"
    r = extract_media(psd, mime="image/vnd.adobe.photoshop")
    assert r["metadata"]["width"] == ["800"]
    assert r["metadata"]["height"] == ["600"]


def test_webp_dims():
    from tika_spark.media import _webp_dims, extract_media
    import struct as _s
    # VP8X extended: canvas 640x480 -> stored as w-1/h-1 24-bit LE
    vp8x = (b"RIFF" + _s.pack("<I", 30) + b"WEBPVP8X"
            + _s.pack("<I", 10) + b"\x00\x00\x00\x00"
            + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"))
    assert _webp_dims(vp8x) == (640, 480)
    # VP8 lossy key frame: 3-byte frame tag + 9D 01 2A + 14-bit dims
    vp8 = (b"RIFF" + _s.pack("<I", 40) + b"WEBPVP8 "
           + _s.pack("<I", 20) + b"\x00\x00\x00"
           + b"\x9d\x01\x2a" + _s.pack("<HH", 320, 240) + b"\x00" * 8)
    assert _webp_dims(vp8) == (320, 240)
    r = extract_media(vp8x, mime="image/webp")
    assert r["metadata"]["width"] == ["640"]


def test_ico_dims():
    from tika_spark.media import _ico_dims
    ico = b"\x00\x00\x01\x00\x01\x00\x10\x20" + b"\x00" * 16
    assert _ico_dims(ico) == (16, 32)
    ico256 = b"\x00\x00\x01\x00\x01\x00\x00\x00" + b"\x00" * 16
    assert _ico_dims(ico256) == (256, 256)


# -------------------------------------------- round-2 header metadata


def test_midi_meta():
    import struct

    from tika_spark.media import extract_media
    midi = (b"MThd" + struct.pack(">IHHH", 6, 1, 3, 480)
            + b"MTrk" + struct.pack(">I", 4) + b"\x00\xff\x2f\x00")
    r = extract_media(midi, mime="audio/midi")
    assert r["metadata"]["tracks"] == ["3"]
    assert r["metadata"]["division-type"] == ["PPQ"]
    assert r["metadata"]["ticksPerBeat"] == ["480"]


def test_aiff_meta():
    import struct

    from tika_spark.media import extract_media
    # 44100 Hz as 80-bit extended: exp 16398, mantissa 44100<<48
    rate80 = struct.pack(">H", 16398) + struct.pack(">Q", 44100 << 48)
    comm = struct.pack(">HIH", 2, 88200, 16) + rate80
    aiff = (b"FORM" + struct.pack(">I", 4 + 8 + len(comm)) + b"AIFF"
            + b"COMM" + struct.pack(">I", len(comm)) + comm)
    r = extract_media(aiff, mime="audio/x-aiff")
    m = r["metadata"]
    assert m["channels"] == ["2"] and m["samplerate"] == ["44100"]
    assert m["xmpDM:duration"] == ["2.00"]


def test_au_and_wav_meta():
    import struct

    from tika_spark.media import extract_media
    au = b".snd" + struct.pack(">IIIII", 24, 8, 1, 8000, 1)
    r = extract_media(au, mime="audio/basic")
    assert r["metadata"]["samplerate"] == ["8000"]

    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    wav = (b"RIFF" + struct.pack("<I", 36) + b"WAVE"
           + b"fmt " + struct.pack("<I", 16) + fmt
           + b"data" + struct.pack("<I", 44100 * 4))  # 1 second
    r2 = extract_media(wav, mime="audio/x-wav")
    m = r2["metadata"]
    assert m["channels"] == ["2"] and m["bits"] == ["16"]
    assert m["xmpDM:duration"] == ["1.00"]


def test_flac_and_ogg_meta():
    from tika_spark.media import extract_media
    packed = (44100 << 44) | (1 << 41) | (15 << 36) | (44100 * 3)
    si = b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
    flac = b"fLaC" + b"\x00\x00\x00\x22" + si
    r = extract_media(flac, mime="audio/x-flac")
    m = r["metadata"]
    assert m["samplerate"] == ["44100"] and m["channels"] == ["2"]
    assert m["bits"] == ["16"] and m["xmpDM:duration"] == ["3.00"]

    ogg = (b"OggS" + b"\x00" * 22 + b"\x01\x1e"
           + b"\x01vorbis" + b"\x00\x00\x00\x00" + bytes([2])
           + (22050).to_bytes(4, "little") + b"\x00" * 12)
    r2 = extract_media(ogg, mime="audio/ogg")
    assert r2["metadata"]["channels"] == ["2"]
    assert r2["metadata"]["samplerate"] == ["22050"]


def test_mp4_and_netcdf_and_dwg_meta():
    import struct

    from tika_spark.media import extract_media
    mvhd = (b"mvhd" + b"\x00" * 12
            + struct.pack(">II", 600, 1200) + b"\x00" * 80)
    mp4 = (b"\x00\x00\x00\x20ftypisom\x00\x00\x02\x00isomiso2"
           + b"\x00" * 8 + struct.pack(">I", len(mvhd) + 4) + mvhd)
    r = extract_media(mp4, mime="video/mp4")
    assert r["metadata"]["major-brand"] == ["isom"]
    assert r["metadata"]["xmpDM:duration"] == ["2.00"]

    name = b"time"
    nc = (b"CDF\x01" + struct.pack(">I", 5)
          + struct.pack(">II", 0x0A, 2)
          + struct.pack(">I", 4) + name + struct.pack(">I", 0)
          + struct.pack(">I", 3) + b"lat\x00" + struct.pack(">I", 180))
    r2 = extract_media(nc, mime="application/x-netcdf")
    assert r2["metadata"]["numrecs"] == ["5"]
    assert r2["metadata"]["dimensions"] == ["time=UNLIMITED", "lat=180"]

    r3 = extract_media(b"AC1027" + b"\x00" * 32, mime="image/vnd.dwg")
    assert r3["metadata"]["dwg-version"] == ["2013"]


def test_media_meta_never_raises_on_garbage():
    from tika_spark.media import _META_BY_MIME, extract_media
    import random
    rnd = random.Random(7)
    for mime in _META_BY_MIME:
        for n in (0, 3, 17, 64):
            blob = bytes(rnd.randrange(256) for _ in range(n))
            r = extract_media(blob, mime=mime)
            assert r["status"] == "ok"


def test_hdf_meta():
    from tika_spark.media import extract_media
    r = extract_media(b"\x89HDF\r\n\x1a\n\x00" + b"\x00" * 16,
                      mime="application/x-hdf")
    assert r["metadata"]["hdf-version"] == ["5"]
    r2 = extract_media(b"\x0e\x03\x13\x01" + b"\x00" * 8,
                       mime="application/x-hdf")
    assert r2["metadata"]["hdf-version"] == ["4"]


def test_swf_meta_dimensions():
    from tika_spark.media import extract_media
    # RECT nbits=15: [0,11000] x [0,8000] twips = 550x400 px
    import struct
    nbits = 15
    vals = [0, 11000, 0, 8000]
    bits = nbits
    width = 5
    for v in vals:
        bits = (bits << nbits) | v
        width += nbits
    pad = (8 - width % 8) % 8
    rect = (bits << pad).to_bytes((width + pad) // 8, "big")
    body = rect + b"\x00\x0c\x01\x00"   # frame rate + count filler
    swf = b"FWS\x07" + struct.pack("<I", 8 + len(body)) + body
    r = extract_media(swf, mime="application/x-shockwave-flash")
    m = r["metadata"]
    assert m["swf-version"] == ["7"]
    assert m["width"] == ["550"] and m["height"] == ["400"]


def test_abiword_routes_to_xml_text():
    from tika_spark.config import ExtractConfig
    from tika_spark.pipeline.stages import process_batch
    import pandas as pd
    abw = (b'<?xml version="1.0"?><abiword xmlns="http://www.abisource'
           b'.com/awml.dtd"><section><p>abi text here</p></section>'
           b"</abiword>")
    df = pd.DataFrame({"url": ["doc://a.abw"], "html": [abw]})
    out = process_batch(df, ExtractConfig(mode="text"), part_id=0)
    assert out.loc[0, "mime"] == "application/x-abiword"
    assert "abi text here" in out.loc[0, "text"]


class TestXmp:
    """APP1/iTXt XMP packets (reference: JpegParser's JempBox path)."""

    XMP = (b'<x:xmpmeta xmlns:x="adobe:ns:meta/">'
           b'<rdf:RDF xmlns:rdf='
           b'"http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
           b'<rdf:Description'
           b' xmlns:dc="http://purl.org/dc/elements/1.1/"'
           b' xmlns:xmp="http://ns.adobe.com/xap/1.0/">'
           b'<dc:title><rdf:Alt><rdf:li xml:lang="x-default">My Title'
           b'</rdf:li></rdf:Alt></dc:title>'
           b'<dc:creator><rdf:Seq><rdf:li>Jane Doe</rdf:li></rdf:Seq>'
           b'</dc:creator>'
           b'<dc:subject><rdf:Bag><rdf:li>cats</rdf:li>'
           b'<rdf:li>dogs</rdf:li></rdf:Bag></dc:subject>'
           b'<xmp:CreatorTool>TestTool 1.0</xmp:CreatorTool>'
           b'</rdf:Description></rdf:RDF></x:xmpmeta>')

    def test_jpeg_app1_xmp(self):
        import struct

        import numpy as np

        from tika_spark.analysis.jpegcodec import jpeg_bytes
        from tika_spark.media import extract_media
        jpg = jpeg_bytes(np.full((8, 8, 1), 100, np.uint8))
        seg = b"http://ns.adobe.com/xap/1.0/\x00" + self.XMP
        app1 = b"\xff\xe1" + struct.pack(">H", len(seg) + 2) + seg
        m = extract_media(jpg[:2] + app1 + jpg[2:], mime="image/jpeg")
        md = m["metadata"]
        assert md["title"] == ["My Title"]
        assert md["Author"] == ["Jane Doe"]
        assert md["subject"] == ["cats", "dogs"]
        assert md["xmp:CreatorTool"] == ["TestTool 1.0"]
        assert md["width"] == ["8"]        # dims still parsed

    def test_png_itxt_xmp(self):
        import struct
        import zlib

        import numpy as np

        from tika_spark.analysis.pixels import png_bytes
        from tika_spark.media import extract_media
        png = png_bytes(np.zeros((2, 2, 3), np.uint8))
        body = b"XML:com.adobe.xmp\x00\x00\x00\x00\x00" + self.XMP
        chunk = (struct.pack(">I", len(body)) + b"iTXt" + body
                 + struct.pack(">I", zlib.crc32(b"iTXt" + body)))
        blob = png[:33] + chunk + png[33:]   # after sig+IHDR
        m = extract_media(blob, mime="image/png")
        assert m["metadata"]["title"] == ["My Title"]
        assert m["metadata"]["Author"] == ["Jane Doe"]

    def test_malformed_xmp_is_ignored(self):
        from tika_spark.media import _parse_xmp
        assert _parse_xmp(b"<broken <xml") == {}
        assert _parse_xmp(b"") == {}


class TestMidiText:
    """MTrk meta-event text (reference: audio/MidiParser.java emits
    track names / lyrics as body content, incl. karaoke .kar)."""

    @staticmethod
    def _varlen(v):
        out = bytearray([v & 0x7F])
        v >>= 7
        while v:
            out.insert(0, 0x80 | (v & 0x7F))
            v >>= 7
        return bytes(out)

    def _midi(self, events):
        import struct
        track = b"".join(events) + b"\x00\xff\x2f\x00"
        return (b"MThd" + struct.pack(">IHHH", 6, 1, 1, 480)
                + b"MTrk" + struct.pack(">I", len(track)) + track)

    def _meta(self, t, body):
        return b"\x00\xff" + bytes([t]) + self._varlen(len(body)) + body

    def test_track_name_lyrics_and_running_status(self):
        from tika_spark.media import extract_media
        midi = self._midi([
            self._meta(3, b"My Song"),
            self._meta(5, b"La la "),
            b"\x00\x90\x40\x40",      # note on
            b"\x00\x40\x40",          # running-status note
            self._meta(5, b"dee da"),
            self._meta(2, b"(c) 2026"),
        ])
        r = extract_media(midi, mime="audio/midi")
        assert r["title"] == "My Song"
        assert r["text"] == "La la dee da"   # raw lyric spacing kept
        assert r["metadata"]["copyright"] == ["(c) 2026"]
        assert r["metadata"]["tracks"] == ["1"]

    def test_header_only_fixture_shape_unchanged(self):
        import struct

        from tika_spark.media import extract_media
        blob = (b"MThd" + struct.pack(">IHHH", 6, 1, 2, 480)
                + b"not a track")
        r = extract_media(blob, mime="audio/midi")
        assert r["text"] == "" and r["metadata"]["tracks"] == ["2"]


class TestHeif:
    def test_avif_dims(self):
        from tika_spark.analysis.isobmff import heif_bytes, heif_dims
        assert heif_dims(heif_bytes(800, 600)) == (800, 600)
        # thumbnail ispe must lose to the primary extent
        assert heif_dims(heif_bytes(1920, 1080, brand=b"heic",
                                    thumb=(160, 90))) == (1920, 1080)
        assert heif_dims(b"") is None
        assert heif_dims(b"\x00\x00\x00\x08ftyp") is None

    def test_extract_media_route(self):
        from tika_spark.analysis.isobmff import heif_bytes
        from tika_spark.media import extract_media
        m = extract_media(heif_bytes(640, 480), mime="image/avif")
        assert m["metadata"]["width"] == ["640"]
        assert m["metadata"]["height"] == ["480"]


class TestJxl:
    def _jxl(self, w, h, small=False, ratio=0):
        bits = []

        def put(v, n):
            for k in range(n):
                bits.append((v >> k) & 1)

        def u32(v):
            for sel, n in enumerate((9, 13, 18, 30)):
                if v - 1 < (1 << n):
                    put(sel, 2)
                    put(v - 1, n)
                    return

        put(1 if small else 0, 1)
        put(h // 8 - 1, 5) if small else u32(h)
        put(ratio, 3)
        if ratio == 0:
            put(w // 8 - 1, 5) if small else u32(w)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for k, b in enumerate(bits[i:i + 8]):
                byte |= b << k
            out.append(byte)
        return b"\xff\x0a" + bytes(out) + b"\x00" * 4

    def test_dims(self):
        from tika_spark.media import _jxl_dims
        assert _jxl_dims(self._jxl(640, 480)) == (640, 480)
        assert _jxl_dims(self._jxl(64, 32, small=True)) == (64, 32)
        assert _jxl_dims(self._jxl(0, 90, ratio=5)) == (160, 90)
        assert _jxl_dims(b"\xff\x0a") is None
        assert _jxl_dims(b"junk") is None

    def test_container_form(self):
        from tika_spark.media import _jxl_dims

        def box(fcc, body):
            return (8 + len(body)).to_bytes(4, "big") + fcc + body

        cont = ((12).to_bytes(4, "big") + b"JXL " + b"\r\n\x87\n"
                + box(b"jxlc", self._jxl(800, 600)))
        assert _jxl_dims(cont) == (800, 600)


class TestAsfMeta:
    BASE = ("/root/reference/tika-parsers/src/test/resources/"
            "test-documents")

    def _meta(self, name, mime):
        import os
        import pytest as _p
        from tika_spark.media import extract_media
        p = os.path.join(self.BASE, name)
        if not os.path.isfile(p):
            _p.skip("corpus not present")
        with open(p, "rb") as f:
            return extract_media(f.read(), mime=mime)["metadata"]

    def test_wma_content_and_duration(self):
        md = self._meta("testWMA.wma", "audio/x-ms-wma")
        assert md["Author"][0].strip() == "administrator"
        assert md["WM/Year"] == ["2005-09-26"]
        assert md["asf:streams"] == ["audio"]
        assert 3000 < int(md["xmpDM:duration"][0]) < 3600

    def test_wmv_title_and_streams(self):
        md = self._meta("testWMV.wmv", "video/x-ms-wmv")
        assert md["title"] == ["support.microsoft.com"]
        assert md["copyright"] == ["2005 Microsoft"]
        assert md["asf:streams"] == ["audio,video"]

    def test_garbage_yields_empty(self):
        from tika_spark.media import _asf_meta
        assert _asf_meta(b"notasf" * 10) == {}
