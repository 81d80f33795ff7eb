"""RTF parser tests (E4) — tokenizer, charsets, unicode, destinations."""

from tika_spark.config import ExtractConfig
from tika_spark.mime.detector import detect
from tika_spark.rtf import extract_rtf

CFG = ExtractConfig()


def rtf(body: str) -> bytes:
    return ("{\\rtf1\\ansi\\deff0 " + body + "}").encode("latin-1")


def test_detect_rtf():
    assert detect(rtf("hello")) == "application/rtf"


def test_plain_paragraphs():
    r = extract_rtf(rtf("Hello world\\par Second line\\par"))
    assert r["text"] == "Hello world\nSecond line\n"
    assert r["status"] == "ok"


def test_escapes_and_symbols():
    r = extract_rtf(rtf("A\\{B\\}C \\emdash  D"))
    assert "A{B}C" in r["text"]
    assert "—" in r["text"]


def test_hex_bytes_with_ansicpg():
    # \'e9 in cp1252 = é
    r = extract_rtf(b"{\\rtf1\\ansi\\ansicpg1252 caf\\'e9}")
    assert r["text"] == "caf\u00e9\n"


def test_hex_bytes_cyrillic_cp1251():
    # \'cf\'f0 in cp1251 = Пр
    r = extract_rtf(b"{\\rtf1\\ansi\\ansicpg1251 \\'cf\\'f0}")
    assert r["text"] == "\u041f\u0440\n"


def test_unicode_with_uc_skip():
    # \u1055? : the '?' replacement must be skipped (uc1 default)
    r = extract_rtf(b"{\\rtf1\\ansi \\u1055?\\u1088?ok}")
    assert r["text"] == "\u041f\u0440ok\n"


def test_fonttbl_and_info_ignored():
    doc = (b"{\\rtf1\\ansi"
           b"{\\fonttbl{\\f0\\fswiss\\fcharset0 Arial;}}"
           b"{\\info{\\title My Title}{\\author Bob}}"
           b"body text\\par}")
    r = extract_rtf(doc)
    assert r["text"] == "body text\n"
    assert "Arial" not in r["text"]
    assert r["title"] == "My Title"
    assert r["metadata"]["Author"] == ["Bob"]


def test_star_destination_ignored():
    r = extract_rtf(b"{\\rtf1\\ansi {\\*\\generator Foo 1.0;}visible}")
    assert r["text"] == "visible\n"


def test_hyperlink_field():
    doc = (b"{\\rtf1\\ansi {\\field"
           b"{\\*\\fldinst HYPERLINK \"http://ex.com/x\"}"
           b"{\\fldrslt click here}}\\par}")
    r = extract_rtf(doc)
    assert ("a", "http://ex.com/x", "", "") in r["links"]
    assert "click here" in r["text"]
    assert "HYPERLINK" not in r["text"]


def test_tab_cell_row():
    r = extract_rtf(rtf("a\\cell b\\cell\\row c\\par"))
    assert r["text"] == "a\tb\t\nc\n"


def test_bin_skip():
    r = extract_rtf(b"{\\rtf1\\ansi \\bin5 \x00\x01\x02\x03\x04after}")
    assert r["text"] == "after\n"


def test_fcharset_font_switch():
    doc = (b"{\\rtf1\\ansi"
           b"{\\fonttbl{\\f0\\fcharset204 X;}}"
           b"{\\f0 \\'cf\\'f0}}")
    r = extract_rtf(doc)  # cp1251 via font charset
    assert r["text"] == "\u041f\u0440\n"


def test_through_pipeline(spark):
    from tika_spark.pipeline.job import extract
    df = spark.createDataFrame(
        [("u://d.rtf", rtf("From Spark\\par"))], "url string, html binary")
    row = extract(df, mode="text").collect()[0]
    assert row["mime"] == "application/rtf"
    assert row["text"] == "From Spark\n"


class TestRtfHardening:
    """Round-2 review fixes: hostile constructs and spec edges."""

    def test_negative_bin_terminates(self):
        r = extract_rtf(rb"{\rtf1 AAA\bin-9\bin-9 done}")
        assert r["status"] == "ok" and "done" in r["text"]

    def test_out_of_range_unicode_dropped_not_fatal(self):
        r = extract_rtf(b"{\\rtf1 keep \\u1114112? this}")
        assert r["status"] == "ok"
        assert "keep" in r["text"] and "this" in r["text"]

    def test_info_group_is_metadata_not_text(self):
        r = extract_rtf(
            b"{\\rtf1{\\info{\\doccomm a note}{\\operator Jane}}Hello}")
        assert r["text"] == "Hello\n"
        assert r["metadata"]["comments"] == ["a note"]

    def test_every_hyperlink_field_collected(self):
        r = extract_rtf(
            b"{\\rtf1 {\\field{\\*\\fldinst HYPERLINK \"http://a/\"}"
            b"{\\fldrslt A}} and {\\field{\\*\\fldinst HYPERLINK "
            b"\"http://b/\"}{\\fldrslt B}}}")
        assert [u for _, u, _, _ in r["links"]] == \
            ["http://a/", "http://b/"]

    def test_backslash_crlf_is_par(self):
        r = extract_rtf(b"{\\rtf1 one\\\r\ntwo}")
        assert r["text"] == "one\ntwo\n"

    def test_control_word_output_not_uc_skipped(self):
        # \uc1荤 with the fallback char omitted: the \par must
        # still produce its newline (control output is unskippable)
        r = extract_rtf(b"{\\rtf1\\uc1 a\\u8364\\par b}")
        assert "\n" in r["text"].rstrip("\n") or \
            r["text"].count("\n") >= 2
