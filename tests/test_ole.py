"""OLE2 (CFB) container detection + binary Office extraction tests.

Models the reference contracts: POIFSContainerDetector entry-name
discrimination, SummaryExtractor metadata mapping, WordExtractor /
ExcelExtractor / PowerPoint text shapes, OutlookExtractor message
properties and attachment recursion.
"""

import pytest

from tika_spark.fixtures.olegen import (make_doc, make_msg, make_ppt,
                                        make_xls, summary_info, write_cfb)
from tika_spark.mime.detector import detect
from tika_spark.ole import CfbFile, extract_ole, refine_ole2


class TestCfb:
    def test_mini_and_big_streams(self):
        big = bytes(range(256)) * 32          # 8192 B -> regular FAT
        mini = b"small stream payload"        # < 4096 -> mini stream
        data = write_cfb([((), "Big", big), ((), "Mini", mini)])
        cfb = CfbFile(data)
        assert cfb.stream("Big") == big
        assert cfb.stream("Mini") == mini
        assert cfb.top_level_names() == {"Big", "Mini"}

    def test_storage_paths(self):
        data = write_cfb([((), "top", b"t"), (("Dir",), "inner", b"i")])
        cfb = CfbFile(data)
        assert cfb.stream("inner", ("Dir",)) == b"i"
        assert cfb.stream("inner") is None   # path-qualified lookup

    def test_corrupt_raises_cleanly(self):
        with pytest.raises(Exception):
            CfbFile(b"\xd0\xcf\x11\xe0" + b"\x00" * 600)


class TestDetection:
    def test_refine_by_entry_names(self):
        assert refine_ole2(make_doc(["x"])) == "application/msword"
        assert refine_ole2(make_xls({"S": [["a"]]})) == \
            "application/vnd.ms-excel"
        assert refine_ole2(make_ppt(["x"])) == \
            "application/vnd.ms-powerpoint"
        assert refine_ole2(make_msg("s", "b")) == \
            "application/vnd.ms-outlook"

    def test_unknown_layout_stays_generic(self):
        blob = write_cfb([((), "Whatever", b"data")])
        assert refine_ole2(blob) == "application/x-tika-msoffice"

    def test_full_detect_path(self):
        # magic (D0CF11E0) -> x-tika-msoffice -> OLE2 refinement (B8)
        assert detect(make_doc(["x"]), "http://a/file.doc") == \
            "application/msword"


class TestWord:
    def test_paragraphs_one_per_line(self):
        r = extract_ole(make_doc(["Para one.", "Para two."]),
                        mime="application/msword")
        assert r["text"] == "Para one.\nPara two.\n"
        assert r["status"] == "ok"

    def test_summary_metadata(self):
        r = extract_ole(make_doc(["x"], title="The Title"),
                        mime="application/msword")
        assert r["title"] == "The Title"
        assert r["metadata"]["title"] == ["The Title"]

    def test_latin1_text(self):
        r = extract_ole(make_doc(["café déjà vu"]),
                        mime="application/msword")
        assert "café déjà vu" in r["text"]

    def test_unicode_piece(self):
        r = extract_ole(make_doc(["Кириллица текст", "Ünïcode"],
                                 unicode_piece=True),
                        mime="application/msword")
        assert r["text"] == "Кириллица текст\nÜnïcode\n"

    def test_word95_fc_run(self):
        from tika_spark.fixtures.olegen import make_doc95
        r = extract_ole(make_doc95(["Old format para one.", "Two."]),
                        mime="application/msword")
        assert r["text"] == "Old format para one.\nTwo.\n"

    def test_subranges_header_notes_footer(self):
        """FIB subranges in the reference's WordExtractor.java:85-113
        emit order: header stories, body, footnotes, comments,
        endnotes, footer stories (PlcfHdd story split)."""
        r = extract_ole(make_doc(
            ["Body one", "Body two"], header="Page header",
            footer="Page footer", footnotes=["a footnote"],
            comments=["a comment"], endnotes=["an endnote"]),
            mime="application/msword")
        assert r["text"] == ("Page header\nBody one\nBody two\n"
                             "a footnote\na comment\nan endnote\n"
                             "Page footer\n")

    def test_subranges_unicode_piece(self):
        r = extract_ole(make_doc(["Тело"], header="Шапка",
                                 unicode_piece=True),
                        mime="application/msword")
        assert r["text"] == "Шапка\nТело\n"


class TestExcel:
    def test_rows_tab_joined(self):
        xls = make_xls({"Data": [["Name", "Qty"], ["apples", 12],
                                 ["pears", 3.5]]})
        r = extract_ole(xls, mime="application/vnd.ms-excel")
        assert r["text"] == "Data\nName\tQty\napples\t12\npears\t3.5\n"

    def test_two_sheets_in_order(self):
        xls = make_xls({"First": [["a"]], "Second": [["b"]]})
        r = extract_ole(xls, mime="application/vnd.ms-excel")
        assert r["text"] == "First\na\nSecond\nb\n"


class TestPpt:
    def test_text_atoms(self):
        r = extract_ole(make_ppt(["Title slide", "Body text"]),
                        mime="application/vnd.ms-powerpoint")
        assert r["text"] == "Title slide\nBody text\n"

    def test_unicode_atom(self):
        r = extract_ole(make_ppt(["Ünïcode — slide"]),
                        mime="application/vnd.ms-powerpoint")
        assert "Ünïcode — slide" in r["text"]


class TestMsg:
    def test_properties(self):
        msg = make_msg("Sub", "The body.", sender="Alice")
        r = extract_ole(msg, mime="application/vnd.ms-outlook")
        assert r["text"] == "The body.\n"
        assert r["metadata"]["subject"] == ["Sub"]
        assert r["metadata"]["Message-From"] == ["Alice"]
        assert r["title"] == "Sub"

    def test_attachment_children(self):
        msg = make_msg("s", "b",
                       attachments=[("inner.txt", b"attached payload")])
        r = extract_ole(msg, mime="application/vnd.ms-outlook")
        assert r["children"] == [("inner.txt", b"attached payload")]


class TestRobustness:
    def test_garbage_is_error_row(self):
        r = extract_ole(b"\xd0\xcf\x11\xe0 garbage", mime="application/msword")
        assert r["status"] == "error"

    def test_truncated_never_raises(self):
        full = make_doc(["some text"])
        for cut in (8, 100, 512, 700, len(full) - 40):
            r = extract_ole(full[:cut], mime="application/msword")
            assert isinstance(r["text"], str)

    def test_summary_info_standalone_parse(self):
        blob = write_cfb([((), "\x05SummaryInformation",
                           summary_info(title="T", author="A",
                                        keywords="k1, k2"))])
        r = extract_ole(blob)
        assert r["metadata"]["title"] == ["T"]
        assert r["metadata"]["Author"] == ["A"]
        assert r["metadata"]["Keywords"] == ["k1, k2"]


@pytest.mark.usefixtures("spark")
class TestPipeline:
    def test_doc_through_pipeline(self, spark):
        from tika_spark.pipeline.job import extract
        df = spark.createDataFrame(
            [("u://r.doc", make_doc(["Pipeline para"], title="PT"))],
            "url string, html binary")
        row = extract(df, mode="text").collect()[0]
        assert row["mime"] == "application/msword"
        assert row["text"] == "Pipeline para\n"
        assert row["title"] == "PT"

    def test_msg_attachment_recursion(self, spark):
        from tika_spark.pipeline.job import extract_recursive
        msg = make_msg("s", "b", attachments=[
            ("page.html", b"<html><body><p>from attachment</p>"
                          b"</body></html>")])
        df = spark.createDataFrame([("u://m.msg", msg)],
                                   "url string, html binary")
        out = {r["url"]: r for r in
               extract_recursive(df, mode="text").collect()}
        assert out["u://m.msg"]["mime"] == "application/vnd.ms-outlook"
        assert out["u://m.msg!/page.html"]["text"] == "from attachment\n"
        assert out["u://m.msg!/page.html"]["depth"] == 1


# ------------------------------------------- Visio / Publisher text --


class TestVisioPublisher:
    def test_pub_text_bits(self):
        from tika_spark.fixtures.olegen import make_pub
        pub = make_pub(["0123456789", "abcdef"], author="A",
                       title="Bulletin")
        assert refine_ole2(pub) == "application/x-mspublisher"
        assert detect(pub, None) == "application/x-mspublisher"
        r = extract_ole(pub, mime="application/x-mspublisher")
        # PublisherTextExtractor: each TEXT bit + "\n", then the <p>
        # wrap adds one more (OfficeParser.java:197-200)
        assert r["text"] == "0123456789\nabcdef\n\n"
        assert r["metadata"]["Author"] == ["A"]
        assert r["title"] == "Bulletin"

    def test_pub_cr_normalized(self):
        from tika_spark.fixtures.olegen import make_pub
        r = extract_ole(make_pub(["line1\rline2"]),
                        mime="application/x-mspublisher")
        assert r["text"] == "line1\nline2\n\n"

    @pytest.mark.parametrize("compress", [True, False])
    @pytest.mark.parametrize("version", [6, 11])
    def test_visio_stories(self, compress, version):
        from tika_spark.fixtures.olegen import make_visio
        vsd = make_visio(["First story\n", "Second one\n"],
                         author="Hogwarts", compress=compress,
                         version=version)
        assert refine_ole2(vsd) == "application/vnd.visio"
        r = extract_ole(vsd, mime="application/vnd.visio")
        # each story becomes one <p> (OfficeParser.java:212-218)
        assert r["text"] == "First story\n\nSecond one\n\n"
        assert r["metadata"]["Author"] == ["Hogwarts"]

    def test_visio_lzw_roundtrip_long(self):
        # > 1 flag-group and > ring-buffer payload through the real
        # decompressor
        from tika_spark.fixtures.olegen import make_visio
        story = "x" * 5000 + " end of story"
        r = extract_ole(make_visio([story]),
                        mime="application/vnd.visio")
        assert r["text"] == story + "\n"

    def test_visio_corrupt_stream_is_quiet(self):
        from tika_spark.ole.visio import visio_text_stories
        assert visio_text_stories(b"junk") == []
        doc = b"Visio (TM) Drawing\r\n" + b"\x00" * 100
        assert visio_text_stories(doc) == []

    def test_reference_corpus_files(self):
        import os
        base = ("/root/reference/tika-parsers/src/test/resources/"
                "test-documents")
        vsd_p = os.path.join(base, "testVISIO.vsd")
        pub_p = os.path.join(base, "testPUBLISHER.pub")
        if not (os.path.exists(vsd_p) and os.path.exists(pub_p)):
            pytest.skip("reference corpus not available")
        vsd = open(vsd_p, "rb").read()
        r = extract_ole(vsd, mime=refine_ole2(vsd))
        # VisioParserTest.java:39-46 expectations
        assert "Some random text, on a page" in r["text"]
        assert r["metadata"]["Author"] == ["Hogwarts"]
        pub = open(pub_p, "rb").read()
        r = extract_ole(pub, mime=refine_ole2(pub))
        # PublisherParserTest.java:41-48 expectations
        assert "0123456789" in r["text"]
        assert "abcdef" in r["text"]
        assert r["metadata"]["Author"] == ["Nick Burch"]


class TestSstContinuation:
    """SST spanning CONTINUE records ([MS-XLS] continuation rules)."""

    @staticmethod
    def _entry(s, high=False):
        import struct
        grbit = 1 if high else 0
        enc = s.encode("utf-16-le") if high else s.encode("cp1252")
        return struct.pack("<HB", len(s), grbit) + enc

    def test_string_splits_across_continue(self):
        import struct

        from tika_spark.ole.parser import _xls_sst
        # string 2 = 'abcdef', split after 'abc' (compressed chars);
        # the continuation segment restarts with a fresh grbit byte
        seg1 = (struct.pack("<II", 3, 3)
                + self._entry("first")
                + struct.pack("<HB", 6, 0) + b"abc")
        seg2 = (b"\x00" + b"def"          # grbit 0 + remaining chars
                + self._entry("tail"))
        assert _xls_sst([seg1, seg2]) == ["first", "abcdef", "tail"]

    def test_split_switches_to_wide_chars(self):
        import struct

        from tika_spark.ole.parser import _xls_sst
        # remaining chars continue in utf-16 (grbit flips to 1)
        seg1 = (struct.pack("<II", 1, 1)
                + struct.pack("<HB", 5, 0) + b"ab")
        seg2 = b"\x01" + "cdé".encode("utf-16-le")
        assert _xls_sst([seg1, seg2]) == ["abcdé"]

    def test_header_split_without_grbit(self):
        import struct

        from tika_spark.ole.parser import _xls_sst
        # the cch/grbit header itself may split with NO extra byte
        whole = struct.pack("<II", 1, 1) + self._entry("hello")
        seg1, seg2 = whole[:9], whole[9:]  # split inside the header
        assert _xls_sst([seg1, seg2]) == ["hello"]


def test_tnef_named_property_prefix_skipped():
    """A named MAPI property (pid >= 0x8000) before the long-filename
    prop must not desync the walk (GUID + kind prefix)."""
    import struct

    from tika_spark.mail import _mapi_long_filename
    val = b"real name.txt\x00"
    pad = (-len(val)) % 4
    named_val = b"x\x00\x00\x00"
    blob = (struct.pack("<I", 2)
            # named PT_STRING8 prop, pid 0x8123, kind 0 (by GUID id)
            + struct.pack("<HH", 0x001E, 0x8123)
            + b"\x11" * 16 + struct.pack("<I", 0)
            + struct.pack("<I", 1)
            + struct.pack("<I", len(named_val)) + named_val
            # then the real PidTagAttachLongFilename
            + struct.pack("<HH", 0x001E, 0x3707)
            + struct.pack("<I", 1)
            + struct.pack("<I", len(val)) + val + b"\x00" * pad)
    assert _mapi_long_filename(blob) == "real name.txt"
