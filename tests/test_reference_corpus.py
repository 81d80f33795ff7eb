"""Integration sweep over the reference's OWN golden corpus: every
file in tika-parsers' test-documents (216 real documents — the
corpus the reference's unit tests run against) goes through the full
pipeline (detect → route → parse) in one job.

Pins three things the synthetic fixtures cannot:
- fault isolation on real-world binaries (no file may error the job,
  and the unparsed tail is an exact, explainable set);
- detection over real magic/container bytes;
- extracted-content phrases lifted from the reference's own test
  assertions (e.g. PowerPointParserTest: "Sample Powerpoint Slide" /
  "Powerpoint X for Mac").
"""

import glob
import os

import pytest

CORPUS = "/root/reference/tika-parsers/src/test/resources/test-documents"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not present")


@pytest.fixture(scope="module")
def extracted(spark):
    rows = []
    for p in sorted(glob.glob(CORPUS + "/*")):
        if os.path.isfile(p):
            with open(p, "rb") as f:
                rows.append((os.path.basename(p), bytearray(f.read())))
    df = spark.createDataFrame(rows, "url string, html binary")
    from tika_spark.pipeline.job import extract
    out = {r.url: r for r in
           extract(df, mode="text")
           .select("url", "mime", "status", "text").collect()}
    assert len(out) == len(rows)
    return out


# formats the reference (Tika ~1.0) also has no parser for; ours is
# that set MINUS netpbm (P1-P6 decode) and ASF/WMA/WMV (container
# metadata tier) — pipeline extensions beyond the reference
NO_PARSER = {
    "testACCESS.mdb",
}

DETECT = {
    "testPDF.pdf": "application/pdf",
    "testWORD.doc": "application/msword",
    "testWORD.docx": "application/vnd.openxmlformats-officedocument"
                     ".wordprocessingml.document",
    "testEXCEL.xls": "application/vnd.ms-excel",
    "testEXCEL.xlsx": "application/vnd.openxmlformats-officedocument"
                      ".spreadsheetml.sheet",
    "testPPT.ppt": "application/vnd.ms-powerpoint",
    "testPPT.pptx": "application/vnd.openxmlformats-officedocument"
                    ".presentationml.presentation",
    "testHTML.html": "text/html",
    "testXHTML.html": "text/html",
    "testTXT.txt": "text/plain",
    "testRTF.rtf": "application/rtf",
    "testXML.xml": "application/xml",
    "rsstest.rss": "application/rss+xml",
    "testEPUB.epub": "application/epub+zip",
    "testChm.chm": "application/vnd.ms-htmlhelp",
    "testVISIO.vsd": "application/vnd.visio",
    "testPUBLISHER.pub": "application/x-mspublisher",
    "test-outlook.msg": "application/vnd.ms-outlook",
    "testWINMAIL.dat": "application/vnd.ms-tnef",
    "testPages.pages": "application/vnd.apple.pages",
    "testNumbers.numbers": "application/vnd.apple.numbers",
    "testKeynote.key": "application/vnd.apple.keynote",
    "testOpenOffice2.odt": "application/vnd.oasis.opendocument.text",
    "testJPEG.jpg": "image/jpeg",
    "testPNG.png": "image/png",
    "testGIF.gif": "image/gif",
    "testBMP.bmp": "image/bmp",
    # TestMimeTypes.java:251 — "BMW to Make Hybrid Sports Car" must
    # NOT false-positive as a bitmap
    "testBMPfp.txt": "text/plain",
    "testTIFF.tif": "image/tiff",
    "testPSD.psd": "image/vnd.adobe.photoshop",
    "testSVG.svg": "image/svg+xml",
    "testMP3id3v2.mp3": "audio/mpeg",
    "testWAV.wav": "audio/x-wav",
    "testMID.mid": "audio/midi",
    "testFLV.flv": "video/x-flv",
    "testTrueType.ttf": "application/x-font-ttf",
    "testJAR.jar": "application/java-archive",
    "test-documents.tar": "application/x-gtar",
    "testDWG2007.dwg": "image/vnd.dwg",
    "testCADKEY.prt": "application/x-prt",
    "test.fb2": "application/x-fictionbook+xml",
    "sresa1b_ncar_ccsm3_0_run1_200001.nc": "application/x-netcdf",
    "AutoDetectParser.class": "application/java-vm",
    "testRFC822": "message/rfc822",
    "complex.mbox": "application/mbox",
}

# phrases from the reference's OWN test assertions (file: the
# reference test that pins each)
CONTENT = {
    # PowerPointParserTest.java:38-44
    "testPPT.ppt": ["Sample Powerpoint Slide", "Powerpoint X for Mac"],
    # HtmlParserTest / fixture body
    "testHTML.html": ["Test Indexation Html"],
    # TXTParserTest fixture
    "testTXT.txt": ["Test d'indexation de Txt"],
    # PDFParserTest.java:147 (reading order = box order)
    "testPDFTwoTextBoxes.pdf": [
        "Left column line 1", "Left column line 2",
        "Right column line 1", "Right column line 2"],
    # PDFParserTest.java:62-70: body text inside a /Fm1 form XObject,
    # per-glyph Tm positioning re-joined via the /Widths metrics
    "testPDF.pdf": ["Apache Tika",
                    "Tika - Content Analysis Toolkit",
                    "incubator", "Apache Software Foundation"],
    "testEXCEL.xls": ["Sample Excel Worksheet"],
    "testEXCEL.xlsx": ["Sample Excel Worksheet"],
    "testWORD.doc": ["Sample Word Document"],
    "testWORD.docx": ["Sample Word Document"],
    # WordParserTest comment handling
    "testComment.doc": ["Here is some text.", "Here is a comment"],
    "testOptionalHyphen.doc": ["optionalhyphen"],
    # Word 6.0 (wIdent 0xA5DC) — the reference CANNOT read this
    # (HWPF throws OldWordFileFormatException); contiguous-text FIB
    "testWORD6.doc": ["The quick brown fox jumps over the lazy dog"],
    "testVISIO.vsd": ["Test View"],
    "testPages.pages": ["Sample pages document"],
    "testKeynote.key": ["A sample presentation"],
    "testChm.chm": ["ALink command"],
    "testEPUB.epub": ["Chapter 1"],
    "rsstest.rss": ["TestChannel"],
    "test-outlook.msg": ["La réponse à vos attentes"],
    "russian.cp866.txt": ["Однажды"],
    "english.cp500.txt": ["IntelliStation POWER"],
    "testXML.xml": ["Rida Benjelloun"],
    "testJAR.jar": ["Empty.java"],
    "testCADKEY.prt": ["Top View", "Front View"],
    "testSVG.svg": ["Test SVG image"],
    "test-documents.tar": ["testEXCEL.xls", "testHTML.html"],
}


class TestReferenceCorpus:
    def test_fault_isolation_zero_errors(self, extracted):
        errors = sorted(u for u, r in extracted.items()
                        if r.status == "error")
        assert errors == []

    def test_unparsed_tail_is_exactly_the_reference_gap(self, extracted):
        nop = {u for u, r in extracted.items()
               if r.status == "no_parser"}
        assert nop == NO_PARSER

    def test_parse_coverage_rate(self, extracted):
        ok = sum(1 for r in extracted.values() if r.status == "ok")
        assert ok >= 200   # netpbm/Word6/Foxmail tiers beyond the ref

    def test_detection_pins(self, extracted):
        got = {u: extracted[u].mime for u in DETECT}
        assert got == DETECT

    def test_content_pins(self, extracted):
        missing = []
        for u, phrases in CONTENT.items():
            text = extracted[u].text or ""
            for ph in phrases:
                if ph not in text:
                    missing.append((u, ph))
        assert missing == []


MIMETEST = ("/root/reference/tika-parsers/src/test/java/org/apache/"
            "tika/mime/TestMimeTypes.java")

# reference expectations where full container-aware detection is
# STRICTLY MORE SPECIFIC than TestMimeTypes' raw-MimeTypes path
# (DefaultDetector with container detectors refines these; the test
# class exercises the magic-only layer)
MORE_SPECIFIC_OK = {
    "application/x-tika-msoffice", "application/x-tika-ooxml",
    "application/zip",
}


@pytest.mark.skipif(not os.path.isfile(MIMETEST),
                    reason="reference TestMimeTypes not present")
def test_reference_testmimetypes_parity():
    """Every (expected type, file) assertion in the reference's
    TestMimeTypes.java whose fixture exists must match our detector —
    or be a container-refined specialization of it."""
    import re

    from tika_spark.mime import lattice
    from tika_spark.mime.detector import detect
    with open(MIMETEST) as f:
        src = f.read()
    checked, bad = 0, []
    for kind, mt, fn in re.findall(
            r'(assertType|assertTypeByData)\("([^"]+)", "([^"]+)"\)',
            src):
        p = os.path.join(CORPUS, fn)
        if not os.path.isfile(p):
            continue
        with open(p, "rb") as f:
            data = f.read()
        got = detect(data, fn if kind == "assertType" else None)
        checked += 1
        if got == mt:
            continue
        if mt == "image/x-ms-bmp" and got == "image/bmp":
            continue  # our canonical name is the alias
        if mt in MORE_SPECIFIC_OK and got != "application/octet-stream":
            continue  # refined to the specific container type
        bad.append((kind, fn, mt, got))
    assert checked >= 50
    assert bad == []


# (file, metadata key, expected value) from the reference's parser
# tests: WordParserTest:47-48, ExcelParserTest:43-44,
# PowerPointParserTest:40-41, PDFParserTest:54-55, Mp3ParserTest:54-55,
# DcXMLParserTest, JpegParserTest:42-53 (our EXIF keys are the XMP
# names; values identical)
METADATA_PINS = [
    ("testWORD.doc", "title", "Sample Word Document"),
    ("testWORD.doc", "Author", "Keith Bennett"),
    ("testEXCEL.xls", "title", "Simple Excel document"),
    ("testEXCEL.xls", "Author", "Keith Bennett"),
    ("testPPT.ppt", "title", "Sample Powerpoint Slide"),
    ("testPPT.ppt", "Author", "Keith Bennett"),
    ("testPDF.pdf", "title", "Apache Tika - Apache Tika"),
    ("testPDF.pdf", "Author", "Bertrand Delacrétaz"),
    ("testMP3id3v2.mp3", "title", "Test Title"),
    ("testMP3id3v2.mp3", "Author", "Test Artist"),
    ("testXML.xml", "title", "Tika test document"),
    ("testXML.xml", "dc:creator", "Rida Benjelloun"),
    ("testJPEG_EXIF.jpg", "width", "100"),
    ("testJPEG_EXIF.jpg", "height", "68"),
    ("testJPEG_EXIF.jpg", "tiff:Make", "Canon"),
    ("testJPEG_EXIF.jpg", "tiff:Model", "Canon EOS 40D"),
    ("testJPEG_EXIF.jpg", "tiff:Software",
     "Adobe Photoshop CS3 Macintosh"),
    ("testJPEG_EXIF.jpg", "exif:FNumber", "5.6"),
    ("testJPEG_EXIF.jpg", "exif:IsoSpeedRatings", "400"),
    # ASF tier (beyond the reference: it has no ASF parser)
    ("testWMV.wmv", "title", "support.microsoft.com"),
    ("testWMV.wmv", "Author", "Microsoft"),
    ("testWMA.wma", "WM/Year", "2005-09-26"),
    ("testAFM.afm", "title", "TestFullName"),
    ("testAFM.afm", "font:FamilyName", "TestSymbol"),
]


def test_reference_metadata_pins(spark):
    names = sorted({f for f, _, _ in METADATA_PINS})
    rows = []
    for n in names:
        with open(os.path.join(CORPUS, n), "rb") as f:
            rows.append((n, bytearray(f.read())))
    df = spark.createDataFrame(rows, "url string, html binary")
    from tika_spark.pipeline.job import extract
    got = {r.url: r.metadata or {} for r in
           extract(df, mode="text")
           .select("url", "metadata").collect()}
    bad = []
    for fn, key, want in METADATA_PINS:
        vals = got[fn].get(key) or []
        if want not in vals:
            bad.append((fn, key, want, vals))
    assert bad == []


class TestEmbeddedResources:
    """POIContainerExtractionTest / OOXMLContainerExtractionTest
    semantics: embedded pictures and office docs surface as child
    rows through the F1 recursion."""

    @pytest.fixture(scope="class")
    def recursed(self, spark):
        names = ["testWORD_1img.doc", "testWORD_3imgs.doc",
                 "testEXCEL_1img.xls", "testEXCEL_embeded.xls",
                 "testWORD_embeded.doc", "testWORD_3imgs.docx",
                 "testPPT_2imgs.pptx", "EmbeddedPDF.docx",
                 "EmbeddedOutlook.docx"]
        rows = []
        for n in names:
            with open(os.path.join(CORPUS, n), "rb") as f:
                rows.append((n, bytearray(f.read())))
        df = spark.createDataFrame(rows, "url string, html binary")
        from tika_spark.pipeline.job import extract_recursive
        return {r.url: r for r in
                extract_recursive(df, mode="text")
                .select("url", "mime", "status", "text").collect()}

    def _kids(self, rec, parent):
        return sorted(u[len(parent) + 2:] for u in rec
                      if u.startswith(parent + "!/")
                      and "!/" not in u[len(parent) + 2:])

    def test_word_images_poi_names(self, recursed):
        # POIContainerExtractionTest:85-94 — exact names and order
        assert self._kids(recursed, "testWORD_1img.doc") == \
            ["image1.png"]
        assert self._kids(recursed, "testWORD_3imgs.doc") == \
            ["image1.png", "image2.jpg", "image3.png"]

    def test_excel_embedded_office_docs(self, recursed):
        # POIContainerExtractionTest:116-131 — 2 EMF icons, 1 PNG,
        # and the two embedded docs under their MBD storage names
        kids = self._kids(recursed, "testEXCEL_embeded.xls")
        assert kids == ["MBD0003271D.ppt", "MBD00032A24.doc",
                        "image1.emf", "image2.emf", "image3.png"]
        ppt = recursed["testEXCEL_embeded.xls!/MBD0003271D.ppt"]
        assert ppt.mime == "application/vnd.ms-powerpoint"
        assert ppt.status == "ok"
        doc = recursed["testEXCEL_embeded.xls!/MBD00032A24.doc"]
        assert doc.mime == "application/msword"
        assert "quick brown fox" in doc.text

    def test_word_embedded_objectpool(self, recursed):
        # POIContainerExtractionTest:169-186 — ObjectPool children
        kids = self._kids(recursed, "testWORD_embeded.doc")
        assert "_1345470949.xls" in kids
        assert "_1345471035.ppt" in kids
        assert "_1345471034.bin" in kids   # Package = raw docx
        x = recursed["testWORD_embeded.doc!/_1345471034.bin"]
        assert x.mime.endswith("wordprocessingml.document")

    def test_recursion_reaches_grandchildren(self, recursed):
        # images inside the re-wrapped embedded ppt/doc
        assert recursed[
            "testEXCEL_embeded.xls!/MBD00032A24.doc!/image1.png"
        ].mime == "image/png"

    def test_ooxml_media_children(self, recursed):
        assert self._kids(recursed, "testWORD_3imgs.docx") == \
            ["image2.png", "image3.jpeg", "image4.png"]
        assert self._kids(recursed, "testPPT_2imgs.pptx") == \
            ["image1.png", "image2.gif", "image3.png"]

    def test_ole_wrapper_unwraps_to_real_payload(self, recursed):
        pdf = recursed[
            "EmbeddedPDF.docx!/oleObject1.bin!/contents.bin"]
        assert pdf.mime == "application/pdf"
        assert "embedded as" in pdf.text
        msg = recursed["EmbeddedOutlook.docx!/oleObject1.bin!/"
                       "licensedTestMsgwAtt.msg"]
        assert msg.mime == "application/vnd.ms-outlook"
        # 4th level: the pdf attached to the embedded msg
        deep = [u for u in recursed
                if u.count("!/") == 3 and u.endswith(".pdf")]
        assert deep and recursed[deep[0]].status == "ok"


@pytest.mark.parametrize("mode", ["text-main", "xhtml", "metadata"])
def test_all_modes_fault_isolated_on_real_corpus(spark, mode):
    """Every output mode must survive all 216 real-world files with
    status rows only — the H1 contract is per-mode, not just for
    mode=text."""
    rows = []
    for p in sorted(glob.glob(CORPUS + "/*")):
        if os.path.isfile(p):
            with open(p, "rb") as f:
                rows.append((os.path.basename(p), bytearray(f.read())))
    df = spark.createDataFrame(rows, "url string, html binary")
    from tika_spark.pipeline.job import extract
    got = extract(df, mode=mode).select("url", "status").collect()
    assert len(got) == len(rows)
    errors = sorted(r.url for r in got if r.status == "error")
    assert errors == []


def test_full_census_matches_golden(extracted):
    """The frozen 216-file census (mime, status, text length per
    file) — the whole-corpus regression net. Regenerate
    tests/data/reference_corpus_census.json deliberately when an
    improvement changes it; silent drift fails here."""
    import json
    path = os.path.join(os.path.dirname(__file__), "data",
                        "reference_corpus_census.json")
    with open(path) as f:
        golden = json.load(f)
    got = {u: [r.mime, r.status, len(r.text or "")]
           for u, r in extracted.items()}
    diff = {u: (golden.get(u), got.get(u))
            for u in set(golden) | set(got)
            if golden.get(u) != got.get(u)}
    assert diff == {}
