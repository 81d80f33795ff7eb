"""MIME detection unit tests.

Port the *semantics* of the reference's detection tests:
MimeDetectionTest.java:42-91 (magic + hint precedence + BOM cases),
TextDetectorTest.java (2%/90%/512B thresholds), PatternsTest.java
(glob precedence), MediaTypeRegistry lattice behavior.
"""

import pandas as pd
import pytest

from tika_spark.mime import detector, globs, lattice, magic


class TestMagic:
    def test_pdf(self):
        assert magic.match_magic(b"%PDF-1.4 blah") == "application/pdf"

    def test_gzip(self):
        assert magic.match_magic(b"\x1f\x8b\x08rest") == "application/x-gzip"

    def test_zip(self):
        assert magic.match_magic(b"PK\x03\x04rest") == "application/zip"

    def test_png(self):
        assert magic.match_magic(b"\x89PNG\r\n\x1a\nxx") == "image/png"

    def test_html_tag_in_window(self):
        assert magic.match_magic(b"  \n <html><body>hi") == "text/html"
        assert magic.match_magic(b"<!DOCTYPE html><html>") == "text/html"
        assert magic.match_magic(b"<TITLE>t</TITLE>") == "text/html"

    def test_html_tag_outside_window_misses(self):
        pad = b" " * 100
        assert magic.match_magic(pad + b"<html>") != "text/html"

    def test_xml_decl(self):
        assert magic.match_magic(b"<?xml version='1.0'?><a/>") == "application/xml"

    def test_xml_utf16_boms(self):
        le = "<?xml version='1.0'?>".encode("utf-16-le")
        assert magic.match_magic(b"\xff\xfe" + le) == "application/xml"
        be = "<?xml version='1.0'?>".encode("utf-16-be")
        assert magic.match_magic(b"\xfe\xff" + be) == "application/xml"

    def test_bom_only_is_text(self):
        assert magic.match_magic(b"\xef\xbb\xbfhello") == "text/plain"
        assert magic.match_magic(b"\xff\xfeh\x00i\x00") == "text/plain"

    def test_no_match(self):
        assert magic.match_magic(b"\x00\x01\x02\x03unknown") is None


class TestTextSniff:
    def test_plain_ascii(self):
        assert detector.looks_like_text(b"Hello, plain world!\n")

    def test_empty_is_not_text(self):
        assert not detector.looks_like_text(b"")

    def test_control_bytes_binary(self):
        assert not detector.looks_like_text(b"\x00\x01\x02" + b"a" * 100)

    def test_two_percent_threshold(self):
        # 1 control byte in 512 is < 2% and rest ASCII -> text
        data = b"a" * 511 + b"\x01"
        assert detector.looks_like_text(data)
        # 11 control bytes in 512 is > 2% -> binary
        data = b"a" * 501 + b"\x01" * 11
        assert not detector.looks_like_text(data)

    def test_only_first_512_inspected(self):
        data = b"a" * 512 + b"\x00" * 100
        assert detector.looks_like_text(data)


class TestGlobs:
    def test_url_stripping(self):
        assert globs.resource_name_from_url(
            "https://x.example/a/b/page.html?q=1#frag") == "page.html"

    def test_percent_decode(self):
        assert globs.resource_name_from_url(
            "https://x.example/My%20Doc.pdf") == "My Doc.pdf"

    def test_ext_lookup(self):
        assert globs.match_name("http://a/b.xls") == "application/vnd.ms-excel"
        assert globs.match_name("file.TXT") == "text/plain"
        assert globs.match_name("noext") is None


class TestLattice:
    def test_xml_plus_suffix(self):
        assert lattice.supertype("application/rss+xml") == "application/xml"

    def test_text_star(self):
        assert lattice.supertype("text/x-anything") == "text/plain"

    def test_specialization_transitive(self):
        assert lattice.is_specialization_of("application/rss+xml", "text/plain")
        assert lattice.is_specialization_of("text/html", "text/plain")
        assert lattice.is_specialization_of("application/pdf",
                                            "application/octet-stream")
        assert not lattice.is_specialization_of("text/plain", "text/html")

    def test_chain_ends_at_octet(self):
        chain = lattice.supertype_chain("image/svg+xml")
        assert chain[-1] == "application/octet-stream"


class TestComposite:
    def test_root_xml_refinement_rss(self):
        data = b"<?xml version='1.0'?>\n<rss version='2.0'><channel/></rss>"
        assert detector.detect(data) == "application/rss+xml"

    def test_root_xml_refinement_atom(self):
        data = b"<?xml version='1.0'?><feed xmlns='http://www.w3.org/2005/Atom'/>"
        assert detector.detect(data) == "application/atom+xml"

    def test_xhtml_via_namespace(self):
        data = (b"<?xml version='1.0'?>"
                b"<html xmlns='http://www.w3.org/1999/xhtml'><head/></html>")
        assert detector.detect(data) == "application/xhtml+xml"

    def test_name_hint_specializes(self):
        # text/plain magic + .csv name -> text/csv (specialization wins)
        assert detector.detect(b"a,b,c\n1,2,3\n", "http://x/f.csv") == "text/csv"

    def test_name_hint_ignored_when_not_specialization(self):
        # PDF magic + .txt name: text/plain is NOT below pdf -> magic wins
        assert detector.detect(b"%PDF-1.4", "http://x/f.txt") == "application/pdf"

    def test_declared_hint_specializes(self):
        got = detector.detect(b"plain words here",
                              declared_type="text/html; charset=utf-8")
        assert got == "text/html"

    def test_empty_stream(self):
        assert detector.detect(b"") == "application/octet-stream"
        assert detector.detect(None) == "application/octet-stream"

    def test_binary_junk(self):
        assert detector.detect(bytes(range(256)) * 4) == "application/octet-stream"

    def test_big_preamble_html(self):
        # >4KB of comments before <html>: magic 0:64 misses, root-XML hits
        data = b"<!--" + b"x" * 5000 + b"-->\n<html><body>hi</body></html>"
        assert detector.detect(data) == "text/html"


class TestBatch:
    def test_batch_matches_scalar(self):
        payloads = [
            b"%PDF-1.4 x", b"<html><body>a</body></html>",
            b"<?xml version='1.0'?><rss><channel/></rss>",
            b"plain text here", b"\x00\x01\x02\x03", b"",
            b"PK\x03\x04zipdata", b"\x1f\x8bgz",
        ]
        urls = [None, "http://a/x.html", None, "http://a/notes.txt",
                None, None, "http://a/a.zip", None]
        s = pd.Series(payloads)
        u = pd.Series(urls)
        got = detector.detect_batch(s, u).tolist()
        want = [detector.detect(p, uu) for p, uu in zip(payloads, urls)]
        assert got == want

    def test_batch_hint_specialization_on_hot_path(self):
        s = pd.Series([b"<?xml version='1.0'?><html xmlns='http://www.w3.org/1999/xhtml'/>"])
        u = pd.Series(["http://a/page.xhtml"])
        assert detector.detect_batch(s, u).tolist() == ["application/xhtml+xml"]


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))


def test_no_glob_specializes_hot_paths():
    """detect_batch skips the per-row hint loop for url-only rows on
    the pdf/html hot paths; that is only sound while no glob extension
    maps to a specialization of those types. Pin it."""
    from tika_spark.mime import lattice
    from tika_spark.mime.globs import EXT_MAP
    for base in ("text/html", "application/pdf"):
        offending = [
            (ext, mime) for ext, mime in EXT_MAP.items()
            if base in list(lattice.supertype_chain(mime))[1:]]
        assert offending == [], (
            f"glob now specializes {base}: {offending} — re-enable the "
            "name-hint loop in detect_batch for these rows")
