"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Schema (BASELINE.json input_hint): url STRING, warc_ts TIMESTAMP,
html BINARY, text STRING, lang STRING (+ source STRING variant tag).

``text`` is the GOLDEN expectation for the default full-text mode,
constructed independently by the generator from the pinned layout
semantics (XHTMLContentHandler TAB/NEWLINE contract etc.), so
`extract(pages)` vs `text` is a real end-to-end byte-equality check.
``gen_row`` additionally returns the golden text-main output for the
variants that define one.

Generation is pure per-row (seeded by row id only), so the table is
identical under any partitioning/parallelism — and can be produced
distributed via ``mapInPandas`` over ``spark.range`` without any
driver-side materialization (the 100TB-scale generation path).
"""

from __future__ import annotations

import datetime as _dt
import zlib

import numpy as np
import pandas as pd

from tika_spark.fixtures.pdfgen import make_pdf
from tika_spark.language.corpus import SEED_TEXT

_BASE_TS = _dt.datetime(2026, 3, 1, 0, 0, 0)

_TEXT_LANGS = ("en", "de", "fr", "es", "ru")

# sentence pools per language, derived deterministically from the seed
# corpora (split on '. ')
_SENTENCES = {
    lang: [s.strip() + "." for s in SEED_TEXT[lang].replace("。", ".").split(". ")
           if len(s.strip()) > 10]
    for lang in _TEXT_LANGS
}

VARIANTS = (
    "html_plain", "html_boiler", "html_meta_charset", "html_no_charset",
    "html_big_preamble", "html_evil", "xhtml", "html_base_href",
    "html_table_layout", "pdf_simple", "pdf_two_boxes", "txt_utf8",
    "txt_utf16le", "txt_cp866", "xml_dc", "rss", "binary_junk",
    "zip_archive", "gz_txt", "rtf_doc", "docx_doc", "eml_msg",
    "ole_doc", "ole_xls", "chm_help",
)
GIANT_EVERY = 997  # row ids divisible by this become giant_html (p99.9 tail)

_META_CHARSETS = ("utf-8", "iso-8859-1", "windows-1252", "koi8-r",
                  "gb18030", "shift_jis")


def _rng(i: int, seed: int) -> np.random.Generator:
    return np.random.default_rng((seed << 32) ^ (i * 2654435761 & 0xFFFFFFFF))


def _lang_of(i: int) -> str:
    return _TEXT_LANGS[i % len(_TEXT_LANGS)]


def _sentences(i: int, seed: int, lang: str, n: int) -> list[str]:
    pool = _SENTENCES[lang]
    r = _rng(i, seed)
    idx = r.integers(0, len(pool), size=n)
    return [pool[j] for j in idx]


def _para(i, seed, lang, n_sent, salt=0):
    return " ".join(_sentences(i * 131 + salt, seed, lang, n_sent))


def gen_row(i: int, seed: int = 42) -> dict:
    """One deterministic page. Returns url/warc_ts/html/text/lang/source
    plus golden 'text_main' (None when the variant defines none)."""
    if i % GIANT_EVERY == 0 and i > 0:
        variant = "giant_html"
    else:
        variant = VARIANTS[i % len(VARIANTS)]
    lang = _lang_of(i)
    builder = _BUILDERS[variant]
    row = builder(i, seed, lang)
    row["url"] = row.get("url") or \
        f"https://site{i % 50}.example/p/{i}{row.get('ext', '.html')}"
    row["warc_ts"] = _BASE_TS + _dt.timedelta(seconds=i)
    row.setdefault("lang", lang)  # builders may pin the true body language
    row["source"] = variant
    row.setdefault("text_main", None)
    row.pop("ext", None)
    return row


# ---------------------------------------------------------------- builders


def _html_plain(i, seed, lang):
    title = f"Page {i} title"
    p1 = _para(i, seed, lang, 3)
    p2 = _para(i, seed, lang, 2, salt=1)
    anchor = "more here"
    html = (f"<html><head><title>{title}</title>"
            f'<meta name="author" content="author-{i % 7}">'
            f"</head><body><h1>{title}</h1>"
            f"<p>{p1} <a href=\"/next/{i}\">{anchor}</a></p>"
            f"<p>{p2}</p></body></html>")
    golden = f"{title}\n{p1} {anchor}\n{p2}\n"
    return {"html": html.encode("utf-8"), "text": golden}


def _html_boiler(i, seed, lang):
    nav = ('<table><tr><td><a href="/">Home</a> | <a href="/n">News</a> | '
           '<a href="/s">Sport</a> | <a href="/w">Weather</a></td></tr></table>')
    meat = _para(i, seed, lang, 8)  # > 40 words
    tail = _para(i, seed, lang, 2, salt=2)
    footer = ('<div><a href="/about">About</a> <a href="/contact">Contact</a>'
              " legal</div>")
    html = (f"<html><head><title>B{i}</title></head><body>{nav}"
            f"<p>{meat}</p><p>{tail}</p>{footer}</body></html>")
    golden = ("\tHome | News | Sport | Weather\n\n"
              f"{meat}\n{tail}\nAbout Contact legal\n")
    golden_main = f"{meat}\n{tail}\n"
    return {"html": html.encode("utf-8"), "text": golden,
            "text_main": golden_main}


def _html_meta_charset(i, seed, lang):
    charset = _META_CHARSETS[i % len(_META_CHARSETS)]
    bodies = {
        "utf-8": "héllo wörld — naïve café",
        "iso-8859-1": "café naïve détail",
        "windows-1252": "smart “quotes” and – dashes",
        "koi8-r": "русский текст письма",
        "gb18030": "中文网页内容测试",
        "shift_jis": "日本語のページです",
    }
    body = bodies[charset]
    html = (f'<html><head><meta http-equiv="Content-Type" '
            f'content="text/html; charset={charset}"><title>C{i}</title>'
            f"</head><body><p>{body}</p></body></html>")
    golden = body + "\n"
    return {"html": html.encode(charset), "text": golden}


def _html_no_charset(i, seed, lang):
    body = "default \x93windows\x94 charset"
    golden = "default “windows” charset\n"
    html = (f"<html><head><title>N{i}</title></head>"
            f"<body><p>{body}</p></body></html>")
    return {"html": html.encode("latin-1"), "text": golden}


def _html_big_preamble(i, seed, lang):
    p = _para(i, seed, lang, 2)
    pad = "x" * 5000
    html = f"<!--{pad}-->\n<html><body><p>{p}</p></body></html>"
    return {"html": html.encode("utf-8"), "text": f"{p}\n"}


def _html_evil(i, seed, lang):
    p1 = _para(i, seed, lang, 2)
    p2 = _para(i, seed, lang, 2, salt=3)
    html = (f"<html><body><p>{p1}<p>{p2}"
            f"<script>var x = 'PAYLOAD{i}';</script>"
            f"<bogus attr=1>kept text</bogus></body></html>")
    # the second <p> stays open across the (discarded) script and the
    # unknown inline element, so its newline lands at the very end
    golden = f"{p1}\n{p2}kept text\n"
    return {"html": html.encode("utf-8"), "text": golden}


def _xhtml(i, seed, lang):
    p = _para(i, seed, lang, 2)
    html = ('<?xml version="1.0" encoding="utf-8"?>'
            '<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            f"<title>X{i}</title></head><body><p>{p}</p></body></html>")
    return {"html": html.encode("utf-8"), "text": f"{p}\n"}


def _html_base_href(i, seed, lang):
    p = _para(i, seed, lang, 1)
    html = (f'<html><head><base href="https://cdn{i % 5}.example/app/">'
            f"</head><body><p><a href=\"rel/{i}.html\">{p}</a>"
            f'<a href="mailto:a@b.c">mail</a></p></body></html>')
    return {"html": html.encode("utf-8"), "text": f"{p}mail\n"}


def _html_table_layout(i, seed, lang):
    html = (f"<html><body><table><tr><td>r1c1-{i}</td><td>r1c2</td></tr>"
            f"<tr><td>r2c1</td><td>r2c2</td></tr></table>"
            f"<ul><li>item-a</li><li>item-b</li></ul></body></html>")
    golden = (f"\tr1c1-{i}\tr1c2\n\tr2c1\tr2c2\n\n"
              "\titem-a\n\titem-b\n\n")
    return {"html": html.encode("utf-8"), "text": golden}


def _pdf_simple(i, seed, lang):
    lines = [f"Document {i} headline",
             _para(i, seed, "en", 1),
             _para(i, seed, "en", 1, salt=4)]
    pdf = make_pdf([lines], title=f"PDF {i}", author=f"author-{i % 7}")
    golden = "\n".join(lines) + "\n\n"
    return {"html": pdf, "text": golden, "ext": ".pdf"}


def _pdf_two_boxes(i, seed, lang):
    lines = [f"Left column line 1 of {i}", "Left column line 2",
             "Right column line 1", "Right column line 2"]
    pdf = make_pdf([lines], two_columns=True, title=f"Boxes {i}")
    golden = "\n".join(lines) + "\n\n"
    return {"html": pdf, "text": golden, "ext": ".pdf"}


def _txt_utf8(i, seed, lang):
    body = _para(i, seed, lang, 4)
    return {"html": body.encode("utf-8"), "text": body + "\n", "ext": ".txt"}


def _txt_utf16le(i, seed, lang):
    body = _para(i, seed, "ru", 4)
    return {"html": body.encode("utf-16-le"), "text": body + "\n",
            "ext": ".txt", "lang": "ru"}


def _txt_cp866(i, seed, lang):
    body = _para(i, seed, "ru", 4)
    return {"html": body.encode("cp866"), "text": body + "\n",
            "ext": ".txt", "lang": "ru"}


def _xml_dc(i, seed, lang):
    body = _para(i, seed, lang, 2)
    xml = ('<?xml version="1.0" encoding="UTF-8"?>'
           '<doc xmlns:dc="http://purl.org/dc/elements/1.1/">'
           f"<dc:title>DC {i}</dc:title><dc:creator>creator-{i % 7}"
           f"</dc:creator><body>{body}</body></doc>")
    golden = f"DC {i}creator-{i % 7}{body}\n"
    return {"html": xml.encode("utf-8"), "text": golden, "ext": ".xml"}


def _rss(i, seed, lang):
    items, golden_items = [], []
    for k in range(3):
        t = f"Entry {i}-{k}"
        d = _para(i, seed, lang, 1, salt=10 + k)
        items.append(f"<item><title>{t}</title><link>https://feed{i % 9}"
                     f".example/{i}/{k}</link><description>{d}</description>"
                     f"</item>")
        golden_items.append(f"\t{t}\n{d}\n")
    xml = (f'<?xml version="1.0"?><rss version="2.0"><channel>'
           f"<title>Feed {i}</title><description>About {i}</description>"
           f"{''.join(items)}</channel></rss>")
    golden = f"Feed {i}\nAbout {i}\n" + "".join(golden_items) + "\n"
    return {"html": xml.encode("utf-8"), "text": golden, "ext": ".rss"}


def _binary_junk(i, seed, lang):
    r = _rng(i, seed)
    data = r.integers(0, 256, size=512, dtype=np.uint8).tobytes()
    # avoid accidental magic hits
    data = b"\x00\x01" + data
    return {"html": data, "text": "", "ext": ""}


def _giant_html(i, seed, lang):
    # 1-8 MB page: repeated boilerplate paragraphs + one real block;
    # compressible like real template-heavy pages
    r = _rng(i, seed)
    n_rep = int(r.integers(2000, 16000))
    filler = f"<p>{_para(i, seed, 'en', 2)}</p>"
    real = _para(i, seed, lang, 6, salt=7)
    html = ("<html><head><title>giant</title></head><body>"
            + filler * n_rep + f"<p>{real}</p></body></html>")
    filler_txt = filler[3:-4] + "\n"
    golden = filler_txt * n_rep + real + "\n"
    return {"html": html.encode("utf-8"), "text": golden}


def _zip_archive(i, seed, lang):
    import io
    import zipfile
    buf = io.BytesIO()
    inner = _para(i, seed, lang, 2)
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in (("readme.txt", inner),
                              (f"data-{i % 5}.txt", "payload")):
            info = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            zf.writestr(info, payload.encode("utf-8"))
    golden = f"readme.txt\ndata-{i % 5}.txt\n"
    return {"html": buf.getvalue(), "text": golden, "ext": ".zip"}


def _gz_txt(i, seed, lang):
    import gzip
    body = _para(i, seed, lang, 3)
    gz = gzip.compress(body.encode("utf-8"), mtime=0)  # deterministic
    return {"html": gz, "text": f"note-{i}.txt\n",
            "url": f"https://site{i % 50}.example/p/note-{i}.txt.gz"}


def _rtf_escape(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if ch in "\\{}":
            out.append("\\" + ch)
        elif o < 128:
            out.append(ch)
        else:  # \uN with signed 16-bit param + one replacement char
            out.append(f"\\u{o - 65536 if o > 32767 else o}?")
    return "".join(out)


def _rtf_doc(i, seed, lang):
    p1 = _para(i, seed, lang, 2)
    p2 = _para(i, seed, lang, 1, salt=3)
    rtf = ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Arial;}}"
           f"{{\\info{{\\title Doc {i}}}}}"
           f"{_rtf_escape(p1)}\\par {_rtf_escape(p2)}\\par}}"
           ).encode("ascii")
    return {"html": rtf, "text": f"{p1}\n{p2}\n", "ext": ".rtf"}


def _docx_doc(i, seed, lang):
    import io
    import zipfile
    p1 = _para(i, seed, lang, 2)
    p2 = _para(i, seed, lang, 1, salt=4)
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    doc = (f'<w:document xmlns:w="{w}"><w:body>'
           f"<w:p><w:r><w:t>{p1}</w:t></w:r></w:p>"
           f"<w:p><w:r><w:t>{p2}</w:t></w:r></w:p>"
           "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in (("[Content_Types].xml", "<Types/>"),
                              ("word/document.xml", doc)):
            info = zipfile.ZipInfo(name, (1980, 1, 1, 0, 0, 0))
            zf.writestr(info, payload.encode("utf-8"))
    return {"html": buf.getvalue(), "text": f"{p1}\n{p2}\n",
            "ext": ".docx"}


def _eml_msg(i, seed, lang):
    body = _para(i, seed, lang, 2)
    subject = f"Message {i}"
    eml = (f"From: sender-{i % 9}@example.com\r\n"
           f"To: list@example.com\r\n"
           f"Subject: {subject}\r\n"
           f"Message-ID: <{i}@example.com>\r\n"
           f"Content-Type: text/plain; charset=utf-8\r\n\r\n"
           f"{body}\n").encode("utf-8")
    return {"html": eml, "text": f"{subject}\n{body}\n", "ext": ".eml"}


def _ole_doc(i, seed, lang):
    from tika_spark.fixtures.olegen import make_doc
    # cp1252 payload: pin to the ascii-safe english pool
    p1 = _para(i, seed, "en", 2)
    p2 = _para(i, seed, "en", 1, salt=5)
    return {"html": make_doc([p1, p2], title=f"Doc {i}"),
            "text": f"{p1}\n{p2}\n", "lang": "en", "ext": ".doc"}


def _ole_xls(i, seed, lang):
    from tika_spark.fixtures.olegen import make_xls
    rows = [["Name", "Val"], [f"row{i % 5}", i], ["total", i * 2]]
    return {"html": make_xls({"Sheet1": rows}),
            "text": f"Sheet1\nName\tVal\nrow{i % 5}\t{i}\ntotal\t{i * 2}\n",
            "lang": "en", "ext": ".xls"}


def _chm_help(i, seed, lang):
    from tika_spark.fixtures.chmgen import make_chm
    p1 = _para(i, seed, lang, 2)
    p2 = _para(i, seed, lang, 1, salt=6)
    pages = {"/a.html": f"<html><body><p>{p1}</p></body></html>"
             .encode("utf-8"),
             "/b.html": f"<html><body><p>{p2}</p></body></html>"
             .encode("utf-8")}
    return {"html": make_chm(pages, compressed=(i % 2 == 0)),
            "text": f"{p1}\n{p2}\n", "ext": ".chm"}


_BUILDERS = {
    "html_plain": _html_plain, "html_boiler": _html_boiler,
    "html_meta_charset": _html_meta_charset,
    "html_no_charset": _html_no_charset,
    "html_big_preamble": _html_big_preamble, "html_evil": _html_evil,
    "xhtml": _xhtml, "html_base_href": _html_base_href,
    "html_table_layout": _html_table_layout, "pdf_simple": _pdf_simple,
    "pdf_two_boxes": _pdf_two_boxes, "txt_utf8": _txt_utf8,
    "txt_utf16le": _txt_utf16le, "txt_cp866": _txt_cp866,
    "xml_dc": _xml_dc, "rss": _rss, "binary_junk": _binary_junk,
    "zip_archive": _zip_archive, "gz_txt": _gz_txt, "rtf_doc": _rtf_doc,
    "docx_doc": _docx_doc, "eml_msg": _eml_msg,
    "ole_doc": _ole_doc, "ole_xls": _ole_xls, "chm_help": _chm_help,
    "giant_html": _giant_html,
}

PAGES_COLUMNS = ["url", "warc_ts", "html", "text", "lang", "source"]


def generate_pages_pandas(n_rows: int, seed: int = 42,
                          start: int = 0) -> pd.DataFrame:
    rows = [gen_row(i, seed) for i in range(start, start + n_rows)]
    return pd.DataFrame({c: [r[c] for r in rows] for c in PAGES_COLUMNS})


def generate_pages_df(spark, n_rows: int, seed: int = 42,
                      partitions: int | None = None):
    """Distributed generation: spark.range -> mapInPandas (no driver
    materialization; scales to arbitrary n_rows)."""
    schema = ("url string, warc_ts timestamp, html binary, text string, "
              "lang string, source string")

    def gen(iterator):
        for pdf in iterator:
            ids = pdf["id"].tolist()
            rows = [gen_row(int(i), seed) for i in ids]
            yield pd.DataFrame(
                {c: [r[c] for r in rows] for c in PAGES_COLUMNS})

    rng = spark.range(n_rows)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema=schema)
