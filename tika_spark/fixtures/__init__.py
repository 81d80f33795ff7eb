"""Deterministic synthetic fixture generators (FIXTURES.md).

Everything here is seeded and reproducible byte-for-byte; no external
data. The pages generator models the reference's golden corpus
(tika-parsers/src/test/resources/test-documents) shapes over the
Common-Crawl-style input schema (url, warc_ts, html, text, lang).
"""
