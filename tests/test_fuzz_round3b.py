"""Property-based robustness for the late-round-3 surfaces: the
Markdown serializer, the SQLite/DBF parsers, and the BPE merge fold.

Same contract as tests/test_fuzz.py: arbitrary input must produce a
result row (or an error row), never an exception."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tika_spark.config import ExtractConfig
from tika_spark.dbparse import extract_dbf, extract_sqlite
from tika_spark.fixtures.dbgen import make_dbf, make_sqlite
from tika_spark.html.extract import extract_html

_MD_CONFIG = ExtractConfig(mode="markdown")
_SETTINGS = dict(max_examples=120, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@settings(**_SETTINGS)
@given(st.binary(max_size=4096))
def test_markdown_mode_never_raises(data):
    r = extract_html(data, "http://f.ex/p", config=_MD_CONFIG)
    assert isinstance(r["text"], str)
    assert r["status"] in ("ok", "output_limit", "write_limit")


@settings(**_SETTINGS)
@given(st.text(alphabet="<>/ab ip=\"'hrultdo13#*_[]()`|\\\n", max_size=400))
def test_markdown_mode_tag_soup(text):
    r = extract_html(text.encode(), config=_MD_CONFIG)
    assert isinstance(r["text"], str)


@settings(**_SETTINGS)
@given(st.binary(max_size=2048))
def test_sqlite_parser_never_raises(data):
    r = extract_sqlite(b"SQLite format 3\x00" + data)
    assert r["status"] in ("ok", "error", "output_limit")


@settings(**_SETTINGS)
@given(st.binary(max_size=2048))
def test_dbf_parser_never_raises(data):
    for payload in (data, b"\x03" + data):
        r = extract_dbf(payload)
        assert r["status"] in ("ok", "error", "output_limit")


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 30), st.integers(0, 12))
def test_dbf_truncations_contained(seed, cut_num, n_fields_mod):
    # build a valid dbf, then cut it at an arbitrary point
    fields = [(f"F{i}", "C", 4 + (seed + i) % 5)
              for i in range(1 + n_fields_mod)]
    rows = [tuple(str((seed * 7 + r * 13 + c) % 1000)
                  for c in range(len(fields))) for r in range(3)]
    dbf = make_dbf(fields, rows)
    r = extract_dbf(dbf[:max(1, len(dbf) - cut_num)])
    assert r["status"] in ("ok", "error", "output_limit")
    assert isinstance(r["text"], str)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab\"c'd", min_size=1, max_size=8),
                min_size=1, max_size=3, unique=True),
       st.lists(st.tuples(st.integers(-5, 5),
                          st.text(max_size=20)), max_size=4))
def test_sqlite_roundtrip_arbitrary_names(names, rows):
    db = make_sqlite([(nm, ["a INTEGER", "b TEXT"], rows)
                      for nm in names])
    r = extract_sqlite(db)
    assert r["status"] == "ok"
    assert r["metadata"]["Database-Tables"] == names


def _py_greedy_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


@pytest.mark.parametrize("word,a,b", [
    ("aaaa", "a", "a"), ("ababab", "a", "b"), ("aab", "a", "b"),
    ("abb", "a", "b"), ("xabay", "a", "b"), ("bbbb", "b", "b"),
])
def test_merge_fold_matches_greedy_reference(spark_session, word, a, b):
    import pyspark.sql.functions as F
    from tika_spark.analysis.bpe import _merge_fold
    df = (spark_session.createDataFrame([(word,)], "w string")
          .withColumn("syms", F.split("w", ""))
          .withColumn("m", _merge_fold(F.lit(a), F.lit(b))))
    got = df.select("m").first()[0]
    assert got == _py_greedy_merge(list(word), a, b)


@pytest.fixture(scope="module")
def spark_session():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2").getOrCreate())
    yield s


@settings(**_SETTINGS)
@given(st.binary(max_size=4096))
def test_cdx_scanner_never_raises(data):
    from tika_spark.sources.cdx import cdx_records, iter_members_with_offsets
    members = list(iter_members_with_offsets(data))
    # offsets+lengths always tile the input exactly
    pos = 0
    for off, clen, _ in members:
        assert off == pos and clen >= 0
        pos = off + clen
    assert pos == len(data)
    assert isinstance(cdx_records(data), list)


@settings(**_SETTINGS)
@given(st.binary(max_size=2048))
def test_cdx_scanner_with_valid_prefix(data):
    import gzip as _g

    from tika_spark.sources.cdx import iter_members_with_offsets
    good = _g.compress(b"WARC/1.0\r\n\r\npayload")
    members = list(iter_members_with_offsets(good + data))
    assert members[0][2] is not None  # the valid member survives


@settings(**_SETTINGS)
@given(st.text(max_size=1000))
def test_robots_parser_never_raises(text):
    from tika_spark.sources.robots import parse_robots, pattern_regex
    import re
    for pattern, allowed in parse_robots(text, agent="fuzzbot"):
        assert isinstance(allowed, bool)
        re.compile(pattern_regex(pattern))  # always a valid regex


@settings(**_SETTINGS)
@given(st.binary(max_size=2048))
def test_sitemap_parser_never_raises(data):
    from tika_spark.sources.sitemap import parse_sitemap
    for prefix in (b"", b"<urlset>", b"<sitemapindex><sitemap>"):
        out = parse_sitemap(prefix + data)
        assert isinstance(out, list)


@settings(**_SETTINGS)
@given(st.text(alphabet="abc.:/?#@%[]www.123-", max_size=120))
def test_surt_key_never_raises(url):
    from tika_spark.sources.cdx import surt_key
    assert isinstance(surt_key(url), str)
