"""DataFrame-level pipeline invariants (SURVEY.md §5.2 Tier 3).

- golden byte-equality per url over the full variant matrix;
- row counts preserved; status accounting sums;
- determinism under different parallelism (local[4] repartition 2 vs 8);
- error/no_parser rows never abort the job;
- kill/resume produces a byte-identical snapshot.
"""

import os

import pyspark.sql.functions as F
import pytest

from tika_spark.config import ExtractConfig
from tika_spark.fixtures.pages import generate_pages_df, generate_pages_pandas
from tika_spark.pipeline.job import extract, lineage_manifest
from tika_spark.pipeline.checkpoint import done_buckets
from tika_spark.pipeline.runner import run

N_ROWS = 240


@pytest.fixture(scope="module")
def pages(spark):
    df = generate_pages_df(spark, N_ROWS, partitions=4)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def extracted(spark, pages):
    out = extract(pages, mode="text")
    out.cache().count()
    return out


class TestExtractJob:
    def test_row_count_preserved(self, pages, extracted):
        assert extracted.count() == pages.count() == N_ROWS

    def test_no_html_column_in_output(self, extracted):
        assert "html" not in extracted.columns

    def test_golden_byte_equality(self, pages, extracted):
        j = extracted.join(
            pages.select("url", F.col("text").alias("golden")), "url")
        n_bad = j.filter(F.col("text") != F.col("golden")).count()
        assert n_bad == 0

    def test_status_accounting(self, extracted):
        by = dict(extracted.groupBy("status").count().collect())
        assert sum(by.values()) == N_ROWS
        assert by.get("error", 0) == 0
        assert by.get("no_parser", 0) > 0  # binary_junk rows

    def test_mime_distribution(self, extracted):
        mimes = {r["mime"] for r in extracted.select("mime").distinct().collect()}
        assert {"text/html", "application/pdf", "application/rss+xml",
                "text/plain", "application/xml",
                "application/octet-stream"} <= mimes

    def test_metadata_and_links_typed(self, extracted):
        row = (extracted.filter(F.col("mime") == "text/html")
               .filter(F.size("links") > 0).first())
        assert row is not None
        assert row["links"][0]["uri"].startswith(("http", "/", "mailto"))
        assert isinstance(row["metadata"], dict)

    def test_determinism_under_parallelism(self, spark, pages):
        a = extract(pages, mode="text", repartition=2)
        b = extract(pages, mode="text", repartition=8)
        cols = ["url", "mime", "charset", "lang", "title", "text", "status"]
        diff = (a.select(cols).exceptAll(b.select(cols))).count()
        assert diff == 0

    def test_exchange_budget_of_the_job(self, spark, pages, tmp_path):
        # the 100 TB contract: on a pre-bucketed parquet table the job
        # is scan -> mapInPandas -> sink with NO shuffle of the binary
        # column (repartition=0); the explicit skew path shuffles
        # exactly once (BENCH/BASELINE.md scan-granularity finding)
        pages.write.parquet(str(tmp_path / "pages"))
        stored = spark.read.parquet(str(tmp_path / "pages"))
        plan = extract(stored, mode="text", repartition=0)._jdf \
            .queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "MapInPandas" in plan
        plan4 = extract(stored, mode="text", repartition=4)._jdf \
            .queryExecution().executedPlan().toString()
        assert plan4.count("Exchange") == 1

    def test_poison_rows_survive(self, spark):
        import datetime
        rows = [("u://1", datetime.datetime(2026, 1, 1), None),
                ("u://2", datetime.datetime(2026, 1, 1), b""),
                ("u://3", datetime.datetime(2026, 1, 1), b"\x00" * 10_000)]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
        out = extract(df).collect()
        assert len(out) == 3  # no task failure

    def test_text_main_mode(self, spark, pages):
        out = extract(pages.filter(F.col("source") == "html_boiler"),
                      mode="text-main")
        goldens = {r["url"]: r for r in
                   (gen for gen in _main_goldens())}
        for row in out.collect():
            g = goldens.get(row["url"])
            if g is not None:
                assert row["text"] == g["text_main"], row["url"]

    def test_xhtml_mode(self, spark):
        rows = [("http://e.com/x.html",
                 b"<html><head><title>T</title></head><body>"
                 b"<p>A &amp; B <a href='/r'>l</a></p>"
                 b"<script>drop()</script></body></html>"),
                ("http://e.com/x.txt", "plain <text>".encode())]
        df = spark.createDataFrame(rows, "url string, html binary")
        out = {r["url"]: r for r in
               extract(df, mode="xhtml").collect()}
        xh = out["http://e.com/x.html"]["text"]
        assert xh.startswith('<html xmlns="http://www.w3.org/1999/xhtml">')
        assert "<title>T</title>" in xh
        assert '<p>A &amp; B <a href="http://e.com/r">l</a></p>' in xh
        assert "drop()" not in xh           # script subtree discarded
        tx = out["http://e.com/x.txt"]["text"]
        assert "<p>plain &lt;text&gt;\n</p>" in tx  # generic wrap

    def test_detect_mode_no_parse(self, spark, pages):
        out = extract(pages, mode="detect")
        rows = out.collect()
        assert all(r["status"] == "detected" for r in rows)
        assert all(r["text"] == "" and r["lang"] is None for r in rows)
        # the census matches the parsed run's mime distribution
        full = extract(pages, mode="text")
        assert sorted(out.groupBy("mime").count().collect()) == \
            sorted(full.groupBy("mime").count().collect())

    def test_lineage_manifest_sums(self, extracted):
        lin = lineage_manifest(extracted)
        total = lin.agg(F.sum("n_rows")).collect()[0][0]
        assert total == N_ROWS


def _main_goldens():
    from tika_spark.fixtures.pages import gen_row
    for i in range(N_ROWS):
        r = gen_row(i)
        if r["text_main"] is not None:
            yield r


class TestRunnerResume:
    def test_resume_after_kill(self, spark, tmp_path):
        inp = str(tmp_path / "pages.parquet")
        generate_pages_df(spark, 120, partitions=4).write.parquet(inp)

        out_a = str(tmp_path / "run_full")
        m1 = run(spark, inp, out_a, n_buckets=4, group_size=2, verbose=False)
        assert m1["rows_processed"] == 120
        assert done_buckets(spark, out_a) == {0, 1, 2, 3}

        # simulate a kill after the first group, then resume
        out_b = str(tmp_path / "run_killed")
        run(spark, inp, out_b, n_buckets=4, group_size=2, verbose=False,
            max_groups=1)
        m2 = run(spark, inp, out_b, n_buckets=4, group_size=2, verbose=False)
        assert m2["buckets_resumed_from"] == 2  # skipped the done ones

        cols = ["url", "mime", "text", "status"]
        a = spark.read.parquet(os.path.join(out_a, "data")).select(cols)
        b = spark.read.parquet(os.path.join(out_b, "data")).select(cols)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q", "-x"]))


class TestRecursiveRunner:
    def test_children_survive_group_overwrites(self, spark, tmp_path):
        # child rows (url = parent!/name) must bucket with their parent,
        # or a later group's dynamic partition overwrite clobbers them
        from tika_spark.fixtures.pages import generate_pages_df
        from tika_spark.pipeline.runner import run
        inp = str(tmp_path / "pages.parquet")
        generate_pages_df(spark, 60, partitions=4) \
            .select("url", "warc_ts", "html").write.parquet(inp)
        out = str(tmp_path / "out")
        m = run(spark, inp, out, n_buckets=4, group_size=1,
                verbose=False, recursive=True)
        got = spark.read.parquet(out + "/data")
        assert got.count() == m["rows_processed"]
        kids = got.filter("depth > 0")
        assert kids.count() > 0
        # every child's parent row exists in the same snapshot
        import pyspark.sql.functions as F
        parents = (kids.select(F.substring_index("url", "!/", 1)
                               .alias("url")).distinct())
        missing = parents.join(got.select("url"), "url", "left_anti")
        assert missing.count() == 0


@pytest.mark.usefixtures("spark")
class TestCliModes:
    """H4: the -l (language) and -y (XMP) output modes."""

    def _pages(self, spark):
        from tika_spark.language.corpus import SEED_TEXT
        html = ("<html><head><title>T1</title>"
                '<meta name="author" content="A1"/></head><body><p>'
                + SEED_TEXT["de"] + "</p></body></html>").encode()
        return spark.createDataFrame([("http://x/a.html", html)],
                                     "url string, html binary")

    def test_language_mode(self, spark):
        from tika_spark.pipeline.job import extract
        row = extract(self._pages(spark), mode="language").collect()[0]
        assert row["text"] == "de"
        assert row["lang"] == "de"
        assert row["spans"] == []

    def test_xmp_mode(self, spark):
        from tika_spark.pipeline.job import extract
        row = extract(self._pages(spark), mode="xmp").collect()[0]
        assert row["text"].startswith("<?xpacket")
        assert "<tika:title>T1</tika:title>" in row["text"]
        assert "<tika:author>A1</tika:author>" in row["text"]
        assert row["text"].endswith('<?xpacket end="w"?>')

    def test_json_mode(self, spark):
        import json

        from tika_spark.pipeline.job import extract
        row = extract(self._pages(spark), mode="json").collect()[0]
        md = json.loads(row["text"])
        assert md["title"] == "T1"
        assert md["author"] == "A1"
        assert row["spans"] == []

    def test_xmp_multivalue_and_escaping(self):
        from tika_spark.pipeline.stages import xmp_serialize
        got = xmp_serialize({"k": ["a<b", "c&d"], "1bad key!": ["v"]})
        assert "<rdf:li>a&lt;b</rdf:li><rdf:li>c&amp;d</rdf:li>" in got
        assert "<tika:_1bad_key_>v</tika:_1bad_key_>" in got


def test_fictionbook_routes_to_xml():
    from tika_spark.mime.detector import detect
    from tika_spark.pipeline.stages import route_for_mime
    fb = (b'<?xml version="1.0"?><FictionBook xmlns="http://www.'
          b'gribuser.ru/xml/fictionbook/2.0"><body><p>story text</p>'
          b"</body></FictionBook>")
    mime = detect(fb)
    assert mime == "application/x-fictionbook+xml"
    assert route_for_mime(mime) == "xml"


class TestRunnerInputFormats:
    def test_files_input_directory(self, spark, tmp_path):
        """tika-app's batch-a-directory analog: --input-format files
        extracts every file under a directory, url = file path."""
        import os

        from tika_spark.pipeline.runner import run
        d = tmp_path / "docs" / "sub"
        os.makedirs(d)
        (tmp_path / "docs" / "a.html").write_bytes(
            b"<html><head><title>T</title></head>"
            b"<body><p>hello html</p></body></html>")
        (d / "b.txt").write_bytes(b"plain body text")
        out = str(tmp_path / "out")
        m = run(spark, str(tmp_path / "docs"), out, n_buckets=2,
                group_size=2, verbose=False, input_format="files")
        assert m["rows_processed"] == 2
        got = {os.path.basename(r["url"]): r for r in
               spark.read.parquet(out + "/data").collect()}
        assert got["a.html"]["mime"] == "text/html"
        assert "hello html" in got["a.html"]["text"]
        assert got["b.txt"]["text"].startswith("plain body text")


class TestBuildCorpus:
    def test_end_to_end_gates_dedup_splits(self, spark):
        from tika_spark.pipeline.corpus import build_corpus
        body = ("A sentence with enough words to clear the gate, "
                "repeated for weight. " * 3)
        rows = [
            ("http://a.ex/1", f"<html><title>T1</title><p>{body}</p>"),
            ("http://a.ex/2", f"<html><title>T1</title><p>{body}</p>"),
            ("http://a.ex/3", "<html><title>T3</title><p>tiny</p>"),
            ("http://a.ex/4", "<html><title>T4</title><p>"
             + ("different content with plenty of words here, "
                "clearing every configured gate easily. " * 3)
             + "</p>"),
        ]
        pages = spark.createDataFrame(
            [(u, h.encode()) for u, h in rows],
            "url string, html binary")
        out = {r.url: r for r in build_corpus(pages, min_words=10)
               .collect()}
        # dup of url 1 removed (keep-first by url asc)
        assert set(out) == {"http://a.ex/1", "http://a.ex/4"}
        r1 = out["http://a.ex/1"]
        assert r1.split in ("train", "val", "test")
        assert r1.n_tokens >= 10
        assert len(r1.fingerprint) == 32

    def test_deterministic_under_repartition(self, spark):
        from tika_spark.pipeline.corpus import build_corpus
        body = "word " * 40
        pages = spark.createDataFrame(
            [(f"http://h.ex/{i}",
              f"<html><title>t</title><p>{body}{i}</p>".encode())
             for i in range(20)], "url string, html binary")
        a = sorted(map(tuple, build_corpus(pages).collect()))
        b = sorted(map(tuple,
                       build_corpus(pages.repartition(7)).collect()))
        assert a == b


class TestInputByteCap:
    """Truncate-and-flag input cap (config.MAX_INPUT_BYTES): no page,
    however large, reaches a parser in full — the giant-page skew
    residual from BENCH/SKEW.md is bounded by policy."""

    def _run(self, spark, rows, cap):
        df = spark.createDataFrame(
            rows, "url string, html binary")
        cfg = ExtractConfig(mode="text", max_input_bytes=cap)
        out = extract(df, mode="text", config=cfg)
        return {r["url"]: r for r in out.collect()}

    def test_html_prefix_parse_and_flag(self, spark):
        body = ("<html><head><title>T</title></head><body>"
                + "<p>word </p>" * 400 + "</body></html>")
        rows = [("u:big", bytearray(body.encode())),
                ("u:small", bytearray(b"<html><body><p>ok</p>"
                                      b"</body></html>"))]
        got = self._run(spark, rows, cap=1000)
        big, small = got["u:big"], got["u:small"]
        assert big["status"] == "input_capped"
        assert big["mime"] == "text/html"
        assert 0 < big["n_chars"] < 500      # prefix text only
        assert big["n_bytes"] == len(body)   # accounting keeps true size
        assert "word" in big["text"]
        assert small["status"] == "ok"

    def test_binary_metadata_only_row(self, spark):
        import zlib
        blob = b"PK\x03\x04" + zlib.compress(b"x" * 4096) * 40
        got = self._run(spark, [("u:zip", bytearray(blob))], cap=100)
        r = got["u:zip"]
        assert r["status"] == "input_capped"
        assert r["text"] == ""
        assert r["metadata"]["Content-Type"] == [r["mime"]]
        assert r["n_bytes"] == len(blob)

    def test_cap_zero_disables(self, spark):
        body = b"<html><body><p>" + b"w " * 2000 + b"</p></body></html>"
        got = self._run(spark, [("u:h", bytearray(body))], cap=0)
        assert got["u:h"]["status"] == "ok"
