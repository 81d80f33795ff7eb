"""CDX indexing (tika_spark/sources/cdx.py): offsets, SURT keys,
range-read roundtrip."""

import gzip
import hashlib

import pytest

from tika_spark.sources.cdx import (cdx_records, iter_members_with_offsets,
                                    surt_key)
from tika_spark.sources.warc import build_record, gzip_member, parse_record


class TestSurt:
    def test_basic(self):
        assert surt_key("http://www.Ex.com/a/b?q=1") == "com,ex)/a/b?q=1"

    def test_no_www_no_path(self):
        assert surt_key("https://sub.site.org") == "org,site,sub)/"

    def test_port_dropped_query_kept(self):
        assert surt_key("http://a.ex:8080/p") == "ex,a)/p"


def _shard(urls_texts):
    return b"".join(
        gzip_member(build_record(u, "2026-01-01T00:00:00Z",
                                 t.encode(), rec_type="conversion"))
        for u, t in urls_texts)


class TestOffsets:
    def test_members_reconstruct(self):
        shard = _shard([("http://a.ex/1", "one"),
                        ("http://a.ex/2", "two two")])
        members = list(iter_members_with_offsets(shard))
        assert len(members) == 2
        # offsets tile the shard exactly
        assert members[0][0] == 0
        assert members[1][0] == members[0][1]
        assert members[1][0] + members[1][1] == len(shard)
        # range-read roundtrip: slice + gunzip = the member
        for off, clen, inflated in members:
            assert gzip.decompress(shard[off:off + clen]) == inflated

    def test_corrupt_gap_resync(self):
        good = _shard([("http://a.ex/1", "one")])
        shard = good + b"\x00garbage\x00" + _shard(
            [("http://a.ex/2", "two")])
        rows = cdx_records(shard)
        assert [r["url"] for r in rows] == ["http://a.ex/1",
                                           "http://a.ex/2"]
        # the second record's offset still range-reads correctly
        r2 = rows[1]
        member = gzip.decompress(
            shard[r2["offset"]:r2["offset"] + r2["clength"]])
        assert parse_record(member)["url"] == "http://a.ex/2"


class TestRecords:
    def test_digest_and_fields(self):
        shard = _shard([("http://www.b.ex/p", "payload text")])
        (r,) = cdx_records(shard)
        assert r["urlkey"] == "ex,b)/p"
        assert r["rec_type"] == "conversion"
        assert r["digest"] == hashlib.sha256(b"payload text").hexdigest()

    def test_response_envelope_stripped(self):
        rec = build_record("http://c.ex/r", "2026-01-01T00:00:00Z",
                           b"<html>hi</html>", rec_type="response")
        (r,) = cdx_records(gzip_member(rec))
        assert r["digest"] == hashlib.sha256(b"<html>hi</html>").hexdigest()


class TestDataFrameOp:
    @pytest.fixture(scope="class")
    def spark(self):
        from pyspark.sql import SparkSession
        s = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
        yield s

    def test_index_shards(self, spark):
        from tika_spark.sources.cdx import cdx_index
        shards = spark.createDataFrame(
            [(f"shard{j}", bytearray(_shard(
                [(f"http://a.ex/{j}/{i}", f"t{j}{i}")
                 for i in range(5)])))
             for j in range(3)],
            "shard string, blob binary")
        out = cdx_index(shards)
        assert out.count() == 15
        r = out.filter("shard = 'shard1' AND url = 'http://a.ex/1/0'") \
            .collect()[0]
        assert r.offset == 0 and r.clength > 0
        assert r.urlkey == "ex,a)/1/0"


class TestFetch:
    @pytest.fixture(scope="class")
    def spark(self):
        from pyspark.sql import SparkSession
        s = (SparkSession.builder.master("local[4]")
             .config("spark.sql.shuffle.partitions", "4").getOrCreate())
        yield s

    def test_index_then_range_fetch_roundtrip(self, spark, tmp_path_factory):
        import pyspark.sql.functions as F

        from tika_spark.sources.cdx import cdx_fetch, cdx_index
        base = tmp_path_factory.mktemp("shards")
        paths = []
        for j in range(3):
            p = base / f"shard{j}.warc.wet.gz"
            p.write_bytes(_shard([(f"http://a.ex/{j}/{i}", f"text {j}-{i}")
                                  for i in range(4)]))
            paths.append(str(p))
        shards = spark.createDataFrame(
            [(p, bytearray(open(p, "rb").read())) for p in paths],
            "shard string, blob binary")
        idx = cdx_index(shards).withColumnRenamed("shard", "path")
        # fetch a subset: every record of shard1 + one of shard2
        wanted = idx.filter(
            "path LIKE '%shard1%' OR url = 'http://a.ex/2/3'")
        got = cdx_fetch(wanted).collect()
        assert len(got) == 5
        assert all(r.status == "ok" for r in got)
        by_url = {r.url: bytes(r.payload).decode() for r in got}
        assert by_url["http://a.ex/1/2"] == "text 1-2"
        assert by_url["http://a.ex/2/3"] == "text 2-3"

    def test_bad_offset_is_status_row(self, spark, tmp_path_factory):
        from tika_spark.sources.cdx import cdx_fetch
        base = tmp_path_factory.mktemp("bad")
        p = base / "s.gz"
        p.write_bytes(_shard([("http://a.ex/x", "hello")]))
        idx = spark.createDataFrame(
            [(str(p), 3, 10), (str(base / "missing.gz"), 0, 5)],
            "path string, offset long, clength long")
        got = cdx_fetch(idx).collect()
        assert [r.status for r in got] == ["fetch_error", "fetch_error"]


class TestRevisitCensus:
    def test_capture_order_and_copies(self, spark):
        from tika_spark.sources.cdx import revisit_census
        rows = [("u1", "2026-01-01", "d1"),
                ("u2", "2026-01-03", "d1"),
                ("u3", "2026-01-02", "d1"),
                ("u4", "2026-01-01", "d2")]
        df = spark.createDataFrame(
            rows, "url string, warc_date string, digest string")
        out = {r.url: r for r in revisit_census(df).collect()}
        assert out["u1"].capture_idx == 1 and not out["u1"].is_revisit
        assert out["u3"].capture_idx == 2 and out["u3"].is_revisit
        assert out["u2"].capture_idx == 3
        assert all(out[u].n_copies == 3 for u in ("u1", "u2", "u3"))
        assert out["u4"].n_copies == 1 and not out["u4"].is_revisit

    def test_url_breaks_date_ties(self, spark):
        from tika_spark.sources.cdx import revisit_census
        df = spark.createDataFrame(
            [("b", "t", "d"), ("a", "t", "d")],
            "url string, warc_date string, digest string")
        out = {r.url: r.capture_idx
               for r in revisit_census(df).collect()}
        assert out == {"a": 1, "b": 2}
