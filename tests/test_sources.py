"""WARC ingestion: gzip-member framing, record grammar, HTTP envelope
strip, fault isolation, and the binaryFile → mapInPandas reader."""

import gzip

from tika_spark.fixtures import warcgen
from tika_spark.sources import warc


def _gz(records):
    return warcgen.warc_gz(records)


class TestWarcParse:
    def test_roundtrip_multi_member(self):
        blob = _gz([("http://a.example/1", "2026-01-17T08:30:00Z",
                     b"<html>one</html>"),
                    ("http://a.example/2", "2026-01-17T08:30:01Z",
                     b"<html>two</html>")])
        pages = list(warc.warc_pages(blob))
        assert [p["url"] for p in pages] == ["http://a.example/1",
                                             "http://a.example/2"]
        assert pages[0]["html"] == b"<html>one</html>"
        assert pages[1]["warc_date"] == "2026-01-17T08:30:01Z"
        assert all(p["status"] == "ok" for p in pages)

    def test_non_response_records_skipped(self):
        blob = (warcgen.gzip_member(warcgen.warc_record(
                    "urn:x", "2026-01-01T00:00:00Z", b"crawlinfo",
                    rec_type="warcinfo"))
                + warcgen.gzip_member(warcgen.warc_record(
                    "http://b/", "2026-01-01T00:00:00Z", b"GET / HTTP",
                    rec_type="request"))
                + warcgen.gzip_member(warcgen.warc_record(
                    "http://b/", "2026-01-01T00:00:00Z", b"<p>hi</p>")))
        pages = list(warc.warc_pages(blob))
        assert len(pages) == 1
        assert pages[0]["html"] == b"<p>hi</p>"

    def test_malformed_member_isolated(self):
        good = warcgen.gzip_member(warcgen.warc_record(
            "http://ok/", "2026-01-01T00:00:00Z", b"<p>ok</p>"))
        junk = gzip.compress(b"NOT A WARC RECORD")
        pages = list(warc.warc_pages(junk + good))
        assert pages[0]["status"] == "warc_malformed_member"
        assert pages[1]["url"] == "http://ok/"
        assert pages[1]["status"] == "ok"

    def test_truncated_trailing_member_surfaces_status(self):
        good = warcgen.gzip_member(warcgen.warc_record(
            "http://ok/", "2026-01-01T00:00:00Z", b"<p>ok</p>"))
        blob = good + good[: len(good) // 2]
        pages = list(warc.warc_pages(blob))
        # the good record survives; the truncated tail is observable
        # as one malformed-member row (fault isolation, not silence)
        assert [p["status"] for p in pages] == \
            ["ok", "warc_malformed_member"]

    def test_binary_body_passthrough(self):
        payload = bytes(range(256))
        blob = _gz([("http://img/", "2026-01-01T00:00:00Z", payload)])
        (page,) = warc.warc_pages(blob)
        assert page["html"] == payload

    def test_declared_type_lifted_from_http(self):
        blob = warcgen.gzip_member(warcgen.warc_record(
            "http://x/", "2026-01-01T00:00:00Z", b"%PDF-1.4 data",
            http_content_type="application/pdf"))
        (page,) = warc.warc_pages(blob)
        # the server's Content-Type rides along as the detection hint
        assert page["declared_type"] == "application/pdf"
        assert page["html"] == b"%PDF-1.4 data"

    def test_http_envelope_required_for_strip(self):
        # a content block that isn't HTTP comes back whole
        assert warc.http_body(b"plain bytes") == b"plain bytes"
        assert warc.http_body(
            b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nBODY") == b"BODY"


class TestReadWarc:
    def test_read_warc_files(self, spark, tmp_path):
        for i in range(3):
            records = [(f"http://f{i}.example/p{j}",
                        f"2026-01-17T08:30:0{j}Z",
                        f"<html>doc {i}-{j}</html>".encode())
                       for j in range(4)]
            (tmp_path / f"part-{i}.warc.gz").write_bytes(_gz(records))
        df = warc.read_warc(spark, str(tmp_path / "*.warc.gz"))
        rows = df.collect()
        assert len(rows) == 12
        assert all(r["status"] == "ok" for r in rows)
        by_url = {r["url"]: r for r in rows}
        r = by_url["http://f1.example/p2"]
        assert bytes(r["html"]) == b"<html>doc 1-2</html>"
        assert r["warc_ts"].isoformat() == "2026-01-17T08:30:02"

    def test_stream_warc_available_now(self, spark, tmp_path):
        drop = tmp_path / "drop"
        drop.mkdir()
        for i in range(2):
            (drop / f"crawl-{i}.warc.gz").write_bytes(_gz(
                [(f"http://s{i}.example/", "2026-01-17T09:00:00Z",
                  f"<p>stream {i}</p>".encode())]))
        out = tmp_path / "out"
        ck = tmp_path / "ck"
        q = (warc.stream_warc(spark, str(drop), max_files_per_trigger=1)
             .writeStream.format("parquet")
             .option("path", str(out))
             .option("checkpointLocation", str(ck))
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.read.parquet(str(out)).collect()
        assert sorted(r["url"] for r in rows) == [
            "http://s0.example/", "http://s1.example/"]
        assert all(bytes(r["html"]).startswith(b"<p>stream")
                   for r in rows)


class TestWet:
    def test_wet_roundtrip_distributed(self, spark):
        df = spark.createDataFrame(
            [(f"doc://{i}", f"text {i} é") for i in range(40)],
            "url string, text string").repartition(4)
        blobs = warc.to_wet(df).collect()
        assert 1 <= len(blobs) <= 4
        rows = [r for b in blobs for r in warc.wet_texts(bytes(b["blob"]))]
        assert sorted(r["url"] for r in rows) == sorted(
            f"doc://{i}" for i in range(40))
        by_url = {r["url"]: r["text"] for r in rows}
        assert by_url["doc://7"] == "text 7 é"

    def test_wet_records_are_conversion_type(self):
        blob = b"".join(warc.gzip_member(warc.build_record(
            "doc://0", "1970-01-01T00:00:00Z", b"hello",
            rec_type="conversion")) for _ in range(1))
        (member,) = warc.iter_gzip_members(blob)
        rec = warc.parse_record(member)
        assert rec["type"] == "conversion"
        assert rec["content_type"] == "text/plain"
        # response parser skips conversion records
        assert list(warc.warc_pages(blob)) == []


class TestWarcHardening:
    """Round-2 review fixes: corrupt-member resync, bomb caps,
    header-injection and framing edge cases."""

    def test_corrupt_member_resyncs(self):
        from tika_spark.sources import warc
        good1 = warc.gzip_member(warc.build_record(
            "http://a/", "2026-01-01T00:00:00Z", b"<html>one</html>"))
        good2 = warc.gzip_member(warc.build_record(
            "http://b/", "2026-01-01T00:00:00Z", b"<html>two</html>"))
        blob = good1 + b"\x00garbage bytes here\x00" + good2
        pages = list(warc.warc_pages(blob))
        urls = [p["url"] for p in pages if p["status"] == "ok"]
        assert urls == ["http://a/", "http://b/"]  # b survives the gap
        assert sum(p["status"] == "warc_malformed_member"
                   for p in pages) == 1

    def test_missing_content_length_strips_separator(self):
        from tika_spark.sources import warc
        rec = warc.build_record("http://a/", "2026-01-01T00:00:00Z",
                                b"BODYBYTES", rec_type="conversion")
        # garble the content-length header value
        rec = rec.replace(b"Content-Length: 9", b"Content-Length: x", 1)
        parsed = warc.parse_record(rec)
        assert parsed["body"] == b"BODYBYTES"  # no trailing CRLFCRLF

    def test_header_injection_sanitized(self):
        from tika_spark.sources import warc
        rec = warc.build_record(
            "http://evil/\r\nWARC-Type: response",
            "2026-01-01T00:00:00Z", b"T", rec_type="conversion")
        parsed = warc.parse_record(rec)
        assert parsed["type"] == "conversion"  # injection neutralized
        assert "\r" not in parsed["url"]

    def test_stream_scanner_matches_blob_scanner(self):
        # the read(n)-based scanner and the whole-blob wrapper must
        # agree member-for-member, including corrupt gaps
        import io
        good = warc.gzip_member(warc.build_record(
            "http://a/", "2026-01-01T00:00:00Z", b"<p>one</p>"))
        blob = (good + b"\x00junk\x00"
                + warc.gzip_member(warc.build_record(
                    "http://b/", "2026-01-01T00:00:00Z", b"<p>2</p>"))
                + good[: len(good) // 2])
        a = list(warc.iter_gzip_members(blob))
        b = list(warc.iter_gzip_members_from(io.BytesIO(blob).read))
        assert a == b
        assert sum(m is None for m in a) == 2

    def test_streaming_memory_envelope(self, monkeypatch):
        # O(largest member), never O(file): iterate a ~40 MB-inflated
        # multi-member stream and require the scanner's peak python
        # allocations to stay far below the inflated total
        import io
        import tracemalloc
        body = (b"<html><body>" + b"lorem ipsum dolor " * 11000
                + b"</body></html>")            # ~200 KB per member
        member = warc.gzip_member(warc.build_record(
            "http://m/", "2026-01-01T00:00:00Z", body))
        blob = member * 200                      # ~40 MB inflated
        inflated_total = 200 * (len(body) + 512)
        reader = io.BytesIO(blob)
        tracemalloc.start()
        tracemalloc.reset_peak()
        n_pages = 0
        for page in warc.warc_pages_from(reader.read):
            assert page["status"] == "ok"
            n_pages += 1
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        assert n_pages == 200
        assert peak < inflated_total / 4, \
            f"peak {peak} vs inflated {inflated_total}"

    def test_bomb_cap_holds_on_exact_boundary(self, monkeypatch):
        # regression (round-3 advice): a member whose inflated size
        # lands EXACTLY on the cap at a chunk boundary used to call
        # decompress(chunk, max_length=0), which zlib treats as
        # UNLIMITED — the guard silently turned off at its own edge
        payload = b"\x00" * (1 << 20)
        member = gzip.compress(payload)
        chunk_sz = 64
        monkeypatch.setattr(warc, "_INFLATE_CHUNK", chunk_sz)
        # find an output total that falls exactly on a chunk boundary
        import zlib
        dec = zlib.decompressobj(wbits=31)
        totals, t = [], 0
        for p in range(0, len(member), chunk_sz):
            t += len(dec.decompress(member[p:p + chunk_sz]))
            totals.append(t)
        cap = next(x for x in totals if 0 < x < len(payload))
        monkeypatch.setattr(warc, "_MAX_MEMBER", cap)
        got = list(warc.iter_gzip_members(member))
        assert None in got                      # surfaced as corrupt
        assert all(m is None or len(m) <= cap for m in got)

    def test_record_ids_unique_per_capture(self):
        from tika_spark.sources import warc

        def rid(url, date):
            rec = warc.build_record(url, date, b"x",
                                    rec_type="conversion")
            head = rec.split(b"\r\n\r\n")[0]
            for line in head.split(b"\r\n"):
                if line.startswith(b"WARC-Record-ID:"):
                    return line
            raise AssertionError("no id")
        a = rid("http://s/", "2026-01-01T00:00:00Z")
        b = rid("http://s/", "2026-02-01T00:00:00Z")
        assert a != b                       # same url, two captures
        assert a == rid("http://s/", "2026-01-01T00:00:00Z")  # stable


class TestZstCdx:
    """Frame-addressed CDX over dictionary-compressed .warc.zst."""

    def _shard(self):
        from tika_spark.fixtures import warcgen
        recs = [(f"http://ex.com/{i}", "2026-01-01T00:00:00Z",
                 f"payload {i} body".encode()) for i in range(5)]
        return warcgen.warc_zst_dict(recs)

    def test_index_rows_and_spans(self):
        from tika_spark.sources.cdx import zst_cdx_records
        blob = self._shard()
        rows = zst_cdx_records(blob)
        assert len(rows) == 5
        assert rows[0]["dict_len"] > 0            # dictionary span
        for r in rows:
            assert 0 < r["frame_len"] <= len(blob)
            assert r["frame_off"] + r["frame_len"] <= len(blob)
            assert r["urlkey"].startswith("com,ex)/")

    def test_fetch_matches_payload(self, spark, tmp_path):
        from tika_spark.sources.cdx import (cdx_fetch_zst,
                                            cdx_index_zst)
        blob = self._shard()
        p = str(tmp_path / "s.warc.zst")
        with open(p, "wb") as f:
            f.write(blob)
        shards = spark.createDataFrame([(p, blob)],
                                       "shard string, blob binary")
        idx = (cdx_index_zst(shards)
               .withColumnRenamed("shard", "path"))
        got = {r.url: bytes(r.payload)
               for r in cdx_fetch_zst(idx).collect()}
        assert got == {f"http://ex.com/{i}":
                       f"payload {i} body".encode() for i in range(5)}

    def test_bad_offset_is_status_row(self, spark, tmp_path):
        import pyspark.sql.functions as F
        from tika_spark.sources.cdx import (cdx_fetch_zst,
                                            cdx_index_zst)
        blob = self._shard()
        p = str(tmp_path / "s.warc.zst")
        with open(p, "wb") as f:
            f.write(blob)
        shards = spark.createDataFrame([(p, blob)],
                                       "shard string, blob binary")
        idx = (cdx_index_zst(shards)
               .withColumnRenamed("shard", "path")
               .withColumn("frame_off", F.col("frame_off") + 7))
        out = cdx_fetch_zst(idx).collect()
        assert all(r.status == "fetch_error" for r in out)
