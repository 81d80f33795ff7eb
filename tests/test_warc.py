"""WAT metadata egress (sources/warc.py to_wat/wat_entries) —
the Common-Crawl metadata sibling of the WET sink (main WARC
reader/WET tests live in test_sources.py)."""


class TestWat:
    def test_wat_roundtrip_unit(self, spark):
        from tika_spark.sources.warc import to_wat, wat_entries
        df = spark.createDataFrame(
            [("http://a/", "Title A",
              [{"kind": "a", "uri": "http://b/", "title": None,
                "text": "B"}]),
             ("http://c/", None, [])],
            "url string, title string, links array<struct<"
            "kind:string,uri:string,title:string,text:string>>")
        blobs = to_wat(df).collect()
        rows = [r for b in blobs
                for r in wat_entries(bytes(b["blob"]))]
        by_url = {r["url"]: r for r in rows}
        assert by_url["http://a/"]["title"] == "Title A"
        assert by_url["http://a/"]["links"] == [
            {"path": "a", "url": "http://b/", "text": "B"}]
        assert by_url["http://c/"]["links"] == []
        assert all(r["status"] == "ok" for r in rows)

    def test_wat_deterministic_bytes(self, spark):
        from tika_spark.sources.warc import to_wat
        df = spark.createDataFrame(
            [("http://a/", "T", [])],
            "url string, title string, links array<struct<"
            "kind:string,uri:string,title:string,text:string>>")
        b1 = to_wat(df).collect()[0]["blob"]
        b2 = to_wat(df).collect()[0]["blob"]
        assert bytes(b1) == bytes(b2)
