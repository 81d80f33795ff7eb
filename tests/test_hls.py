"""HLS playlist parsing (sources/hls.py, RFC 8216)."""

from tika_spark.sources.hls import hls_summary, parse_m3u8

MEDIA = """#EXTM3U
#EXT-X-VERSION:3
#EXT-X-TARGETDURATION:6
#EXT-X-MEDIA-SEQUENCE:120
#EXTINF:5.005,
seg120.ts
#EXTINF:4.8,title here
seg121.ts
#EXT-X-UNKNOWN-TAG:ignored
#EXTINF:6,
seg122.ts
#EXT-X-ENDLIST
"""

MASTER = """#EXTM3U
#EXT-X-STREAM-INF:BANDWIDTH=1280000,RESOLUTION=640x360,CODECS="avc1.4d401e,mp4a.40.2"
low/index.m3u8
#EXT-X-STREAM-INF:BANDWIDTH=5000000,RESOLUTION=1920x1080
high/index.m3u8
"""


class TestParse:
    def test_media_playlist(self):
        p = parse_m3u8(MEDIA)
        assert not p["is_master"] and p["ended"]
        assert p["version"] == 3 and p["target_duration"] == 6
        assert p["media_sequence"] == 120
        assert [s["uri"] for s in p["segments"]] == [
            "seg120.ts", "seg121.ts", "seg122.ts"]
        assert [s["duration_ms"] for s in p["segments"]] == [
            5005, 4800, 6000]

    def test_master_playlist(self):
        p = parse_m3u8(MASTER)
        assert p["is_master"] and not p["segments"]
        assert p["variants"][0]["bandwidth"] == 1280000
        assert p["variants"][0]["codecs"] == "avc1.4d401e,mp4a.40.2"
        assert p["variants"][1]["resolution"] == "1920x1080"
        assert p["variants"][1]["uri"] == "high/index.m3u8"

    def test_missing_signature(self):
        p = parse_m3u8("#EXTINF:5,\nseg.ts\n")
        assert p["segments"] == [] and not p["is_master"]


def test_hls_summary_operator(spark):
    df = spark.createDataFrame(
        [("u1", MEDIA), ("u2", MASTER)], "url string, m3u8 string")
    out = {r.url: r for r in hls_summary(df).collect()}
    assert (out["u1"].n_segments, out["u1"].total_duration_ms,
            out["u1"].ended) == (3, 15805, True)
    assert (out["u2"].is_master, out["u2"].n_variants,
            out["u2"].max_bandwidth) == (True, 2, 5000000)
