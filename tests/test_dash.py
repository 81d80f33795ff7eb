"""MPEG-DASH manifest parsing (sources/dash.py)."""

from tika_spark.sources.dash import (dash_representations,
                                     iso_duration_ms, parse_mpd)

MPD = """<?xml version="1.0"?>
<MPD xmlns="urn:mpeg:dash:schema:mpd:2011" type="static"
     mediaPresentationDuration="PT1H2M3.5S">
  <Period>
    <AdaptationSet contentType="video" codecs="avc1.4d401e">
      <Representation id="v1" bandwidth="1200000" width="640"
                      height="360"/>
      <Representation id="v2" bandwidth="4800000" width="1920"
                      height="1080" codecs="avc1.640028"/>
    </AdaptationSet>
    <AdaptationSet mimeType="audio/mp4">
      <Representation id="a1" bandwidth="128000"/>
    </AdaptationSet>
  </Period>
  <Period>
    <AdaptationSet contentType="video">
      <Representation id="v3" bandwidth="900000"/>
    </AdaptationSet>
  </Period>
</MPD>"""


def test_iso_duration():
    assert iso_duration_ms("PT1H2M3.5S") == 3723500
    assert iso_duration_ms("PT30S") == 30000
    assert iso_duration_ms("PT2M") == 120000
    assert iso_duration_ms("garbage") == 0


def test_parse_mpd():
    p = parse_mpd(MPD)
    assert p["duration_ms"] == 3723500 and p["type"] == "static"
    reps = p["representations"]
    assert [r["rep_id"] for r in reps] == ["v1", "v2", "a1", "v3"]
    assert reps[0]["codecs"] == "avc1.4d401e"     # inherited
    assert reps[1]["codecs"] == "avc1.640028"     # own wins
    assert reps[2]["content_type"] == "audio"     # from mimeType
    assert reps[3]["period"] == 1
    assert reps[1]["width"] == 1920


def test_parse_mpd_garbage():
    assert parse_mpd("<notmpd/>")["representations"] == []
    assert parse_mpd("not xml <")["representations"] == []


def test_dataframe_operator(spark):
    df = spark.createDataFrame([("u1", MPD)], "url string, mpd string")
    out = dash_representations(df).collect()
    assert len(out) == 4
    assert {r.rep_id for r in out} == {"v1", "v2", "a1", "v3"}
    assert all(r.duration_ms == 3723500 for r in out)
