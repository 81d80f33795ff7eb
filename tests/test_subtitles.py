"""SRT / WebVTT subtitle parser tests."""

from tika_spark.subtitles import extract_subtitles, parse_cues

SRT = """1
00:00:01,000 --> 00:00:03,500
Hello there.

2
00:00:04,000 --> 00:00:06,000
<i>General Kenobi!</i>
Two lines join.

3
01:02:03,450 --> 01:02:04,000
Last cue.
"""

VTT = """WEBVTT - demo file

NOTE
this block is skipped entirely
even across lines

STYLE
::cue { color: lime }

intro
00:01.000 --> 00:03.500 position:10%,line-left
<v Roger Bingham>We are in New York City

00:00:04.000 --> 00:00:06.000
<b>Bold</b> and <c.yellow>classy</c> text
"""


class TestSrt:
    def test_cues_and_timing(self):
        cues = parse_cues(SRT, vtt=False)
        assert len(cues) == 3
        assert cues[0] == {"start_ms": 1000, "end_ms": 3500,
                           "text": "Hello there."}
        assert cues[1]["text"] == "General Kenobi! Two lines join."
        assert cues[2]["start_ms"] == 3723450

    def test_extractor_contract(self):
        r = extract_subtitles(SRT.encode())
        assert r["status"] == "ok"
        assert r["metadata"]["Content-Type"] == [
            "application/x-subrip"]
        assert r["metadata"]["cue-count"] == ["3"]
        assert r["metadata"]["xmpDM:duration"] == ["3724.00"]
        assert "Hello there.\n" in r["text"]
        assert "-->" not in r["text"] and "00:00" not in r["text"]
        # one paragraph span per cue, offsets consistent
        assert len(r["spans"]) == 3
        s0 = r["spans"][0]
        assert r["text"][s0[0]:s0[1]] == "Hello there."


class TestVtt:
    def test_blocks_settings_and_voice(self):
        cues = parse_cues(VTT, vtt=True)
        assert len(cues) == 2
        assert cues[0]["start_ms"] == 1000
        assert cues[0]["end_ms"] == 3500
        assert cues[0]["text"] == \
            "Roger Bingham: We are in New York City"
        assert cues[1]["text"] == "Bold and classy text"

    def test_extractor_detects_vtt(self):
        r = extract_subtitles(VTT.encode())
        assert r["metadata"]["Content-Type"] == ["text/vtt"]
        assert r["metadata"]["cue-count"] == ["2"]

    def test_bom_signature(self):
        r = extract_subtitles(("﻿" + VTT).encode("utf-8"))
        assert r["metadata"]["Content-Type"] == ["text/vtt"]
        assert r["metadata"]["cue-count"] == ["2"]


class TestPipeline:
    def test_magic_detects_vtt(self):
        from tika_spark.mime.magic import match_magic
        assert match_magic(VTT.encode()[:32]) == "text/vtt"
        assert match_magic(("﻿" + VTT).encode()[:32]) \
            == "text/vtt"

    def test_extract_routes_srt_by_name(self, spark):
        from tika_spark import extract
        pages = spark.createDataFrame(
            [("http://a.example/film.srt", SRT.encode()),
             ("http://a.example/talk.vtt", VTT.encode())],
            "url string, html binary").repartition(2)
        rows = {r.url: r for r in extract(pages, mode="text")
                .collect()}
        srt_row = rows["http://a.example/film.srt"]
        assert srt_row["status"] == "ok"
        assert srt_row["mime"] == "application/x-subrip"
        assert "Hello there." in srt_row["text"]
        assert "-->" not in srt_row["text"]
        vtt_row = rows["http://a.example/talk.vtt"]
        assert vtt_row["mime"] == "text/vtt"
        assert "New York City" in vtt_row["text"]


ASS = """[Script Info]
; generated for tests
Title: Test
ScriptType: v4.00+

[V4+ Styles]
Format: Name, Fontname
Style: Default,Arial

[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:01.00,0:00:03.50,Default,Ann,0,0,0,,{\\i1}Hello{\\i0} there\\Nold friend
Comment: 0,0:00:04.00,0:00:05.00,Default,,0,0,0,,not a cue
Dialogue: 0,0:00:06.20,0:00:07.90,Default,,0,0,0,,Commas, kept, in text
Dialogue: 0,0:00:08.00,0:00:09.00,Default,,0,0,0,,{\\p1}m 0 0 l 100 0{\\p0}
"""


class TestAss:
    def test_parse_ass_cues(self):
        from tika_spark.subtitles import parse_ass_cues
        cues = parse_ass_cues(ASS)
        assert len(cues) == 2          # comment + drawing-only skipped
        assert cues[0] == {"start_ms": 1000, "end_ms": 3500,
                           "text": "Ann: Hello there old friend"}
        assert cues[1]["text"] == "Commas, kept, in text"
        assert cues[1]["start_ms"] == 6200 and cues[1]["end_ms"] == 7900

    def test_extract_routes_ass(self):
        r = extract_subtitles(ASS.encode())
        assert r["metadata"]["Content-Type"] == ["text/x-ssa"]
        assert "Ann: Hello there old friend\n" in r["text"]
        assert r["metadata"]["cue-count"] == ["2"]

    def test_mkv_ass_track(self):
        from tika_spark.analysis.ebml import (mkv_subtitles,
                                              mkv_wrap_subtitles)
        payload = ("1,0,Default,Bob,0,0,0,,"
                   "{\\b1}Bold{\\b0} words\\Nnext line")
        cues = [{"start_ms": 2000, "end_ms": 3000, "text": payload}]
        out = mkv_subtitles(mkv_wrap_subtitles(cues,
                                               codec=b"S_TEXT/ASS"))
        assert out == [{"start_ms": 2000, "end_ms": 3000,
                        "text": "Bob: Bold words next line"}]
