"""Hypothesis property tests for the round-4 pure functions:
subtitle flattening, Viterbi segmentation, Opus TOC walk, SURT keys,
zstd frame arithmetic."""

from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(max_size=200))
@settings(max_examples=60, deadline=None)
def test_flatten_ass_never_raises(s):
    from tika_spark.subtitles import flatten_ass_text
    out = flatten_ass_text(s)
    assert isinstance(out, str)
    assert "\\N" not in out and "\\h" not in out


@given(st.text(alphabet="ab{}\\pi01 ", max_size=80))
@settings(max_examples=60, deadline=None)
def test_flatten_ass_strips_all_override_blocks(s):
    from tika_spark.subtitles import flatten_ass_text
    assert "{" not in flatten_ass_text(s).replace("{", "", 0) \
        or "{" not in flatten_ass_text("{" + s + "}")


@given(st.text(alphabet="abcd", min_size=1, max_size=24),
       st.integers(min_value=1, max_value=6))
@settings(max_examples=80, deadline=None)
def test_viterbi_covers_word_with_char_vocab(word, max_len):
    from tika_spark.analysis.unigram import viterbi_segment
    scores = {c: -2.0 for c in "abcd"}
    scores.update({"ab": -1.5, "abc": -1.2, "cd": -3.5})
    seg = viterbi_segment(word, scores, max_len=max_len)
    assert seg is not None
    assert "".join(seg) == word          # exact cover, no overlap
    assert all(p in scores for p in seg)


@given(st.lists(st.integers(min_value=0, max_value=255), min_size=1,
                max_size=12))
@settings(max_examples=60, deadline=None)
def test_opus_toc_walk_total_matches_manual(tocs):
    from tika_spark.analysis.oggdemux import (_opus_frame_us,
                                              ogg_wrap,
                                              opus_packet_stats)
    head = (b"OpusHead" + bytes([1, 1]) + (0).to_bytes(2, "little")
            + (48000).to_bytes(4, "little") + b"\x00\x00\x00")
    tags = (b"OpusTags" + (1).to_bytes(4, "little") + b"v"
            + (0).to_bytes(4, "little"))
    pkts = [head, tags] + [bytes([t & 0xFC]) for t in tocs]
    # code forced to 0 (1 frame) so duration is the plain sum
    st_ = opus_packet_stats(ogg_wrap(pkts))
    want = sum(_opus_frame_us((t & 0xFC) >> 3) for t in tocs) // 1000
    assert st_["n_packets"] == len(tocs)
    assert st_["duration_ms"] == want
    assert (st_["n_silk"] + st_["n_hybrid"]
            + st_["n_celt"]) == len(tocs)


@given(st.text(max_size=120))
@settings(max_examples=80, deadline=None)
def test_surt_key_never_raises(url):
    from tika_spark.sources.cdx import surt_key
    assert isinstance(surt_key(url), str)


@given(st.binary(min_size=0, max_size=400),
       st.integers(min_value=0, max_value=64))
@settings(max_examples=80, deadline=None)
def test_zstd_frame_end_bounded(data, pos):
    """Frame-end arithmetic never over-runs and never loops: either
    a ValueError (bad magic), None (needs more bytes), or an offset
    in (pos, len]."""
    from tika_spark.sources.warc import zstd_frame_end
    try:
        end = zstd_frame_end(data, pos)
    except ValueError:
        return
    assert end is None or pos < end <= len(data)


@given(st.lists(st.tuples(st.text(alphabet="ab ", max_size=20),
                          st.integers(0, 10_000)), max_size=5))
@settings(max_examples=40, deadline=None)
def test_parse_ass_cues_never_raises(rows):
    from tika_spark.subtitles import parse_ass_cues
    body = "[Events]\n" + "\n".join(
        f"Dialogue: 0,0:00:{i%60:02d}.00,0:00:{(i+1)%60:02d}.50,"
        f"D,,0,0,0,,{t}" for t, i in rows)
    out = parse_ass_cues(body)
    assert isinstance(out, list)
    for c in out:
        assert c["start_ms"] >= 0 and c["text"]
