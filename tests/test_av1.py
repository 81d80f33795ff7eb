"""AV1 metadata tier (analysis/av1.py): OBU walk + sequence header."""

import pytest

from tika_spark.analysis.av1 import (Av1Error, av1_meta, ivf_wrap,
                                     parse_obus, seq_header_obu)


class TestSeqHeader:
    def test_reduced_roundtrip(self):
        obu = seq_header_obu(2, 9, 1920, 1080, reduced=True)
        m = av1_meta(obu)
        assert (m["profile"], m["level"]) == (2, 9)
        assert (m["width"], m["height"]) == (1920, 1080)
        assert m["still"] and m["reduced"]

    def test_general_path_with_tier(self):
        obu = seq_header_obu(0, 12, 640, 360, reduced=False,
                             still=False, tier=1)
        m = av1_meta(obu)
        assert (m["level"], m["tier"]) == (12, 1)
        assert not m["reduced"] and not m["still"]

    def test_low_level_has_no_tier_bit(self):
        m = av1_meta(seq_header_obu(1, 4, 320, 240, reduced=False))
        assert (m["level"], m["tier"]) == (4, 0)

    def test_ivf_carriage(self):
        obu = seq_header_obu(0, 5, 800, 600)
        m = av1_meta(ivf_wrap(obu, 800, 600, n_frames=3))
        assert (m["ivf_width"], m["ivf_height"]) == (800, 600)
        assert m["n_frames"] == 3 and m["width"] == 800

    def test_errors_are_loud(self):
        with pytest.raises(Av1Error):
            av1_meta(b"")
        with pytest.raises(Av1Error):
            av1_meta(b"DKIF" + b"\x00" * 28)        # wrong fourcc
        # temporal-delimiter-only stream: no sequence header
        with pytest.raises(Av1Error):
            av1_meta(bytes([0x12, 0x00]))

    def test_obu_walk_sizes(self):
        obu = seq_header_obu(0, 0, 16, 16)
        td = bytes([0x12, 0x00])                    # temporal delim
        obus = parse_obus(td + obu)
        assert [t for t, _ in obus] == [2, 1]
