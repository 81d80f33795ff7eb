"""CJK multibyte charset recognizer tests (C7 widening —
CharsetRecog_mbcs family semantics)."""

import pytest

from tika_spark.charset import detect_statistical

JP = "データ処理は高速で、スパークの分散処理が有効です。今日は良い天気。"
KR = "스파크 분산 처리 시스템은 매우 빠르게 동작합니다. 오늘 날씨가 좋다."
ZH_S = "火花分布式处理系统运行速度非常快。今天这个天气很好。我们说数据批处理窗口还可以。"
ZH_T = "火花分散式處理系統運行速度非常快。今天這個天氣很好。我們說資料批次處理視窗還可以。"


@pytest.mark.parametrize("codec,text", [
    ("shift_jis", JP), ("euc_jp", JP), ("cp949", KR),
    ("gb18030", ZH_S), ("big5", ZH_T),
])
def test_cjk_detection(codec, text):
    assert detect_statistical(text.encode(codec)) == codec


def test_cjk_utf8_still_wins():
    assert detect_statistical(JP.encode("utf-8")) == "utf-8"
    assert detect_statistical(ZH_S.encode("utf-8")) == "utf-8"


def test_iso2022_jp_escape():
    assert detect_statistical(JP.encode("iso2022_jp")) == "iso2022_jp"


def test_no_cyrillic_regression():
    ru = "привет мир как дела сегодня хорошо"
    assert detect_statistical(ru.encode("koi8-r")) == "koi8-r"
    assert detect_statistical(ru.encode("cp866")) == "cp866"


def test_declared_hint_still_applies():
    # ambiguous short latin-1 bytes: declared hint must win
    raw = "café au lait".encode("iso-8859-1")
    assert detect_statistical(raw, declared="iso-8859-1") == "iso-8859-1"


class TestSbcsNgram:
    """Per-language single-byte recognizers (CharsetRecog_sbcs analog):
    detection must pick a charset that decodes to the true text."""

    CASES = [
        ("windows-1251", "Современные технологии обработки данных "
                         "развиваются быстро и меняют нашу жизнь"),
        ("iso-8859-5", "Современные технологии обработки данных "
                       "развиваются быстро"),
        ("iso-8859-7", "Η επεξεργασία φυσικής γλώσσας είναι σημαντικός "
                       "τομέας της επιστήμης των υπολογιστών"),
        ("iso-8859-2", "Przetwarzanie języka naturalnego jest ważną "
                       "dziedziną współczesnej informatyki"),
    ]

    def test_text_equal_after_roundtrip(self):
        from tika_spark.charset import decode, detect_statistical
        for codec, text in self.CASES:
            raw = text.encode(codec, "ignore")
            got = detect_statistical(raw)
            assert decode(raw, got) == decode(raw, codec), (codec, got)

    def test_thai(self):
        from tika_spark.charset import detect_statistical
        from tika_spark.language.corpus import SEED_TEXT
        raw = SEED_TEXT["th"][:200].encode("tis-620", "ignore")
        assert detect_statistical(raw) == "tis-620"

    def test_exact_cyrillic_layouts(self):
        from tika_spark.charset import detect_statistical
        t = "проверка различных кириллических кодировок в документе"
        assert detect_statistical(t.encode("windows-1251")) == \
            "windows-1251"
        assert detect_statistical(t.encode("koi8-r")) == "koi8-r"
        assert detect_statistical(t.encode("cp866")) == "cp866"
