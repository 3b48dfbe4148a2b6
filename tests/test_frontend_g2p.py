"""Frontend G2P tests (English CMUdict path + tone sandhi rules)."""
import os

import pytest

from tests.conftest import reference_available


def test_en_g2p_with_cmudict(monkeypatch):
    if not reference_available():
        pytest.skip("reference not mounted (cmudict data file)")
    monkeypatch.setenv("DIFF_VITS_CMUDICT", "/root/reference/text/cmudict.rep")
    import diff_vits_tpu.text.frontend as fe
    fe._cmudict_cache = None
    phones, tones, word2ph = fe.en_g2p("hello world")
    assert phones[0] == "_" and phones[-1] == "_"
    # HH AH0 L OW1 / W ER1 L D
    assert "hh" in phones and "ah" in phones and "w" in phones
    assert len(phones) == len(tones) == sum(word2ph)
    from diff_vits_tpu.text.frontend import cleaned_text_to_sequence
    ids, t_ids, langs = cleaned_text_to_sequence(phones, tones, "EN")
    assert all(l == 2 for l in langs)
    assert min(t_ids) >= 7  # EN tone offset


def test_tone_sandhi_rules():
    from diff_vits_tpu.text.tone_sandhi import ToneSandhi
    ts = ToneSandhi()
    # bu before tone 4 -> tone 2
    assert ts._bu_sandhi("不是", ["u4", "i4"]) == ["u2", "i4"]
    # A-bu-A -> neutral
    assert ts._bu_sandhi("好不好", ["ao3", "u4", "ao3"])[1] == "u5"
    # yi before tone 4 -> tone 2
    assert ts._yi_sandhi("一样", ["i1", "ang4"]) == ["i2", "ang4"]
    # 第一 ordinal -> tone 1
    assert ts._yi_sandhi("第一", ["i4", "i1"]) == ["i4", "i1"]
    # two third tones -> first becomes tone 2
    assert ts._three_sandhi("你好", ["i3", "ao3"]) == ["i2", "ao3"]
    # modified_tone pipeline runs
    out = ts.modified_tone("你好", "l", ["i3", "ao3"])
    assert out == ["i2", "ao3"]


def test_pre_merge():
    from diff_vits_tpu.text.tone_sandhi import ToneSandhi
    ts = ToneSandhi()
    merged = ts.pre_merge_for_modify([("不", "d"), ("是", "v")])
    assert merged == [("不是", "v")]
