"""Text frontend tests: symbol tables, sequence encoding, pinyin lexicon."""
import numpy as np
import pytest

from tests.conftest import reference_available, add_reference_to_path

import importlib

S = importlib.import_module("diff_vits_tpu.text.symbols")
from diff_vits_tpu.text.frontend import cleaned_text_to_sequence
from diff_vits_tpu.text.pinyin_lexicon import build_lexicon


def test_symbol_tables_match_reference():
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import importlib
    spec = importlib.util.spec_from_file_location(
        "ref_symbols", "/root/reference/text/symbols.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    assert S.symbols == ref.symbols
    assert S.num_tones == ref.num_tones
    assert S.language_id_map == ref.language_id_map
    assert S.language_tone_start_map == ref.language_tone_start_map


def test_cleaned_text_to_sequence():
    phones, tones, langs = cleaned_text_to_sequence(
        ['_', 'n', 'i', 'h', 'ao', '_'], [0, 3, 3, 2, 2, 0], 'ZH')
    assert len(phones) == 6
    assert phones[0] == 0  # pad
    assert tones == [0, 3, 3, 2, 2, 0]   # ZH offset 0
    assert langs == [0] * 6

    _, tones_en, langs_en = cleaned_text_to_sequence(['hh', 'ah'], [0, 1], 'EN')
    assert tones_en == [7, 8]   # EN tone offset = 6 + 1
    assert langs_en == [2, 2]


def test_pinyin_lexicon_matches_reference():
    if not reference_available():
        pytest.skip("reference not mounted")
    ref_map = {}
    with open("/root/reference/text/opencpop-strict.txt") as f:
        for line in f:
            line = line.strip()
            if line:
                k, v = line.split("\t")
                ref_map[k] = v.split(" ")
    ours = build_lexicon()
    missing = set(ref_map) - set(ours)
    extra = set(ours) - set(ref_map)
    wrong = {k: (ours[k], ref_map[k]) for k in set(ref_map) & set(ours)
             if ours[k] != ref_map[k]}
    assert not missing, f"missing syllables: {sorted(missing)}"
    assert not wrong, f"wrong mappings: {wrong}"
    # extra valid syllables we generate beyond the reference are harmless
    # but report them for visibility
    assert len(extra) < 40, sorted(extra)


def test_all_lexicon_phones_in_symbol_table():
    for syllable, phones in build_lexicon().items():
        for p in phones:
            assert p in S.symbols, (syllable, p)


def test_num_to_hanzi():
    """Inter-group zeros and 十-head rules (cn2an fallback)."""
    from diff_vits_tpu.text.frontend import _num_to_hanzi as f
    cases = {
        "0": "零", "10": "十", "15": "十五", "105": "一百零五",
        "10005": "一万零五", "15000": "一万五千",
        "100000005": "一亿零五", "110000": "十一万",
        "2110000": "二百一十一万", "3.14": "三点一四",
    }
    for k, v in cases.items():
        assert f(k) == v, (k, f(k), v)


def test_pinyin_lexicon_fallback_cached():
    from diff_vits_tpu.text import frontend as fe
    a = fe._load_pinyin_lexicon()
    b = fe._load_pinyin_lexicon()
    assert a is b  # module-level cache
    assert a["zhong"] == ["zh", "ong"]


def test_ja_kana_fallback():
    """Kana G2P fallback (no pyopenjtalk): openjtalk-style phones, katakana
    folding, sokuon/hatsuon/long-vowel handling; all phones in the table."""
    from diff_vits_tpu.text.frontend import ja_g2p, kana_g2p
    from diff_vits_tpu.text.symbols import symbols as all_symbols

    assert kana_g2p('こんにちは') == ['k', 'o', 'N', 'n', 'i', 'ch', 'i',
                                 'h', 'a']
    assert kana_g2p('きょう') == ['ky', 'o', 'u']
    assert kana_g2p('がっこう') == ['g', 'a', 'cl', 'k', 'o', 'u']
    assert kana_g2p('ラーメン') == ['r', 'a', 'a', 'm', 'e', 'N']
    assert kana_g2p('こんにちは、') == ['k', 'o', 'N', 'n', 'i', 'ch', 'i',
                                  'h', 'a', ',']
    phones, tones, word2ph = ja_g2p('こんにちは')
    assert phones[0] == '_' and phones[-1] == '_'
    assert all(t == 0 for t in tones)
    for p in phones:
        assert p in all_symbols, p
