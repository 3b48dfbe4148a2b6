"""Tone sandhi full-parity tests (reference text/tone_sandhi.py:22-351).

Each rule class gets curated word/POS/finals cases. The jieba/pypinyin
backends are absent in this environment, so the segmenter- and
pinyin-dependent paths are exercised through injected stand-ins
(``cut_for_search``/``finals_fn``), which is exactly the surface the
reference reaches through jieba.cut_for_search (:159) and lazy_pinyin
(:263,293).
"""
from diff_vits_tpu.text.tone_sandhi import (
    MUST_NEURAL_TONE_WORDS,
    MUST_NOT_NEURAL_TONE_WORDS,
    ToneSandhi,
)


def test_neutral_table_size():
    # reference table (:24-63) has 420 entries; ours is the same data
    assert len(MUST_NEURAL_TONE_WORDS) == 420
    for w in ('麻烦', '惦记', '豆腐', '先生', '菩萨', '扫把'):
        assert w in MUST_NEURAL_TONE_WORDS
    assert MUST_NOT_NEURAL_TONE_WORDS == {
        '男子', '女子', '分子', '原子', '量子', '莲子', '石子', '瓜子',
        '电子', '人人', '虎虎'}


# -- _neural_sandhi ----------------------------------------------------------

def test_neural_reduplication():
    ts = ToneSandhi()
    # 奶奶 n. reduplication -> second syllable neutral (:79-83)
    assert ts._neural_sandhi('奶奶', 'n', ['ai3', 'ai3']) == ['ai3', 'ai5']
    # must_not_neural blocks it: 人人
    assert ts._neural_sandhi('人人', 'n', ['en2', 'en2']) == ['en2', 'en2']


def test_neural_particles_and_de():
    ts = ToneSandhi()
    assert ts._neural_sandhi('走吧', 'y', ['ou3', 'a1'])[-1] == 'a5'
    assert ts._neural_sandhi('我的', 'u', ['o3', 'e4'])[-1] == 'e5'


def test_neural_men_zi_and_locatives():
    ts = ToneSandhi()
    # 们/子 with pos r/n (:92-95)
    assert ts._neural_sandhi('我们', 'r', ['o3', 'en2'])[-1] == 'en5'
    assert ts._neural_sandhi('桌子', 'n', ['uo1', 'i3'])[-1] == 'i5'
    # must_not blocks: 原子 n
    assert ts._neural_sandhi('原子', 'n', ['uan2', 'i3'])[-1] == 'i3'
    # 上/下/里 with pos s/l/f (:97): 家里
    assert ts._neural_sandhi('家里', 's', ['ia1', 'i3'])[-1] == 'i5'
    # wrong pos -> untouched by the locative rule
    assert ts._neural_sandhi('家里', 'v', ['ia1', 'i3'])[-1] == 'i3'


def test_neural_lai_qu():
    ts = ToneSandhi()
    # 上来/下去 (:100): final syllable neutral
    assert ts._neural_sandhi('上来', 'v', ['ang4', 'ai2'])[-1] == 'ai5'
    assert ts._neural_sandhi('下去', 'v', ['ia4', 'v4'])[-1] == 'v5'
    assert ts._neural_sandhi('出来', 'v', ['u1', 'ai2'])[-1] == 'ai5'
    # 来 not preceded by a directional verb: no rule fires
    assert ts._neural_sandhi('未来', 'n', ['ei4', 'ai2'])[-1] == 'ai2'


def test_neural_ge_classifier():
    ts = ToneSandhi()
    # numeric + 个 (:103-106)
    assert ts._neural_sandhi('三个', 'm', ['an1', 'e4']) == ['an1', 'e5']
    assert ts._neural_sandhi('几个', 'm', ['i3', 'e4'])[-1] == 'e5'
    assert ts._neural_sandhi('每个', 'r', ['ei3', 'e4'])[-1] == 'e5'
    # lone 个
    assert ts._neural_sandhi('个', 'q', ['e4']) == ['e5']
    # 个 mid-word with a qualifying left neighbor: that syllable goes
    # neutral, e.g. 两个人
    out = ts._neural_sandhi('两个人', 'm', ['ang3', 'e4', 'en2'])
    assert out[1] == 'e5'


def test_neural_table_fallback_and_subword():
    ts = ToneSandhi()
    # whole word in table (else branch, :108-110)
    assert ts._neural_sandhi('豆腐', 'n', ['ou4', 'u3'])[-1] == 'u5'
    # last-2-chars in table
    assert ts._neural_sandhi('冻豆腐', 'n', ['ong4', 'ou4', 'u3'])[-1] == 'u5'
    # sub-word pass (:112-119): split word whose first part is in the table
    ts2 = ToneSandhi(cut_for_search=lambda w: ['豆腐', w])
    out = ts2._neural_sandhi('豆腐乳', 'n', ['ou4', 'u3', 'u3'])
    assert out[1] == 'u5'  # 豆腐 sub-word -> its last syllable neutral


# -- _bu_sandhi / _yi_sandhi --------------------------------------------------

def test_bu_sandhi():
    ts = ToneSandhi()
    assert ts._bu_sandhi('不是', ['u4', 'i4']) == ['u2', 'i4']
    assert ts._bu_sandhi('不好', ['u4', 'ao3']) == ['u4', 'ao3']
    # A-不-A -> neutral (:124)
    assert ts._bu_sandhi('好不好', ['ao3', 'u4', 'ao3'])[1] == 'u5'
    assert ts._bu_sandhi('看不懂', ['an4', 'u4', 'ong3'])[1] == 'u5'


def test_yi_sandhi():
    ts = ToneSandhi()
    # number sequence: unchanged (:136-138)
    assert ts._yi_sandhi('一零零', ['i1', 'ing2', 'ing2']) == \
        ['i1', 'ing2', 'ing2']
    # reduplicated verb (:140)
    assert ts._yi_sandhi('看一看', ['an4', 'i1', 'an4'])[1] == 'i5'
    # ordinal (:143)
    assert ts._yi_sandhi('第一名', ['i4', 'i1', 'ing2'])[1] == 'i1'
    # before tone 4 -> yi2 (:149)
    assert ts._yi_sandhi('一段', ['i1', 'uan4'])[0] == 'i2'
    # before non-tone-4 -> yi4 (:151-155)
    assert ts._yi_sandhi('一天', ['i1', 'ian1'])[0] == 'i4'
    # before punctuation: unchanged
    assert ts._yi_sandhi('一，', ['i1', '，'])[0] == 'i1'


# -- _three_sandhi ------------------------------------------------------------

def test_three_sandhi_pairs_and_idiom():
    ts = ToneSandhi()
    assert ts._three_sandhi('你好', ['i3', 'ao3']) == ['i2', 'ao3']
    # 4-char idiom: two halves independently (:200-206)
    out = ts._three_sandhi('彼此理解',
                           ['i3', 'i3', 'i3', 'ie3'])
    assert out == ['i2', 'i3', 'i2', 'ie3']


def test_three_sandhi_split_word():
    # disyllabic + monosyllabic all-three, e.g. 蒙古包-like 雨伞厂 (:178)
    ts = ToneSandhi(cut_for_search=lambda w: ['雨伞', w])
    out = ts._three_sandhi('雨伞厂', ['v3', 'an3', 'ang3'])
    assert out == ['v2', 'an2', 'ang3']
    # monosyllabic + disyllabic all-three, e.g. 纸老虎 (:182)
    ts = ToneSandhi(cut_for_search=lambda w: ['老虎', w])
    out = ts._three_sandhi('纸老虎', ['i3', 'ao3', 'u3'])
    assert out == ['i3', 'ao2', 'u3']
    # not all-three: per-subword pass, e.g. 所有/人 (:190)
    ts = ToneSandhi(cut_for_search=lambda w: ['所有', w])
    out = ts._three_sandhi('所有人', ['uo3', 'ou3', 'en2'])
    assert out == ['uo2', 'ou3', 'en2']
    # 好/喜欢 cross-boundary (:193-197)
    ts = ToneSandhi(cut_for_search=lambda w: ['喜欢', w])
    out = ts._three_sandhi('好喜欢', ['ao3', 'i3', 'uan1'])
    assert out == ['ao2', 'i3', 'uan1']


def test_split_word_fallback_dictionary():
    # built-in fallback finds in-table 2-grams without jieba
    ts = ToneSandhi()
    assert ts._split_word('纸老虎') == ['纸', '老虎']
    assert ts._split_word('豆腐乳') == ['豆腐', '乳']
    # no dictionary hit: whole word + empty tail
    assert ts._split_word('xyz') == ['xyz', '']


# -- merge passes -------------------------------------------------------------

def test_merge_bu():
    ts = ToneSandhi()
    assert ts._merge_bu([('不', 'd'), ('是', 'v')]) == [('不是', 'v')]
    # trailing lone 不 kept (:224-226)
    assert ts._merge_bu([('我', 'r'), ('不', 'd')]) == \
        [('我', 'r'), ('不', 'd')]


def test_merge_yi_reduplication():
    ts = ToneSandhi()
    # 听/一/听 -> 听一听 (:238-247)
    out = ts._merge_yi([('听', 'v'), ('一', 'm'), ('听', 'v')])
    assert [list(p) for p in out] == [['听一听', 'v']]
    # lone 一 merges into the next word, keeping 一's pos (:251-255)
    out = ts._merge_yi([('一', 'm'), ('天', 'n')])
    assert [list(p) for p in out] == [['一天', 'm']]


def test_merge_reduplication_and_er():
    ts = ToneSandhi()
    out = ts._merge_reduplication([('看', 'v'), ('看', 'v'), ('书', 'n')])
    assert [list(p) for p in out] == [['看看', 'v'], ['书', 'n']]
    out = ts._merge_er([('花', 'n'), ('儿', 'n')])
    assert [list(p) for p in out] == [['花儿', 'n']]
    # sentinel '#' blocks the merge (:316)
    out = ts._merge_er([('#', 'x'), ('儿', 'n')])
    assert [list(p) for p in out] == [['#', 'x'], ['儿', 'n']]


def _fake_finals(table):
    return lambda w: table[w]


def test_merge_continuous_three_tones():
    # both words all-tone-3 and combined length <= 3 -> merged (:259-283)
    table = {'很': ['en3'], '好': ['ao3'], '姐姐': ['ie3', 'ie3'],
             '你': ['i3']}
    ts = ToneSandhi(finals_fn=_fake_finals(table))
    out = ts._merge_continuous_three_tones([('很', 'd'), ('好', 'a')])
    assert [list(p) for p in out] == [['很好', 'd']]
    # a *previous* reduplication word is NOT merged into (:273-275)
    out = ts._merge_continuous_three_tones([('姐姐', 'n'), ('你', 'r')])
    assert [list(p) for p in out] == [['姐姐', 'n'], ['你', 'r']]


def test_merge_continuous_three_tones_2():
    # last char tone-3 + first char tone-3 (:289-311): 跑*马* + *很* ...
    table = {'跑马': ['ao3', 'a3'], '场': ['ang3'],
             '好': ['ao3'], '的': ['e5']}
    ts = ToneSandhi(finals_fn=_fake_finals(table))
    out = ts._merge_continuous_three_tones_2([('跑马', 'n'), ('场', 'n')])
    assert [list(p) for p in out] == [['跑马场', 'n']]
    out = ts._merge_continuous_three_tones_2([('好', 'a'), ('的', 'u')])
    assert [list(p) for p in out] == [['好', 'a'], ['的', 'u']]


def test_pre_merge_pipeline_without_backends():
    # full pipeline runs with no jieba/pypinyin installed
    ts = ToneSandhi()
    out = ts.pre_merge_for_modify(
        [('不', 'd'), ('是', 'v'), ('花', 'n'), ('儿', 'n')])
    assert out == [('不是', 'v'), ('花儿', 'n')]


def test_modified_tone_pipeline():
    ts = ToneSandhi()
    assert ts.modified_tone('你好', 'l', ['i3', 'ao3']) == ['i2', 'ao3']
    # neutral-table word passes through the whole pipeline
    assert ts.modified_tone('豆腐', 'n', ['ou4', 'u3']) == ['ou4', 'u5']
