"""Mandarin tone-sandhi rules.

Capability parity with the reference's ``text/tone_sandhi.py`` (ToneSandhi):
neutral-tone particles, 不 (bu) sandhi, 一 (yi) sandhi, third-tone sandhi and
word-merge heuristics. The rule *algorithms* are the standard published
Mandarin sandhi rules; the large must-neutral-tone word table is data the
user can extend via ``ToneSandhi.add_neutral_words``.
"""
from __future__ import annotations

from typing import List, Tuple


class ToneSandhi:
    # particles and suffixes that take the neutral tone
    _NEUTRAL_SUFFIXES = {
        '吧', '呢', '啊', '嘛', '么', '呀', '哪', '哇', '的', '地', '得',
        '了', '着', '过', '们', '子', '头', '上', '下', '里', '边', '面',
    }
    # a compact seed of common must-neutral-tone words (extensible)
    _NEUTRAL_WORDS = {
        '东西', '衣服', '意思', '事情', '时候', '力气', '告诉', '喜欢',
        '知道', '明白', '漂亮', '便宜', '商量', '打听', '热闹', '麻烦',
        '朋友', '认识', '先生', '丈夫', '爸爸', '妈妈', '哥哥', '弟弟',
        '姐姐', '妹妹', '奶奶', '爷爷', '叔叔', '阿姨', '姑娘', '孩子',
        '聪明', '快活', '巴掌', '拳头', '石头', '木头', '枕头', '馒头',
        '豆腐', '萝卜', '葡萄', '玻璃', '琉璃', '篱笆', '玫瑰', '骆驼',
        '蘑菇', '蛤蟆', '狐狸', '刺猬', '蚂蚁', '蜻蜓', '蝴蝶', '月亮',
        '太阳', '星星', '云彩', '消息', '工夫', '功夫', '名字', '主意',
        '记性', '性子', '脾气', '福气', '运气', '力量', '队伍', '规矩',
    }
    _NOT_NEUTRAL = {'男子', '女子', '分子', '原子', '量子', '莲子', '日子'}

    def __init__(self):
        self.must_neural_tone_words = set(self._NEUTRAL_WORDS)

    def add_neutral_words(self, words):
        self.must_neural_tone_words.update(words)

    # -- individual rules ---------------------------------------------------

    def _neural_sandhi(self, word: str, pos: str,
                       finals: List[str]) -> List[str]:
        if not finals:
            return finals
        # reduplication: 妈妈, 看看 -> second syllable neutral
        for j, item in enumerate(word):
            if (j >= 1 and item == word[j - 1]
                    and pos[0] in {'n', 'v', 'a'}
                    and word not in self._NOT_NEUTRAL):
                finals[j] = finals[j][:-1] + '5'
        # sentence-final / structural particles
        if len(word) >= 1 and word[-1] in self._NEUTRAL_SUFFIXES \
                and word not in self._NOT_NEUTRAL and len(word) > 1:
            finals[-1] = finals[-1][:-1] + '5'
        if word in self.must_neural_tone_words or (
                len(word) >= 2
                and word[-2:] in self.must_neural_tone_words):
            finals[-1] = finals[-1][:-1] + '5'
        return finals

    def _bu_sandhi(self, word: str, finals: List[str]) -> List[str]:
        # 不 between syllables of an A-不-A pattern -> neutral
        if len(word) == 3 and word[1] == '不':
            finals[1] = finals[1][:-1] + '5'
        else:
            for i, char in enumerate(word):
                # 不 before tone-4 syllable -> tone 2
                if char == '不' and i + 1 < len(word) \
                        and finals[i + 1][-1] == '4':
                    finals[i] = finals[i][:-1] + '2'
        return finals

    def _yi_sandhi(self, word: str, finals: List[str]) -> List[str]:
        # 一 between reduplicated verbs (看一看) -> neutral
        if len(word) == 3 and word[1] == '一' and word[0] == word[-1]:
            finals[1] = finals[1][:-1] + '5'
        elif word.startswith('第一'):
            finals[1] = finals[1][:-1] + '1'
        else:
            for i, char in enumerate(word):
                if char == '一' and i + 1 < len(word):
                    # before tone 4 -> tone 2; otherwise -> tone 4
                    if finals[i + 1][-1] == '4':
                        finals[i] = finals[i][:-1] + '2'
                    elif word[i + 1] not in '零一二三四五六七八九十':
                        finals[i] = finals[i][:-1] + '4'
        return finals

    def _three_sandhi(self, word: str, finals: List[str]) -> List[str]:
        # consecutive third tones: all but the last become tone 2
        # (pairwise left-to-right within the word)
        if len(finals) == 2 and self._all_tone_three(finals):
            finals[0] = finals[0][:-1] + '2'
        elif len(finals) >= 3:
            i = 0
            while i < len(finals) - 1:
                if finals[i][-1] == '3' and finals[i + 1][-1] == '3':
                    finals[i] = finals[i][:-1] + '2'
                i += 1
        return finals

    @staticmethod
    def _all_tone_three(finals: List[str]) -> bool:
        return all(f[-1] == '3' for f in finals)

    # -- public api (reference-compatible) ---------------------------------

    def pre_merge_for_modify(self, seg: List[Tuple[str, str]]):
        """Merge segmenter output so sandhi rules see whole words.

        Merges: 不/一 with the following word; reduplicated single chars.
        """
        out: List[Tuple[str, str]] = []
        i = 0
        while i < len(seg):
            word, pos = seg[i]
            if word in ('不', '一') and i + 1 < len(seg):
                nxt_word, nxt_pos = seg[i + 1]
                out.append((word + nxt_word, nxt_pos))
                i += 2
                continue
            if (out and word == out[-1][0] and len(word) == 1
                    and pos[0] in {'n', 'v', 'a'}):
                prev_word, prev_pos = out.pop()
                out.append((prev_word + word, prev_pos))
                i += 1
                continue
            out.append((word, pos))
            i += 1
        return out

    def modified_tone(self, word: str, pos: str,
                      finals: List[str]) -> List[str]:
        finals = self._bu_sandhi(word, finals)
        finals = self._yi_sandhi(word, finals)
        finals = self._neural_sandhi(word, pos, finals)
        finals = self._three_sandhi(word, finals)
        return finals
