"""English letter-to-sound (LTS) fallback for out-of-vocabulary words.

Parity target: the reference phonemizes CMUdict misses with the g2p_en
package (english.py:4,12,103-116). This environment is zero-egress, so we
ship a dependency-free rule-based LTS in the spirit of the classic
NRL/Elovitz (1976) text-to-phoneme rules: ordered longest-match grapheme
rules with left/right context, producing ARPAbet. Output feeds the same
ARPA -> (phone, tone-from-stress) mapping as dictionary hits
(frontend.en_g2p), so OOV words yield plausible phones instead of UNK.

Primary stress is assigned to the first syllable (g2p_en predicts stress
with a model; a fixed-stress heuristic is the standard rule-based choice).
"""
from __future__ import annotations

import re
from typing import List, Tuple

_VOWELS = set('aeiouy')

# Ordered rules: (pattern, left_context_regex, right_context_regex, phones).
# Matched greedily at each position, first rule wins; contexts are regexes
# anchored at the boundary ('' = always). Phones '' = silent letters.
# A compact NRL-style core: digraphs, vowel teams, r-controlled vowels,
# soft c/g, magic-e and common suffixes.
_RULES: List[Tuple[str, str, str, str]] = [
    # -- whole-suffix rules (longest first) --
    ('tion', '', r'$|s$', 'SH AH0 N'),
    ('sion', r'[aeiou]$', r'$|s$', 'ZH AH0 N'),
    ('sion', '', r'$|s$', 'SH AH0 N'),
    ('cious', '', r'$', 'SH AH0 S'),
    ('tious', '', r'$', 'SH AH0 S'),
    ('geous', '', r'$', 'JH AH0 S'),
    ('ture', '', r'$|s$', 'CH ER0'),
    ('sure', r'[aeiou]$', r'$|s$', 'ZH ER0'),
    ('ought', '', '', 'AO1 T'),
    ('aught', '', '', 'AO1 T'),
    ('ough', '', r'$', 'OW1'),              # though, dough
    ('le', r'[^aeiou]$', r'$', 'AH0 L'),    # -ble/-gle/-tle
    ('ight', '', '', 'AY1 T'),
    ('igh', '', '', 'AY1'),
    ('ous', '', r'$', 'AH0 S'),
    ('able', '', r'$', 'AH0 B AH0 L'),
    ('ible', '', r'$', 'AH0 B AH0 L'),
    ('ment', '', r'$|s$', 'M AH0 N T'),
    ('ness', '', r'$', 'N AH0 S'),
    ('ful', '', r'$', 'F AH0 L'),
    ('less', '', r'$', 'L AH0 S'),
    ('ship', '', r'$', 'SH IH0 P'),
    ('ing', r'.', r'$|s$', 'IH0 NG'),
    ('ies', r'[^aeiou]$', r'$', 'IY0 Z'),
    ('ied', r'[^aeiou]$', r'$', 'IY0 D'),
    # -- consonant digraphs --
    ('tch', '', '', 'CH'),
    ('ch', r'^(?:s)$', '', 'K'),          # school, scheme
    ('ch', '', '', 'CH'),
    ('sh', '', '', 'SH'),
    ('th', '', '', 'TH'),
    ('ph', '', '', 'F'),
    ('gh', r'[aeiou][aeiou]?$', r'$', ''),  # though, through: silent
    ('gh', '', '', 'G'),
    ('wh', '', 'o', 'HH'),                  # who, whole
    ('wh', '', '', 'W'),
    ('ck', '', '', 'K'),
    ('ng', '', r'$|s$', 'NG'),
    ('ng', '', '', 'NG G'),
    ('qu', '', '', 'K W'),
    ('dge', '', '', 'JH'),
    ('kn', r'^$', '', 'N'),                 # knee
    ('wr', r'^$', '', 'R'),                 # write
    ('ps', r'^$', '', 'S'),                 # psalm
    ('gn', r'^$', '', 'N'),                 # gnome
    ('mb', '', r'$', 'M'),                  # lamb
    ('sc', '', r'[eiy]', 'S'),              # science
    ('cc', '', r'[eiy]', 'K S'),            # accent
    # -- vowel teams --
    ('eau', '', '', 'OW1'),
    ('ee', '', '', 'IY1'),
    ('ea', '', r'[^aeiou]*$', 'IY1'),
    ('ea', '', '', 'IY1'),
    ('ai', '', '', 'EY1'),
    ('ay', '', '', 'EY1'),
    ('oa', '', '', 'OW1'),
    ('ow', '', r'$|n$|s$|er', 'OW1'),
    ('ow', '', '', 'AW1'),
    ('ou', '', r'ght', 'AO1'),
    ('ou', '', r'(?:s$)|(?:r$)', 'ER1'),    # famous-like endings
    ('ou', '', '', 'AW1'),
    ('oo', '', r'k', 'UH1'),
    ('oo', '', '', 'UW1'),
    ('au', '', '', 'AO1'),
    ('aw', '', '', 'AO1'),
    ('oi', '', '', 'OY1'),
    ('oy', '', '', 'OY1'),
    ('ie', '', r'$', 'AY1'),
    ('ie', '', '', 'IY1'),
    ('ei', '', '', 'EY1'),
    ('ey', '', r'$', 'IY0'),
    ('ey', '', '', 'EY1'),
    ('ue', '', r'$', 'UW1'),
    ('ui', '', '', 'UW1'),
    ('eu', '', '', 'Y UW1'),
    ('ew', '', '', 'UW1'),
    # -- r-controlled vowels --
    ('air', '', '', 'EH1 R'),
    ('are', '', r'$', 'EH1 R'),
    ('ear', '', r'[^aeiou]', 'ER1'),
    ('ear', '', '', 'IH1 R'),
    ('eer', '', '', 'IH1 R'),
    ('ore', '', r'$', 'AO1 R'),
    ('ar', '', '', 'AA1 R'),
    ('or', r'w$', '', 'ER1'),               # word, world, work
    ('er', '', r'$', 'ER0'),
    ('er', '', '', 'ER1'),
    ('ir', '', '', 'ER1'),
    ('or', '', '', 'AO1 R'),
    ('ur', '', '', 'ER1'),
    # -- single consonants with context --
    ('c', '', r'[eiy]', 'S'),
    ('c', '', '', 'K'),
    ('g', '', r'[eiy]', 'JH'),
    ('g', '', '', 'G'),
    ('s', r'[aeiouy](?:[lmnrbdgvwz])?$', r'$', 'Z'),  # dogs, beds, ways
    ('s', '', '', 'S'),
    ('x', r'^$', '', 'Z'),                  # xylophone
    ('x', '', '', 'K S'),
    ('y', r'^$', '', 'Y'),                  # consonant y at word start
    ('b', '', '', 'B'), ('d', '', '', 'D'), ('f', '', '', 'F'),
    ('h', '', '', 'HH'), ('j', '', '', 'JH'), ('k', '', '', 'K'),
    ('l', '', '', 'L'), ('m', '', '', 'M'), ('n', '', '', 'N'),
    ('p', '', '', 'P'), ('r', '', '', 'R'), ('t', '', '', 'T'),
    ('v', '', '', 'V'), ('w', '', '', 'W'), ('z', '', '', 'Z'),
    # -- vowels: magic-e (long) then default (short) --
    ('a', '', r'[^aeiouwy]e(?:$|[sd]$)', 'EY1'),
    ('i', '', r'[^aeiouwy]e(?:$|[sd]$)', 'AY1'),
    ('o', '', r'[^aeiouwy]e(?:$|[sd]$)', 'OW1'),
    ('u', '', r'[^aeiouwy]e(?:$|[sd]$)', 'Y UW1'),
    ('e', '', r'[^aeiouwy]e(?:$|[sd]$)', 'IY1'),
    ('e', r'.', r'$', ''),                  # final silent e
    ('e', r'.', r'[sd]$', 'IH0'),           # -es/-ed when audible
    ('a', '', r'$', 'AH0'),
    ('a', '', r'l{2}', 'AO1'),
    ('a', '', '', 'AE1'),
    ('e', '', '', 'EH1'),
    ('i', '', r'$', 'IY0'),
    ('i', '', '', 'IH1'),
    ('o', '', r'$', 'OW1'),
    ('o', '', '', 'AA1'),
    ('u', '', '', 'AH1'),
    ('y', '', r'$', 'IY0'),
    ('y', '', '', 'IH1'),
    ("'", '', '', ''),
]

_COMPILED = [(pat, re.compile(lc + '$') if lc else None,
              re.compile(rc) if rc else None, ph.split() if ph else [])
             for (pat, lc, rc, ph) in _RULES]


def letter_to_sound(word: str) -> List[str]:
    """Rule-based grapheme -> ARPAbet with stress digits.

    Returns a CMUdict-style phone list (e.g. ['P', 'AY1', 'T', 'AO1',
    'R', 'CH']); empty for words with no letters.
    """
    w = word.lower()
    w = re.sub(r"[^a-z']", '', w)
    # doubled consonants sound once (hello, diffusion); keep 'cc'/'gg'
    # (context-sensitive) and vowel doubles (oo, ee)
    w = re.sub(r'([bdfhjklmnprstvz])\1+', r'\1', w)
    w = re.sub(r'([bcdfghjklmnpqrstvwxz])\1{2,}', r'\1', w)
    phones: List[str] = []
    i = 0
    while i < len(w):
        for pat, lc, rc, ph in _COMPILED:
            if not w.startswith(pat, i):
                continue
            if lc is not None and not lc.search(w[:i]):
                continue
            if rc is not None and not rc.match(w[i + len(pat):]):
                continue
            phones.extend(ph)
            i += len(pat)
            break
        else:
            i += 1  # unknown character: skip
    return _fix_stress(phones)


def _fix_stress(phones: List[str]) -> List[str]:
    """Keep primary stress only on the first stressed vowel; later stressed
    vowels are demoted to unstressed (single-word heuristic)."""
    out = []
    seen_primary = False
    for p in phones:
        if p and p[-1] in '012':
            if p[-1] == '1':
                if seen_primary:
                    p = p[:-1] + '0'
                seen_primary = True
        out.append(p)
    if not seen_primary:
        # no stressed vowel at all: promote the first vowel if any
        for k, p in enumerate(out):
            if p and p[-1] in '02':
                out[k] = p[:-1] + '1'
                break
    return out
