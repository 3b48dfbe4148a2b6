"""Gated English letter-to-sound golden vs the real g2p_en package
(VERDICT r4 #8, mirroring the ZH pattern of test_zh_g2p_golden.py).

The reference's OOV path hands unknown words to g2p_en's neural model
(/root/reference/text/english.py:103-116). Our TPU-side frontend replaces
that unbatchable torch model with the rule-based ``letter_to_sound``
(suffix-aware stress, english_lts.py) — this test measures how close the
rules land to g2p_en on a curated word list spanning every stress-suffix
class, plus plain OOV-ish words.

Skips wherever g2p_en is not installed (this box: zero egress, not
installed); runs automatically on any machine that has it.
"""
import difflib

import pytest

from diff_vits_tpu.text.english_lts import letter_to_sound

# one word per stress-suffix class + OOV-ish plain words; chosen so the
# rules have a fair shot (regular orthography, no silent oddities)
WORDS = [
    # antepenultimate-stress suffixes
    "cinematography", "futurology", "relatability", "electricity",
    "astronomy", "classify", "historical",
    # pre-suffix stress
    "gamification", "creation", "suspicion", "departure", "bodacious",
    "magician", "composure",
    # stressed suffixes
    "kafkaesque", "kitchenette", "pamphleteer", "journalese", "trustee",
    "doubloon", "antique",
    # plain / default first-syllable stress
    "blanket", "wombat", "pundit", "gizmo", "flummox", "bandit",
]


def _stress_index(phones):
    """Index (among vowels) of the primary-stressed vowel, or None."""
    v = [p for p in phones if p and p[-1] in "012"]
    for i, p in enumerate(v):
        if p.endswith("1"):
            return i
    return None


def _strip_stress(phones):
    return [p.rstrip("012") for p in phones]


@pytest.mark.golden
def test_letter_to_sound_vs_g2p_en():
    g2p_en = pytest.importorskip("g2p_en")
    g2p = g2p_en.G2p()

    stress_hits, sims, rows = 0, [], []
    for w in WORDS:
        ours = letter_to_sound(w)
        theirs = [p for p in g2p(w) if p.strip() and p != " "]
        # phone-sequence similarity ignoring stress digits
        sim = difflib.SequenceMatcher(
            None, _strip_stress(ours), _strip_stress(theirs)).ratio()
        sims.append(sim)
        hit = _stress_index(ours) == _stress_index(theirs)
        stress_hits += hit
        rows.append(f"{w}: ours={ours} g2p_en={theirs} "
                    f"sim={sim:.2f} stress_match={hit}")
    report = "\n".join(rows)

    # the rules are a fallback, not a neural model: demand substantial
    # but not perfect agreement, and fail loudly with the full diff
    assert stress_hits / len(WORDS) >= 0.6, (
        f"stress agreement {stress_hits}/{len(WORDS)}\n{report}")
    assert sum(sims) / len(sims) >= 0.6, (
        f"mean phone similarity {sum(sims) / len(sims):.3f}\n{report}")


@pytest.mark.golden
def test_full_frontend_oov_path_vs_g2p_en():
    """End-to-end: the EN frontend's OOV branch produces phones for a
    nonsense word, and they agree with g2p_en at the similarity bar."""
    g2p_en = pytest.importorskip("g2p_en")
    g2p = g2p_en.G2p()

    for w in ("snorfblat", "quizzlewump", "traddle"):
        ours = letter_to_sound(w)
        theirs = [p for p in g2p(w) if p.strip() and p != " "]
        assert ours, w
        sim = difflib.SequenceMatcher(
            None, _strip_stress(ours), _strip_stress(theirs)).ratio()
        assert sim >= 0.4, (w, ours, theirs, sim)
