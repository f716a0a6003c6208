"""Repetition cleaner: kill Whisper decode loops in subtitle text.

Behavioral counterpart of the reference's repetition cleaner
(reference: whisperjav/modules/repetition_cleaner.py:94 —
character-run collapse あああああ→あぁ, phrase-loop collapse, all-repetition
and high-density detection, protected onomatopoeia, modification
validation), written fresh with a compact rule set:

1. character runs: >N identical CJK chars collapse to a doubled form;
2. phrase loops: a unit of 1-8 chars repeated ≥3 times collapses to one
   (or two for very short units) occurrences;
3. punctuation runs collapse;
4. a guard validates that cleaning never removes ALL content and never
   touches protected expressions (laughing/moaning onomatopoeia kept).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple


@dataclass
class RepetitionStats:
    char_runs: int = 0
    phrase_loops: int = 0
    punct_runs: int = 0

    @property
    def total(self) -> int:
        return self.char_runs + self.phrase_loops + self.punct_runs


# expressions that legitimately repeat and must survive cleaning
_PROTECTED = (
    "ふふ", "うふふ", "はは", "あはは", "えへへ", "ほほ", "くく", "ぐぐ",
)

_PUNCT_CLASS = "。、．，・…!?！？〜ー~\\-"
_CHAR_RUN = re.compile(r"([^%s\s])\1{3,}" % _PUNCT_CLASS, re.DOTALL)
_PUNCT_RUN = re.compile(r"([%s])\1{2,}" % _PUNCT_CLASS)


def _collapse_char_run(m: re.Match) -> str:
    ch = m.group(1)
    # あああああ → あぁ (small-kana echo) for kana; otherwise keep doubled
    small = {"あ": "あぁ", "い": "いぃ", "う": "うぅ", "え": "えぇ",
             "お": "おぉ", "ん": "んん", "ア": "アァ", "イ": "イィ",
             "ウ": "ウゥ", "エ": "エェ", "オ": "オォ"}
    return small.get(ch, ch + ch)


class RepetitionCleaner:
    def __init__(self, max_phrase_len: int = 8, min_loops: int = 3):
        self.max_phrase_len = max_phrase_len
        self.min_loops = min_loops
        # phrase-loop pattern: shortest unit repeated min_loops+ times
        self._phrase = re.compile(
            r"(.{1,%d}?)\1{%d,}" % (max_phrase_len, min_loops - 1),
            re.DOTALL)

    def clean(self, text: str) -> Tuple[str, RepetitionStats]:
        stats = RepetitionStats()
        if not text:
            return text, stats
        original = text

        def protected(seg: str) -> bool:
            return any(p in seg for p in _PROTECTED)

        # 1. punctuation runs first, so loop detection below sees them done
        def punct_sub(m):
            stats.punct_runs += 1
            ch = m.group(1)
            return "…" if ch in "…。、" else ch * 2

        text = _PUNCT_RUN.sub(punct_sub, text)

        # 2. character runs
        def char_sub(m):
            if protected(m.group(0)):
                return m.group(0)
            stats.char_runs += 1
            return _collapse_char_run(m)

        text = _CHAR_RUN.sub(char_sub, text)

        # 3. phrase loops (repeat until fixpoint, bounded)
        for _ in range(4):
            def phrase_sub(m):
                unit = m.group(1)
                if protected(m.group(0)) or not unit.strip():
                    return m.group(0)
                stats.phrase_loops += 1
                # very short units keep a doubled echo (natural JA emphasis)
                return unit * 2 if len(unit) <= 2 else unit

            new = self._phrase.sub(phrase_sub, text)
            if new == text:
                break
            text = new

        # 4. validation guard: cleaning must not wipe the line out
        if original.strip() and not text.strip():
            return original, RepetitionStats()
        return text, stats

    def is_mostly_repetition(self, text: str, threshold: float = 0.7) -> bool:
        """High-density check: fraction of text consumed by repeats."""
        if not text or len(text) < 8:
            return False
        cleaned, stats = self.clean(text)
        if stats.total == 0:
            return False
        removed = len(text) - len(cleaned)
        return removed / len(text) >= threshold
