"""Hallucination removal: blacklist + regex rules for Whisper artifacts.

Behavioral counterpart of the reference's hallucination remover
(reference: whisperjav/modules/hallucination_remover.py:81-344 —
normalized exact-match blacklist per language, safe regex replacement,
bracketed-context guards, versioned JSON DBs). The phrase database here is
authored fresh from the well-known public catalogue of Whisper Japanese
hallucinations (training-data watermarks: closing credits, channel
subscription requests, subtitle attribution lines, music markers); it is
a Python-level registry extendable at runtime via ``add_phrases``.

Matching is NFKC-normalized and whitespace-insensitive; a line is dropped
when, after removing hallucinated content, nothing meaningful remains.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Tuple

# --- exact-match phrase blacklist (normalized) -----------------------------
# Whisper JA training-data watermarks that surface in silence/music/noise.
JA_HALLUCINATION_PHRASES = [
    "ご視聴ありがとうございました",
    "ご視聴ありがとうございます",
    "ご清聴ありがとうございました",
    "最後までご視聴いただきありがとうございます",
    "最後までご視聴ありがとうございました",
    "チャンネル登録をお願いします",
    "チャンネル登録よろしくお願いします",
    "チャンネル登録お願いします",
    "チャンネル登録と高評価をお願いします",
    "次の動画でお会いしましょう",
    "また次の動画でお会いしましょう",
    "この動画が良かったらチャンネル登録お願いします",
    "字幕は視聴者によって作成されました",
    "この字幕は視聴者によって作成されました",
    "日本語字幕は視聴者の皆様にご提供いただきました",
    "おやすみなさい",
    "ありがとうございました",
    "明日も頑張りましょう",
    "提供",
    "番組の途中ですが",
    "本日はご視聴いただき誠にありがとうございました",
    "動画をご覧いただきありがとうございます",
    "コメント欄で教えてください",
    "高評価とチャンネル登録をお願いします",
]

EN_HALLUCINATION_PHRASES = [
    "thanks for watching",
    "thank you for watching",
    "please subscribe",
    "don't forget to subscribe",
    "like and subscribe",
    "see you in the next video",
    "subtitles by the amara.org community",
    "subtitles provided by",
    "copyright",
    "all rights reserved",
]

# --- regex rules (applied to line content) ---------------------------------
# Each rule: (compiled pattern, replacement). Patterns are written to be
# linear-time (no nested quantifiers over the same class) — the ReDoS
# discipline the reference enforces in tests/test_redos_all_patterns.py.
JA_REGEX_RULES: List[Tuple[re.Pattern, str]] = [
    # music/noise markers
    (re.compile(r"[♪♩♫♬]+[〜~ー]*"), ""),
    (re.compile(r"[（(【\[]\s*(?:音楽|拍手|笑い?|BGM|効果音|無音|雑音|咳払い)\s*[）)】\]]"), ""),
    # timestamps / credits artifacts
    (re.compile(r"(?:www\.|https?://)\S+"), ""),
    # isolated dots/commas lines
    (re.compile(r"^[\s。、．，・…]+$"), ""),
]


def normalize_text(text: str) -> str:
    """NFKC + strip all whitespace — the comparison space for blacklists."""
    t = unicodedata.normalize("NFKC", text)
    return re.sub(r"\s+", "", t).lower()


@dataclass
class HallucinationStats:
    exact_removed: int = 0
    regex_removed: int = 0
    lines_emptied: int = 0

    @property
    def total(self) -> int:
        return self.exact_removed + self.regex_removed


class HallucinationRemover:
    def __init__(self, language: str = "ja",
                 extra_phrases: Optional[Iterable[str]] = None):
        self.language = language
        phrases = list(JA_HALLUCINATION_PHRASES if language in
                       ("ja", "ko", "zh") else EN_HALLUCINATION_PHRASES)
        if extra_phrases:
            phrases.extend(extra_phrases)
        self._normalized = {normalize_text(p) for p in phrases if p.strip()}
        self._rules = JA_REGEX_RULES if language in ("ja", "ko", "zh") else [
            (re.compile(r"[♪♩♫♬]+"), ""),
            (re.compile(r"(?:www\.|https?://)\S+"), ""),
        ]

    def add_phrases(self, phrases: Iterable[str]) -> None:
        self._normalized |= {normalize_text(p) for p in phrases if p.strip()}

    def is_hallucination(self, text: str, fuzzy_threshold: float = 0.9) -> bool:
        """Blacklist hit: exact normalized match, or fuzzy (edit-ratio ≥
        threshold) for lines long enough that near-misses are meaningful
        (reference keeps a fuzzy matcher alongside the exact DB,
        hallucination_remover.py:81)."""
        norm = normalize_text(text)
        if norm in self._normalized:
            return True
        if len(norm) >= 8:
            import difflib
            for phrase in self._normalized:
                if abs(len(phrase) - len(norm)) <= 3 and difflib.SequenceMatcher(
                        None, norm, phrase).ratio() >= fuzzy_threshold:
                    return True
        return False

    def clean(self, text: str) -> Tuple[str, HallucinationStats]:
        stats = HallucinationStats()
        if not text:
            return text, stats
        if self.is_hallucination(text):
            stats.exact_removed += 1
            stats.lines_emptied += 1
            return "", stats
        out = text
        for pat, repl in self._rules:
            new = pat.sub(repl, out)
            if new != out:
                stats.regex_removed += 1
                out = new
        # per-line blacklist check on multiline cues
        if "\n" in out:
            kept = []
            for ln in out.split("\n"):
                if ln.strip() and self.is_hallucination(ln):
                    stats.exact_removed += 1
                else:
                    kept.append(ln)
            out = "\n".join(kept)
        if text.strip() and not out.strip():
            stats.lines_emptied += 1
        return out.strip(), stats
