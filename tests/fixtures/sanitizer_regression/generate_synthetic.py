"""Synthetic adversarial SRT generator for sanitizer regression testing.

Mirrors the reference's strongest test idea (reference:
tests/fixtures/sanitizer_regression/ACCEPTANCE.md:112 — a synthetic SRT
generator + captured golden baseline + diff tool that flags behavior
drift in the text sanitization chain).

The generator is DETERMINISTIC (seeded) and covers the adversarial
classes the sanitizer must handle: hallucination watermarks, repetition
storms, CPS violations, duplicate runs, timing anomalies, empty cues,
mixed normal dialogue.
"""

from __future__ import annotations

import random
from typing import List

from whisperjav_tpu.modules.srt import Subtitle

NORMAL_LINES = [
    "今日はいい天気ですね", "そんなこと言わないで", "ちょっと待ってください",
    "どこに行くの？", "本当にありがとう", "それは違うと思う",
    "もう一度お願いします", "大丈夫、心配しないで", "先に行ってて",
    "話を聞いてほしい",
]

HALLUCINATIONS = [
    "ご視聴ありがとうございました", "チャンネル登録をお願いします",
    "最後までご視聴いただきありがとうございます",
    "字幕は視聴者によって作成されました",
    # deep filter_list_v08 entries (exercise the full bundled DB)
    "チャンネル登録してね", "おやすみなさい", "ありがとうございました",
    # punct/whitespace variants → punct-stripped + fully-normalized stages
    "ご視聴ありがとう ございました。", "チャンネル登録お願いします,",
    # regexp_v09 full-line categories
    "チャンネル登録お願いいたします",
    # bracketed SDH captions → bracket-context drop
    "（音楽）", "【拍手】", "(笑い声)",
    # emoji-contains drop gate
    "♪〜", "こんばんは🎵みなさん",
    # latin-only line in a JA transcript → nonsensical category
    "thanks for watching everyone",
]

REPETITION_TEMPLATES = [
    "あ" * 12, "はいはいはいはいはいはい", "だめ" * 7,
    "そこそこそこそこそこ", "んんんんんんんん", "。。。。。。",
]


def generate(seed: int = 1234, n: int = 60) -> List[Subtitle]:
    rng = random.Random(seed)
    subs: List[Subtitle] = []
    t = 0.0
    for i in range(n):
        roll = rng.random()
        if roll < 0.5:
            text = rng.choice(NORMAL_LINES)
            dur = rng.uniform(1.0, 4.0)
        elif roll < 0.65:
            text = rng.choice(HALLUCINATIONS)
            dur = rng.uniform(1.5, 3.0)
        elif roll < 0.8:
            text = rng.choice(REPETITION_TEMPLATES)
            dur = rng.uniform(0.8, 2.5)
        elif roll < 0.87:
            text = ""                                    # empty cue
            dur = rng.uniform(0.5, 1.0)
        elif roll < 0.93:
            text = rng.choice(NORMAL_LINES) * 3          # CPS violation
            dur = rng.uniform(0.2, 0.6)
        else:
            text = rng.choice(NORMAL_LINES)
            dur = rng.uniform(14.0, 25.0)                # overlong cue
        start = t + rng.uniform(0.0, 0.5)
        subs.append(Subtitle(i + 1, round(start, 3),
                             round(start + dur, 3), text))
        # occasional duplicate immediately after
        if roll < 0.5 and rng.random() < 0.15:
            s2 = start + dur + rng.uniform(0.05, 0.4)
            subs.append(Subtitle(0, round(s2, 3),
                                 round(s2 + dur * 0.8, 3), text))
            t = s2 + dur * 0.8
        else:
            t = start + dur
        # occasional overlap / out-of-order anomaly
        if rng.random() < 0.08:
            t -= rng.uniform(0.3, 1.0)
    for idx, s in enumerate(subs, start=1):
        s.index = idx
    return subs
