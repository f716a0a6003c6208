"""Reconstruction: regroup timestamped words into subtitle segments.

Parity with the reference's stable-ts regroup algebra (reference:
whisperjav/modules/subtitle_pipeline/reconstruction.py:62-104 —
REGROUP_JAV splits on gaps and punctuation then merges shorts;
REGROUP_VAD_ONLY skips gap heuristics) re-implemented as direct rules
over the WordTimestamp list (no stable-ts dependency).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

from whisperjav_tpu.modules.srt import Subtitle
from whisperjav_tpu.modules.subtitle_pipeline.types import (
    RegroupMode, WordTimestamp,
)

SENTENCE_END = "。！？!?…"
CLAUSE_END = "、,"


@dataclass
class RegroupConfig:
    gap_split_s: float = 0.8          # silence that forces a new cue
    max_cue_duration_s: float = 8.0
    max_cue_chars: int = 36
    min_cue_chars: int = 2
    merge_gap_s: float = 0.3          # merge shorts separated by less


def regroup_words(
    words: Sequence[WordTimestamp],
    mode: RegroupMode = RegroupMode.STANDARD,
    config: RegroupConfig = RegroupConfig(),
) -> List[Subtitle]:
    """Words → cues. STANDARD: split on gaps + sentence punctuation +
    size caps, then merge tiny cues. SENTENCE_ONLY: punctuation only.
    OFF: one cue per contiguous word run."""
    ws = [w for w in words
          if w.start is not None and w.end is not None and w.word]
    if not ws:
        return []

    groups: List[List[WordTimestamp]] = [[ws[0]]]
    for prev, w in zip(ws[:-1], ws[1:]):
        split = False
        cur = groups[-1]
        text_len = sum(len(x.word) for x in cur)
        dur = w.end - cur[0].start
        if mode != RegroupMode.OFF:
            if prev.word and prev.word[-1] in SENTENCE_END:
                split = True
        if mode == RegroupMode.STANDARD:
            if w.start - prev.end >= config.gap_split_s:
                split = True
            if text_len + len(w.word) > config.max_cue_chars:
                split = True
            if dur > config.max_cue_duration_s:
                split = True
        if split:
            groups.append([w])
        else:
            cur.append(w)

    cues = [Subtitle(0, g[0].start, g[-1].end,
                     "".join(x.word for x in g)) for g in groups]

    if mode == RegroupMode.STANDARD:
        cues = _merge_tiny(cues, config)
    for i, c in enumerate(cues, start=1):
        c.index = i
    return cues


def _merge_tiny(cues: List[Subtitle], config: RegroupConfig) -> List[Subtitle]:
    out: List[Subtitle] = []
    for c in cues:
        if (out and len(c.text) <= config.min_cue_chars
                and c.start - out[-1].end <= config.merge_gap_s
                and len(out[-1].text) + len(c.text) <= config.max_cue_chars
                and not out[-1].text.endswith(tuple(SENTENCE_END))):
            out[-1] = Subtitle(0, out[-1].start, c.end, out[-1].text + c.text)
        else:
            out.append(c)
    return out
