"""Japanese linguistic post-processing: subtitle regrouping.

Behavioral counterpart of the reference's JapanesePostProcessor
(reference: whisperjav/modules/japanese_postprocessor.py:33-228 — merge
isolated sentence-final particles (ね/よ/わ/の…) and tiny fragments into
neighbors, gap-aware merging, hierarchical splitting of overlong cues at
punctuation, with presets default/high_moan/narrative).

Operates on the Subtitle list; splitting distributes time proportionally
to character counts (no word timestamps needed).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

from whisperjav_tpu.modules.srt import Subtitle

# sentence-final particles & interjections that shouldn't stand alone
PARTICLES = ("ね", "よ", "わ", "の", "な", "さ", "ぞ", "ぜ", "か", "かな",
             "よね", "のよ", "わよ", "でしょ", "じゃん")
FRAGMENT_MAX_CHARS = 2
SPLIT_PUNCT = "。！？!?…"


@dataclass
class JapanesePostConfig:
    merge_gap_s: float = 0.4        # cues closer than this may merge
    max_merged_chars: int = 28
    max_cue_chars: int = 36         # split beyond this
    min_cue_duration_s: float = 0.4
    particle_merge: bool = True


PRESETS = {
    "default": JapanesePostConfig(),
    # moan-heavy content: tiny vocal fragments are frequent and meaningful —
    # merge less aggressively, allow shorter cues
    "high_moan": JapanesePostConfig(merge_gap_s=0.25, max_merged_chars=20,
                                    min_cue_duration_s=0.25,
                                    particle_merge=False),
    # narration: longer sentences, merge more, split later
    "narrative": JapanesePostConfig(merge_gap_s=0.6, max_merged_chars=36,
                                    max_cue_chars=42),
}


def _is_fragment(text: str) -> bool:
    t = text.strip()
    if not t:
        return False
    if t in PARTICLES:
        return True
    return len(t) <= FRAGMENT_MAX_CHARS and not any(c in SPLIT_PUNCT for c in t)


class JapanesePostProcessor:
    def __init__(self, preset: str = "default",
                 config: Optional[JapanesePostConfig] = None):
        self.config = config or PRESETS.get(preset, PRESETS["default"])

    # ------------------------------------------------------------------
    def process(self, subs: Sequence[Subtitle]) -> List[Subtitle]:
        out = [Subtitle(s.index, s.start, s.end, s.text) for s in subs]
        if self.config.particle_merge:
            out = self._merge_fragments(out)
        out = self._merge_close(out)
        out = self._split_long(out)
        for i, s in enumerate(out, start=1):
            s.index = i
        return out

    # ------------------------------------------------------------------
    def _merge_fragments(self, subs: List[Subtitle]) -> List[Subtitle]:
        """Glue particle/fragment cues onto the closer neighbor."""
        cfg = self.config
        out: List[Subtitle] = []
        i = 0
        while i < len(subs):
            s = subs[i]
            if _is_fragment(s.text):
                prev_gap = (s.start - out[-1].end) if out else float("inf")
                next_gap = (subs[i + 1].start - s.end
                            if i + 1 < len(subs) else float("inf"))
                if prev_gap <= min(next_gap, cfg.merge_gap_s) and out and \
                        len(out[-1].text) + len(s.text) <= cfg.max_merged_chars:
                    out[-1] = Subtitle(out[-1].index, out[-1].start, s.end,
                                       out[-1].text + s.text)
                    i += 1
                    continue
                if next_gap <= cfg.merge_gap_s and i + 1 < len(subs) and \
                        len(s.text) + len(subs[i + 1].text) <= cfg.max_merged_chars:
                    nxt = subs[i + 1]
                    subs[i + 1] = Subtitle(nxt.index, s.start, nxt.end,
                                           s.text + nxt.text)
                    i += 1
                    continue
            out.append(s)
            i += 1
        return out

    def _merge_close(self, subs: List[Subtitle]) -> List[Subtitle]:
        """Merge adjacent short cues separated by tiny gaps."""
        cfg = self.config
        out: List[Subtitle] = []
        for s in subs:
            if (out and s.start - out[-1].end <= cfg.merge_gap_s
                    and len(out[-1].text) + len(s.text) <= cfg.max_merged_chars
                    and not out[-1].text.endswith(tuple(SPLIT_PUNCT))):
                out[-1] = Subtitle(out[-1].index, out[-1].start, s.end,
                                   out[-1].text + s.text)
            else:
                out.append(s)
        return out

    def _split_long(self, subs: List[Subtitle]) -> List[Subtitle]:
        """Split overlong cues at punctuation, time ∝ characters."""
        cfg = self.config
        out: List[Subtitle] = []
        for s in subs:
            if len(s.text) <= cfg.max_cue_chars or "\n" in s.text:
                out.append(s)
                continue
            parts = self._split_text(s.text)
            if len(parts) == 1:
                out.append(s)
                continue
            total_chars = sum(len(p) for p in parts)
            t = s.start
            for p in parts:
                dur = max(s.duration * len(p) / total_chars,
                          cfg.min_cue_duration_s)
                end = min(t + dur, s.end)
                out.append(Subtitle(0, t, end, p))
                t = end
            out[-1].end = s.end
        return out

    @staticmethod
    def _split_text(text: str) -> List[str]:
        parts: List[str] = []
        cur = ""
        for ch in text:
            cur += ch
            if ch in SPLIT_PUNCT:
                parts.append(cur)
                cur = ""
        if cur:
            parts.append(cur)
        # avoid over-fragmenting: rejoin pieces that are tiny
        merged: List[str] = []
        for p in parts:
            if merged and len(p) <= 2:
                merged[-1] += p
            else:
                merged.append(p)
        return merged
