"""Multi-phase CJK subtitle sanitizer.

Behavioral counterpart of the reference's SubtitleSanitizer
(reference: whisperjav/modules/subtitle_sanitizer.py:235-1094 — phases:
purge empty → content cleaning (hallucination + repetition) → sequential
dedup → CPS limiter → timing adjustment → renumber, with an artifacts
record of removals and a statistics dict).

Operates on the in-memory Subtitle list (no file round-trips) and returns
both the cleaned list and a stats/artifacts bundle.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from whisperjav_tpu.modules.sanitize.hallucinations import HallucinationRemover
from whisperjav_tpu.modules.sanitize.repetition import RepetitionCleaner
from whisperjav_tpu.modules.srt import Subtitle


@dataclass
class SanitizerConfig:
    # CPS (characters/second) limits for CJK subtitles
    max_cps: float = 25.0
    min_duration_s: float = 0.3
    max_duration_s: float = 12.0   # longer = hallucination suspect
    # sequential dedup: identical text within this gap merges
    dedup_gap_s: float = 1.0
    # drop lines that are mostly repetition noise
    repetition_density: float = 0.75


@dataclass
class SanitizerReport:
    empty_removed: int = 0
    hallucinations_removed: int = 0
    repetitions_cleaned: int = 0
    duplicates_merged: int = 0
    cross_removed: int = 0
    cross_merged: int = 0
    cps_violations_removed: int = 0
    timing_adjusted: int = 0
    artifacts: List[Dict] = field(default_factory=list)  # removed cues
    # cross-subtitle high-density phrase analysis (diagnostics)
    high_density_phrases: List[Dict] = field(default_factory=list)

    def to_dict(self) -> Dict:
        return {
            "empty_removed": self.empty_removed,
            "hallucinations_removed": self.hallucinations_removed,
            "repetitions_cleaned": self.repetitions_cleaned,
            "duplicates_merged": self.duplicates_merged,
            "cross_removed": self.cross_removed,
            "cross_merged": self.cross_merged,
            "cps_violations_removed": self.cps_violations_removed,
            "timing_adjusted": self.timing_adjusted,
            "high_density_phrases": self.high_density_phrases,
            "total_removed": (self.empty_removed
                              + self.hallucinations_removed
                              + self.cps_violations_removed
                              + self.cross_removed
                              + self.duplicates_merged),
        }


class SubtitleSanitizer:
    def __init__(self, language: str = "ja",
                 config: Optional[SanitizerConfig] = None):
        self.language = language
        self.config = config or SanitizerConfig()
        self.hallucinations = HallucinationRemover(language)
        self.repetitions = RepetitionCleaner()

    # ------------------------------------------------------------------
    def process(self, subs: Sequence[Subtitle]) -> Tuple[List[Subtitle],
                                                         SanitizerReport]:
        report = SanitizerReport()
        out = [Subtitle(s.index, s.start, s.end, s.text) for s in subs]

        out = self._purge_empty(out, report)
        out = self._clean_content(out, report)
        out = self._dedup_sequential(out, report)
        out = self._cross_subtitle(out, report)
        out = self._limit_cps(out, report)
        out = self._adjust_timing(out, report)
        for i, s in enumerate(out, start=1):
            s.index = i
        return out, report

    # ------------------------------------------------------------------
    def _purge_empty(self, subs, report):
        kept = []
        for s in subs:
            if s.text.strip():
                kept.append(s)
            else:
                report.empty_removed += 1
        return kept

    def _clean_content(self, subs, report):
        kept = []
        for s in subs:
            text, h_stats = self.hallucinations.clean(s.text)
            if h_stats.total and not text:
                report.hallucinations_removed += 1
                report.artifacts.append({"reason": "hallucination",
                                         "start": s.start, "end": s.end,
                                         "text": s.text})
                continue
            if self.repetitions.is_mostly_repetition(
                    text, self.config.repetition_density):
                report.hallucinations_removed += 1
                report.artifacts.append({"reason": "repetition_noise",
                                         "start": s.start, "end": s.end,
                                         "text": s.text})
                continue
            text, r_stats = self.repetitions.clean(text)
            if r_stats.total:
                report.repetitions_cleaned += 1
            if not text.strip():
                report.empty_removed += 1
                continue
            kept.append(Subtitle(s.index, s.start, s.end, text))
        return kept

    def _dedup_sequential(self, subs, report):
        """Merge identical consecutive cues separated by a small gap
        (reference: subtitle_sanitizer.py:984 sequential-line dedup)."""
        out: List[Subtitle] = []
        for s in subs:
            if (out and s.text == out[-1].text
                    and s.start - out[-1].end <= self.config.dedup_gap_s):
                out[-1].end = max(out[-1].end, s.end)
                report.duplicates_merged += 1
            else:
                out.append(s)
        return out

    def _cross_subtitle(self, subs, report):
        """Inter-subtitle merge/dedup analysis between sequential dedup and
        the CPS pass (reference order: subtitle_sanitizer.py:867-1094 runs
        CrossSubtitleProcessor inside the content-cleaning chain)."""
        from whisperjav_tpu.modules.sanitize.cross_subtitle import (
            CrossSubtitleProcessor,
        )
        out, stats = CrossSubtitleProcessor().process(subs)
        report.cross_removed += stats["containment_removed"]
        report.cross_merged += (stats["continuations_merged"]
                                + stats["stutters_collapsed"])
        report.high_density_phrases = stats.get("high_density_phrases", [])
        return out

    def _limit_cps(self, subs, report):
        """Remove abnormally fast cues (chars/sec beyond human speech;
        reference: subtitle_sanitizer.py:1094)."""
        kept = []
        for s in subs:
            dur = max(s.duration, 1e-3)
            cps = len(s.text.replace("\n", "")) / dur
            if cps > self.config.max_cps and dur < 1.0:
                report.cps_violations_removed += 1
                report.artifacts.append({"reason": "cps", "start": s.start,
                                         "end": s.end, "cps": round(cps, 1),
                                         "text": s.text})
            else:
                kept.append(s)
        return kept

    def _adjust_timing(self, subs, report):
        """Enforce min/max durations and forward-monotonic, non-overlapping
        times (reference: modules/timing_adjuster.py — >12 s duration is a
        hallucination-suspect threshold)."""
        cfg = self.config
        out: List[Subtitle] = []
        for s in subs:
            start, end = s.start, s.end
            if end - start < cfg.min_duration_s:
                end = start + cfg.min_duration_s
                report.timing_adjusted += 1
            if end - start > cfg.max_duration_s:
                end = start + cfg.max_duration_s
                report.timing_adjusted += 1
            if out and start < out[-1].end:
                start = out[-1].end
                if end <= start:
                    end = start + cfg.min_duration_s
                report.timing_adjusted += 1
            out.append(Subtitle(s.index, start, end, s.text))
        return out


def write_artifacts_srt(path, artifacts: Sequence[Dict],
                        summary: Optional[Dict] = None) -> None:
    """Write removed cues as an artifacts SRT + a trailing summary cue.

    Mirrors the reference's artifacts SRT of removals and summary
    subtitle (subtitle_sanitizer.py:235,867,984,1094): each removed cue
    keeps its original timing with a ``[reason]`` prefix; a final cue
    carries the run's removal statistics so the file is self-describing
    when opened in a player.
    """
    from whisperjav_tpu.modules.srt import save_srt

    cues: List[Subtitle] = []
    last_end = 0.0
    for art in artifacts:
        start = float(art.get("start", 0.0))
        end = float(art.get("end", start + 1.5))
        if end <= start:
            end = start + 1.5
        text = f"[{art.get('reason', 'removed')}] {art.get('text', '')}"
        cues.append(Subtitle(0, start, end, text.strip()))
        last_end = max(last_end, end)
    if summary:
        parts = [f"{k}={v}" for k, v in summary.items()
                 if isinstance(v, (int, float)) and v]
        cues.append(Subtitle(0, last_end + 0.5, last_end + 3.0,
                             "[sanitizer summary] " + " ".join(parts)))
    for i, c in enumerate(cues, start=1):
        c.index = i
    save_srt(path, cues)
