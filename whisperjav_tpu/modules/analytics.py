"""Post-run pipeline analytics: health report over outputs.

Role parity with reference ``whisperjav/modules/pipeline_analytics.py``
(reads per-scene diagnostics + final SRT → coverage/collapse/timing
metrics report, called at qwen_pipeline.py:1056).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from whisperjav_tpu.modules.srt import Subtitle


def compute_analytics(
    subtitles: Sequence[Subtitle],
    audio_duration_s: float,
    window_stats: Optional[Sequence[Dict]] = None,
) -> Dict:
    """Health metrics for one processed file."""
    subs = list(subtitles)
    if not subs:
        return {
            "subtitle_count": 0,
            "coverage_ratio": 0.0,
            "health": "empty",
            "issues": ["no subtitles produced"],
        }

    durations = np.asarray([s.duration for s in subs])
    gaps = np.asarray([b.start - a.end for a, b in zip(subs[:-1], subs[1:])]
                      ) if len(subs) > 1 else np.zeros(0)
    chars = np.asarray([len(s.text.replace("\n", "")) for s in subs])
    cps = chars / np.maximum(durations, 1e-3)
    covered = float(durations.sum())

    issues: List[str] = []
    out_of_order = int((gaps < -1e-6).sum())
    if out_of_order:
        issues.append(f"{out_of_order} out-of-order cue pairs")
    collapsed = int((durations < 0.15).sum())
    if collapsed:
        issues.append(f"{collapsed} near-zero-duration cues")
    too_fast = int((cps > 30).sum())
    if too_fast:
        issues.append(f"{too_fast} cues above 30 chars/sec")
    coverage = covered / max(audio_duration_s, 1e-6)
    if coverage < 0.05 and audio_duration_s > 60:
        issues.append(f"very low coverage ({coverage:.1%})")

    health = "ok" if not issues else (
        "warning" if len(issues) < 3 else "poor")
    report = {
        "subtitle_count": len(subs),
        "coverage_s": round(covered, 2),
        "coverage_ratio": round(coverage, 4),
        "mean_duration_s": round(float(durations.mean()), 3),
        "mean_gap_s": round(float(gaps.mean()), 3) if len(gaps) else 0.0,
        "mean_cps": round(float(cps.mean()), 2),
        "p95_cps": round(float(np.quantile(cps, 0.95)), 2),
        "health": health,
        "issues": issues,
    }
    if window_stats:
        empty = sum(1 for w in window_stats if not w.get("segments", 1))
        report["windows"] = len(window_stats)
        report["empty_windows"] = empty
    return report
