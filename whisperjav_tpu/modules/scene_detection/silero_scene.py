"""Silero-based scene detection: energy chapters + VAD-refined chunks.

Behavioral counterpart of the reference's Silero scene backend
(reference: whisperjav/modules/scene_detection_backends/silero_backend.py
:51-188 — subclasses the auditok detector, replacing pass 2 with Silero
VAD regions). Here pass 1 reuses the energy chapter split and pass 2
packs silero-jax VAD regions into ≤ max_scene_duration scenes.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from whisperjav_tpu.modules.scene_detection.base import (
    Scene, SceneDetectionResult,
)
from whisperjav_tpu.modules.scene_detection.energy import (
    EnergySceneConfig, EnergySceneDetector,
)


@dataclass
class SileroSceneConfig(EnergySceneConfig):
    vad_threshold: float = 0.28
    vad_weights: Optional[str] = None


class SileroSceneDetector(EnergySceneDetector):
    name = "silero-scene"

    def __init__(self, **kwargs):
        self.config = SileroSceneConfig(**kwargs)
        from whisperjav_tpu.modules.segmentation.silero_jax import (
            SileroJaxSegmenter,
        )
        self._vad = SileroJaxSegmenter(
            threshold=self.config.vad_threshold,
            weights=self.config.vad_weights,
            max_group_duration_s=self.config.max_scene_duration_s,
            max_group_gap_s=self.config.chunk_max_silence_s * 4,
        )

    def detect(self, audio: np.ndarray, sample_rate: int) -> SceneDetectionResult:
        cfg = self.config
        total = len(audio) / sample_rate
        # pass 1: energy chapters (inherited semantics)
        base = super().detect(audio, sample_rate)
        chapters = base.stats.get("chapters", 0)

        # pass 2 replacement: silero VAD groups inside long chapters
        scenes: List[Scene] = []
        for sc in base.scenes:
            if sc.duration <= cfg.max_scene_duration_s:
                scenes.append(Scene(len(scenes), sc.start, sc.end))
                continue
            a = int(sc.start * sample_rate)
            b = int(sc.end * sample_rate)
            seg = self._vad.segment(audio[a:b], sample_rate)
            if not seg.groups:
                scenes.append(Scene(len(scenes), sc.start, sc.end))
                continue
            for g in seg.groups:
                scenes.append(Scene(len(scenes), sc.start + g.start,
                                    sc.start + g.end))
        for i, sc in enumerate(scenes):
            sc.index = i
        return SceneDetectionResult(
            scenes, total, self.name,
            {"chapters": chapters, "scenes": len(scenes),
             "vad_refined": True})
