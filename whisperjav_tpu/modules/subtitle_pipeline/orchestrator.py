"""DecoupledSubtitlePipeline: frame → generate → clean → align →
sentinel → reconstruct → harden, with step-down retry.

Flow parity with the reference's 9-step orchestrator (reference:
whisperjav/modules/subtitle_pipeline/orchestrator.py:61-717 per ADR-006,
step-down retry at :162-221). TPU-era differences: no temp-WAV slicing
(clips stay in memory as arrays) and no generator↔aligner VRAM swap
(both programs stay resident; load()/unload() are API hooks).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from whisperjav_tpu.modules.srt import Subtitle
from whisperjav_tpu.modules.subtitle_pipeline.hardening import harden_words
from whisperjav_tpu.modules.subtitle_pipeline.reconstruction import (
    RegroupConfig, regroup_words,
)
from whisperjav_tpu.modules.subtitle_pipeline.sentinel import (
    assess_alignment_quality, redistribute_collapsed_words,
)
from whisperjav_tpu.modules.subtitle_pipeline.types import (
    AlignmentResult, FramingResult, HardeningConfig, RegroupMode,
    SceneDiagnostics, StepDownConfig, TemporalFrame, TranscriptionResult,
    WordTimestamp,
)
from whisperjav_tpu.utils.logger import logger


@dataclass
class SceneOutput:
    scene_index: int
    subtitles: List[Subtitle]
    diagnostics: SceneDiagnostics


class DecoupledSubtitlePipeline:
    def __init__(
        self,
        framer,
        generator,
        cleaner,
        aligner,
        max_group_s: float = 6.0,
        step_down: Optional[StepDownConfig] = None,
        hardening: Optional[HardeningConfig] = None,
        regroup_mode: RegroupMode = RegroupMode.STANDARD,
        regroup_config: Optional[RegroupConfig] = None,
    ):
        self.framer = framer
        self.generator = generator
        self.cleaner = cleaner
        self.aligner = aligner
        self.max_group_s = max_group_s
        # fresh default instances per pipeline (no shared mutable defaults)
        self.step_down = step_down or StepDownConfig()
        self.hardening = hardening or HardeningConfig()
        self.regroup_mode = regroup_mode
        self.regroup_config = regroup_config or RegroupConfig()

    # ------------------------------------------------------------------
    def process_scenes(
        self,
        scene_audios: Sequence[np.ndarray],
        sample_rate: int,
    ) -> List[SceneOutput]:
        """Run the full decoupled flow per scene."""
        self.generator.load()
        self.aligner.load()
        outputs = []
        try:
            for si, audio in enumerate(scene_audios):
                outputs.append(self._process_scene(si, audio, sample_rate))
        finally:
            self.generator.unload()
            self.aligner.unload()
        return outputs

    # ------------------------------------------------------------------
    def _process_scene(self, scene_index: int, audio: np.ndarray,
                       sample_rate: int) -> SceneOutput:
        t0 = time.time()
        diag = SceneDiagnostics(scene_index=scene_index)

        words, framing = self._run_once(audio, sample_rate,
                                        self.max_group_s, diag)

        # step-down retry: any collapsed frame (or an empty scene) re-runs
        # at tighter framing; the retry result wins when it collapses less
        # (reference behavior: re-frame at fallback_max_group_s and retry)
        if (self.step_down.enabled
                and (diag.collapsed_frames > 0 or not words)):
            for _ in range(self.step_down.max_retries):
                diag.step_down_retries += 1
                logger.info("scene %d: step-down retry at %.1fs groups "
                            "(%d collapsed frames)", scene_index,
                            self.step_down.fallback_max_group_s,
                            diag.collapsed_frames)
                retry_diag = SceneDiagnostics(scene_index=scene_index)
                retry_words, retry_framing = self._run_once(
                    audio, sample_rate,
                    self.step_down.fallback_max_group_s, retry_diag)
                better = (retry_words and (not words
                          or retry_diag.collapsed_frames
                          < diag.collapsed_frames))
                if better:
                    words, framing = retry_words, retry_framing
                    retry_diag.step_down_retries = diag.step_down_retries
                    retry_diag.hardening_actions = diag.hardening_actions
                    diag = retry_diag
                    if diag.collapsed_frames == 0:
                        break
                else:
                    break

        scene_duration = len(audio) / sample_rate
        hardened, actions = harden_words(words, scene_duration,
                                         self.hardening,
                                         framing.speech_regions)
        diag.hardening_actions += actions
        subs = regroup_words(hardened, self.regroup_mode,
                             self.regroup_config)
        diag.elapsed_s = round(time.time() - t0, 3)
        return SceneOutput(scene_index, subs, diag)

    # ------------------------------------------------------------------
    def _run_once(self, audio: np.ndarray, sample_rate: int,
                  max_group_s: float, diag: SceneDiagnostics,
                  ) -> Tuple[List[WordTimestamp], FramingResult]:
        def _lap(key, since):
            now = time.time()
            diag.stage_s[key] = round(
                diag.stage_s.get(key, 0.0) + (now - since), 3)
            return now

        # step 1: frame
        t = time.time()
        framing = self.framer.frame(audio, sample_rate, max_group_s)
        t = _lap("frame", t)
        diag.frames = len(framing.frames)
        if not framing.frames:
            return [], framing

        # step 2: slice frames (in-memory)
        clips = []
        for f in framing.frames:
            a = int(f.start * sample_rate)
            b = int(f.end * sample_rate)
            clips.append(np.ascontiguousarray(audio[a:b], np.float32))

        # steps 3-4: generate + clean
        gen = self.generator.generate_batch(clips, sample_rate)
        t = _lap("generate", t)
        cleaned = self.cleaner.clean_batch(gen)
        t = _lap("clean", t)
        diag.generated_chars = sum(len(r.text) for r in cleaned)

        # steps 5-7: align
        texts = [r.text for r in cleaned]
        aligned = self.aligner.align_batch(clips, sample_rate, texts)
        t = _lap("align", t)

        # step 8: sentinel + merge frame words to scene-relative time
        all_words: List[WordTimestamp] = []
        for frame, ar in zip(framing.frames, aligned):
            diag.aligned_words += len(ar.words)
            diag.null_timestamp_words += sum(
                1 for w in ar.words if w.start is None or w.end is None)
            quality = assess_alignment_quality(ar.words, frame.duration)
            words = ar.words
            if quality.collapsed:
                diag.collapsed_frames += 1
                words = redistribute_collapsed_words(
                    words, frame.duration, frame.speech_regions)
            for w in words:
                all_words.append(WordTimestamp(
                    w.word,
                    None if w.start is None else w.start + frame.start,
                    None if w.end is None else w.end + frame.start,
                    w.prob))
        _lap("assemble", t)
        return all_words, framing
