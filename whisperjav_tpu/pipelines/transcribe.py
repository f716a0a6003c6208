"""The unified transcription pipeline: media → scenes → VAD → batched
decode → stitch → sanitize → SRT.

This one pipeline covers the roles of the reference's faster/fast/
balanced/fidelity pipelines (reference: whisperjav/pipelines/
balanced_pipeline.py:270-637 and siblings): the mode presets differ only
in model size, VAD backend, and sensitivity thresholds (see
whisperjav_tpu.config.presets), not in code path — the TPU engine always
runs the same fixed-shape batched program.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from whisperjav_tpu.modules.audio_io import WHISPER_SAMPLE_RATE
from whisperjav_tpu.modules.audio_extraction import AudioExtractor
from whisperjav_tpu.modules.media_discovery import MediaInfo
from whisperjav_tpu.modules.scene_detection import create_scene_detector
from whisperjav_tpu.modules.segmentation import create_segmenter
from whisperjav_tpu.modules.segmentation.energy_vad import vad_failover_check
from whisperjav_tpu.modules.srt import Subtitle, save_srt, stitch
from whisperjav_tpu.parallel.batching import Window, windows_from_segmentation
from whisperjav_tpu.pipelines.engine import TranscriptionEngine
from whisperjav_tpu.utils.logger import logger


@dataclass
class PipelineResult:
    media: MediaInfo
    srt_path: Optional[Path]
    subtitles: List[Subtitle]
    metadata: Dict = field(default_factory=dict)


class TranscribePipeline:
    """Host orchestration around a TranscriptionEngine."""

    def __init__(
        self,
        engine: TranscriptionEngine,
        scene_backend: str = "energy",
        vad_backend: str = "energy",
        scene_kwargs: Optional[Dict] = None,
        vad_kwargs: Optional[Dict] = None,
        language: str = "ja",
        enhancer_backend: Optional[str] = None,
        enhancer_kwargs: Optional[Dict] = None,
        postprocessor=None,          # SRTPostProcessor-compatible, optional
        tracer=None,                 # ParameterTracer-compatible, optional
        output_format: str = "srt",  # "srt" | "vtt" | "both"
        pack: bool = True,           # pack short groups into shared windows
        chunked: bool = False,       # overlapped fixed chunking, no VAD
        chunk_s: float = 30.0,
        chunk_overlap_s: float = 5.0,
        enhance_for_vad: bool = False,   # enhanced track drives VAD only
        keep_intermediates: bool = False,  # write raw pre-sanitize SRT
    ):
        self.engine = engine
        self.scene_detector = create_scene_detector(scene_backend,
                                                    **(scene_kwargs or {}))
        self.vad_backend = vad_backend
        self.vad_kwargs = vad_kwargs or {}
        self.language = language
        from whisperjav_tpu.modules.enhancement import (
            create_enhancer, is_passthrough_backend,
        )
        self.enhancer = (None if is_passthrough_backend(enhancer_backend)
                         else create_enhancer(enhancer_backend,
                                              **(enhancer_kwargs or {})))
        self.postprocessor = postprocessor
        self.tracer = tracer
        self.output_format = output_format
        self.pack = pack
        self.chunked = chunked
        self.chunk_s = chunk_s
        self.chunk_overlap_s = chunk_overlap_s
        self.enhance_for_vad = enhance_for_vad
        self.keep_intermediates = keep_intermediates

    # ------------------------------------------------------------------
    def collect_windows(self, audio: np.ndarray,
                        sample_rate: int) -> Tuple[List[Window], Dict]:
        """Scene detection + per-scene VAD → flat window list."""
        if self.chunked:
            from whisperjav_tpu.parallel.batching import chunked_windows
            windows = chunked_windows(audio, sample_rate,
                                      chunk_s=self.chunk_s,
                                      overlap_s=self.chunk_overlap_s)
            return windows, {"scene_backend": "chunked",
                             "windows": len(windows), "scenes": 0,
                             "groups": len(windows), "failovers": 0,
                             "groups_packed": len(windows)}
        t0 = time.time()
        scene_result = self.scene_detector.detect(audio, sample_rate)
        stage_s = {"scene": time.time() - t0, "enhance": 0.0, "vad": 0.0}
        segmenter = create_segmenter(self.vad_backend, **self.vad_kwargs)
        windows: List[Window] = []
        vad_stats = {"scenes": len(scene_result.scenes), "groups": 0,
                     "failovers": 0}
        enhanced_ok = 0
        for scene in scene_result.scenes:
            a = int(scene.start * sample_rate)
            b = int(scene.end * sample_rate)
            scene_audio = audio[a:b]
            vad_audio = scene_audio
            if self.enhancer is not None:
                from whisperjav_tpu.modules.enhancement import enhance_scenes
                t0 = time.time()
                res = enhance_scenes(self.enhancer, [scene_audio],
                                     sample_rate)[0]
                stage_s["enhance"] += time.time() - t0
                if res.success and self.enhance_for_vad:
                    # dual-track (reference: --enhance-for-vad,
                    # main.py:1056-1057 + orchestrator vad_audio_paths):
                    # the enhanced track drives segmentation only; ASR
                    # decodes the untouched original samples
                    n = min(len(res.audio), b - a)
                    vad_audio = np.concatenate(
                        [res.audio[:n], scene_audio[n:]])
                    enhanced_ok += 1
                elif res.success:
                    scene_audio = res.audio
                    audio = audio.copy() if enhanced_ok == 0 else audio
                    # enhancers may not preserve length exactly; patch the
                    # overlapping prefix only so offsets stay consistent
                    n = min(len(scene_audio), b - a)
                    audio[a:a + n] = scene_audio[:n]
                    scene_audio = audio[a:b]
                    vad_audio = scene_audio
                    enhanced_ok += 1
            t0 = time.time()
            seg = segmenter.segment(vad_audio, sample_rate)
            stage_s["vad"] += time.time() - t0
            if vad_failover_check(seg):
                # implausibly low coverage → full-clip transcription
                # (reference: modules/vad_failover.py)
                from whisperjav_tpu.modules.segmentation.energy_vad import (
                    NullSegmenter,
                )
                seg = NullSegmenter().segment(scene_audio, sample_rate)
                vad_stats["failovers"] += 1
            windows.extend(windows_from_segmentation(audio, scene, seg,
                                                     sample_rate))
            vad_stats["groups"] += len(seg.groups)
        raw_windows = len(windows)
        if self.pack and len(windows) > 1:
            from whisperjav_tpu.parallel.batching import pack_windows
            windows = pack_windows(windows, sample_rate)
        stats = {"scene_backend": scene_result.backend,
                 "scene_stats": scene_result.stats, **vad_stats,
                 "enhanced_scenes": enhanced_ok,
                 "groups_packed": raw_windows,
                 "windows": len(windows),
                 "stage_s": {k: round(v, 3) for k, v in stage_s.items()}}
        return windows, stats

    # ------------------------------------------------------------------
    def process_audio(self, audio: np.ndarray,
                      sample_rate: int = WHISPER_SAMPLE_RATE,
                      seed: int = 0) -> Tuple[List[Subtitle], Dict]:
        """Transcribe in-memory audio → globally-timed subtitles."""
        t0 = time.time()
        windows, stats = self.collect_windows(audio, sample_rate)
        t_seg = time.time() - t0
        if self.tracer:
            self.tracer.event("segmentation", stats)

        t0 = time.time()
        results = self.engine.transcribe_windows(windows, seed=seed)
        t_asr = time.time() - t0

        subtitles = self.assemble_subtitles(results)
        trace = getattr(self.engine, "batch_trace", None)
        if trace:
            # WJAV_TRACE_BATCHES=1: persist the per-batch phase walls so
            # file-level runs (tools/e2e_bench) can attribute the ASR
            # wall without scraping log lines
            stats["batch_trace"] = [
                {k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in t.items()} for t in trace]
        stats.update({
            "segmentation_s": round(t_seg, 3),
            "asr_s": round(t_asr, 3),
            "audio_s": round(len(audio) / sample_rate, 3),
            "rtf_x": round((len(audio) / sample_rate) / max(t_asr, 1e-9), 2),
            "raw_subtitles": len(subtitles),
        })
        return subtitles, stats

    # ------------------------------------------------------------------
    def assemble_subtitles(self, results) -> List[Subtitle]:
        """Engine results → globally-timed subtitles.

        The SINGLE place that unpacks packed windows, reconciles chunked
        keep-ranges, hardens timestamps (drop segments starting past the
        real audio, clamp ends — reference: subtitle_pipeline/
        hardening.py:45), records per-window diagnostics, and stitches.
        Both the sync and async file paths call this."""
        from whisperjav_tpu.parallel.batching import unpack_segments
        flat_results = []
        for window, segments in results:
            flat_results.extend(unpack_segments(window, segments))

        scene_subs = []
        window_diag = []
        for window, segments in flat_results:
            if window.keep_range is not None:
                lo, hi = window.keep_range
                segments = [s for s in segments
                            if lo <= (s.start + s.end) / 2.0 < hi]
            subs = [Subtitle(0, s.start, min(s.end, window.duration), s.text)
                    for s in segments
                    if s.text.strip() and s.start < window.duration]
            scene_subs.append((subs, window.abs_start))
            window_diag.append({
                "scene": window.scene_idx, "group": window.group_idx,
                "start": round(window.abs_start, 3),
                "duration": round(window.duration, 3),
                "segments": len(segments),
                "avg_logprob": round(segments[0].avg_logprob, 4)
                if segments else None,
                "no_speech_prob": round(segments[0].no_speech_prob, 4)
                if segments else None,
                "chars": sum(len(s.text) for s in segments),
            })
        self._last_window_diagnostics = window_diag
        return stitch(scene_subs)

    # ------------------------------------------------------------------
    def process(self, media: MediaInfo, output_dir: Path,
                seed: int = 0) -> PipelineResult:
        """Full file pipeline, reference-compatible output naming
        ``{basename}.{lang}.whisperjav.srt``."""
        wall_t0 = time.time()
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        logger.info("processing %s", media.path.name)

        extractor = AudioExtractor(WHISPER_SAMPLE_RATE)
        t_extract = time.time()
        audio, duration = extractor.extract(media.path)
        t_extract = time.time() - t_extract
        if self.tracer:
            self.tracer.event("file_start", {"file": str(media.path),
                                             "duration": duration})

        subtitles, stats = self.process_audio(audio, WHISPER_SAMPLE_RATE,
                                              seed=seed)

        if self.keep_intermediates:
            # pre-sanitize snapshot (the role of the reference's kept
            # temp raw_subs under --keep-temp, main.py:292,1411)
            raw_path = output_dir / (f"{media.basename}.{self.language}"
                                     ".whisperjav.raw.srt")
            save_srt(raw_path, subtitles)

        sanitize_stats = {}
        t_sanitize = time.time()
        if self.postprocessor is not None:
            subtitles, sanitize_stats = self.postprocessor.process(
                subtitles, language=self.language)
        t_sanitize = time.time() - t_sanitize
        # per-stage wall breakdown for end-to-end RTF attribution
        # (reference baseline is whole-pipeline per-file: README.md:561-566)
        stage = stats.setdefault("stage_s", {})
        stage["extract"] = round(t_extract, 3)
        stage["sanitize"] = round(t_sanitize, 3)
        stage["asr"] = stats.get("asr_s", 0.0)
        wall = time.time() - wall_t0
        stats["e2e_wall_s"] = round(wall, 3)
        stats["e2e_rtf_x"] = round(duration / max(wall, 1e-9), 2)
        artifacts = sanitize_stats.pop("artifacts", []) \
            if isinstance(sanitize_stats, dict) else []
        stats["final_subtitles"] = len(subtitles)
        stats["sanitization"] = sanitize_stats

        srt_path = output_dir / f"{media.basename}.{self.language}.whisperjav.srt"
        save_srt(srt_path, subtitles)
        if artifacts:
            # removed-cue record next to the output (reference:
            # subtitle_sanitizer.py artifacts SRT + summary subtitle)
            from whisperjav_tpu.modules.sanitize.sanitizer import (
                write_artifacts_srt,
            )
            art_path = output_dir / (f"{media.basename}.{self.language}"
                                     ".whisperjav.artifacts.srt")
            write_artifacts_srt(art_path, artifacts, sanitize_stats)
            stats["artifacts_removed"] = len(artifacts)

        metadata = {
            "input": str(media.path),
            "duration_s": duration,
            "output": str(srt_path),
            "stats": stats,
        }
        meta_path = output_dir / f"{media.basename}.whisperjav.json"
        meta_path.write_text(json.dumps(metadata, indent=2, default=str),
                             encoding="utf-8")
        # per-window decode diagnostic, role of the reference's
        # `.transcribe.json` (faster_whisper_pro_asr.py:1034-1071)
        diag = getattr(self, "_last_window_diagnostics", None)
        if diag is not None:
            (output_dir / f"{media.basename}.transcribe.json").write_text(
                json.dumps({"windows": diag}, indent=1, default=str),
                encoding="utf-8")
        if self.tracer:
            self.tracer.event("file_complete", stats)
        logger.info("wrote %s (%d subtitles, RTF %sx)", srt_path.name,
                    len(subtitles), stats.get("rtf_x"))
        return PipelineResult(media, srt_path, subtitles, metadata)
