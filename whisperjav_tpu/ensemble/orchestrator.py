"""Two-pass ensemble orchestrator — one process, two device programs.

Role parity with the reference's ensemble (reference:
whisperjav/ensemble/orchestrator.py:23-673 and pass_worker.py:593) WITHOUT
its crash-containment machinery: the reference spawned each pass in a
fresh subprocess with pickle-file "Drop-Box" IPC and os._exit because
CTranslate2's destructor could corrupt the parent. The JAX runtime has no
such failure mode, so both passes run sequentially in-process — each pass
is just a differently-configured compiled program — and pass-2 failure
degrades to pass-1 output with a 'degraded' status
(reference behavior: main.py:2292-2296).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence

from whisperjav_tpu.config.presets import PipelineConfig
from whisperjav_tpu.ensemble.merge import MergeEngine
from whisperjav_tpu.modules.media_discovery import MediaInfo
from whisperjav_tpu.modules.srt import Subtitle, save_srt
from whisperjav_tpu.utils.logger import logger


@dataclass
class EnsembleFileResult:
    media: MediaInfo
    status: str                  # ok | degraded | failed
    srt_path: Optional[Path] = None
    merge_stats: Optional[Dict] = None
    error: Optional[str] = None


def apply_ensemble_safety_caps(pass1: PipelineConfig,
                               pass2: PipelineConfig) -> List[str]:
    """Config-combination guards (reference: ensemble/safety_caps.py:1-60
    capped fidelity+aggressive pass-2 because of an empirically
    non-deterministic CTranslate2 failure). The deterministic XLA runtime
    does not exhibit that failure, so no combination is rewritten — the
    hook validates and reports instead, and stays the single place future
    empirical caps would land."""
    notes = []
    if (pass1.mode.name == pass2.mode.name
            and pass1.sensitivity.name == pass2.sensitivity.name):
        notes.append("pass1 and pass2 configs are identical; the merge "
                     "will be a no-op")
    return notes


class EnsembleOrchestrator:
    def __init__(
        self,
        pass1_cfg: PipelineConfig,
        pass2_cfg: PipelineConfig,
        merge_strategy: str = "smart_merge",
        checkpoint: Optional[str] = None,
        postprocessor=None,
        serial_mode: bool = False,
    ):
        for note in apply_ensemble_safety_caps(pass1_cfg, pass2_cfg):
            logger.warning("ensemble: %s", note)
        self.pass1_cfg = pass1_cfg
        self.pass2_cfg = pass2_cfg
        self.merge = MergeEngine(merge_strategy)
        self.checkpoint = checkpoint
        self.postprocessor = postprocessor
        self.serial_mode = serial_mode

    def _build(self, cfg: PipelineConfig):
        from whisperjav_tpu.pipelines.factory import build_pipeline
        return build_pipeline(cfg, checkpoint=self.checkpoint,
                              postprocessor=None)

    # ------------------------------------------------------------------
    def process_batch(self, media: Sequence[MediaInfo],
                      output_dir: Path) -> Dict:
        """Run pass1 over all files, then pass2, then merge per file.

        Batch-major order (all files through one compiled pipeline before
        switching configs) minimizes recompiles — the in-process analogue
        of the reference's per-pass subprocess batching. ``serial_mode``
        processes file-at-a-time instead (reference:
        ensemble/orchestrator.py:110-115).
        """
        t0 = time.time()

        if self.serial_mode:
            results = [self._process_one(m, output_dir) for m in media]
        else:
            results = self._process_batch_major(media, output_dir)

        # batch summary lands in the shared dir, or (source mode) next
        # to the first input file
        from whisperjav_tpu.modules.media_discovery import (
            is_source_sentinel, resolve_output_dir,
        )
        if media and is_source_sentinel(output_dir):
            summary_dir = resolve_output_dir(output_dir, media[0])
        else:
            summary_dir = Path(output_dir)
        summary_dir.mkdir(parents=True, exist_ok=True)

        summary = {
            "files": len(media),
            "ok": sum(1 for r in results if r.status == "ok"),
            "degraded": sum(1 for r in results if r.status == "degraded"),
            "failed": sum(1 for r in results if r.status == "failed"),
            "wall_s": round(time.time() - t0, 2),
            "results": [
                {"file": str(r.media.path), "status": r.status,
                 "output": str(r.srt_path) if r.srt_path else None,
                 "merge": r.merge_stats, "error": r.error}
                for r in results
            ],
        }
        (summary_dir / "ensemble_batch.json").write_text(
            json.dumps(summary, indent=2, default=str), encoding="utf-8")
        return summary

    # ------------------------------------------------------------------
    def _run_pass(self, pipeline, media: MediaInfo) -> List[Subtitle]:
        from whisperjav_tpu.modules.audio_io import WHISPER_SAMPLE_RATE
        from whisperjav_tpu.modules.audio_extraction import AudioExtractor
        audio, _ = AudioExtractor(WHISPER_SAMPLE_RATE).extract(media.path)
        subs, _ = pipeline.process_audio(audio, WHISPER_SAMPLE_RATE)
        return subs

    def _finalize(self, media: MediaInfo, output_dir: Path,
                  subs: List[Subtitle], status: str,
                  merge_stats: Optional[Dict],
                  language: str) -> EnsembleFileResult:
        if self.postprocessor is not None:
            subs, _ = self.postprocessor.process(subs, language=language)
        from whisperjav_tpu.modules.media_discovery import resolve_output_dir
        out = resolve_output_dir(output_dir, media)
        out.mkdir(parents=True, exist_ok=True)
        srt_path = out / f"{media.basename}.{language}.whisperjav.srt"
        save_srt(srt_path, subs)
        return EnsembleFileResult(media, status, srt_path, merge_stats)

    def _process_batch_major(self, media, output_dir):
        lang = self.pass1_cfg.language
        pass1_out: Dict[str, List[Subtitle]] = {}
        pass2_out: Dict[str, Optional[List[Subtitle]]] = {}
        errors: Dict[str, str] = {}

        p1 = self._build(self.pass1_cfg)
        for m in media:
            try:
                pass1_out[str(m.path)] = self._run_pass(p1, m)
            except Exception as e:  # noqa: BLE001
                errors[str(m.path)] = f"pass1: {e}"
                logger.error("ensemble pass1 failed on %s: %s",
                             m.path.name, e)
        del p1

        p2 = None
        try:
            p2 = self._build(self.pass2_cfg)
        except Exception as e:  # noqa: BLE001
            logger.error("ensemble pass2 build failed: %s", e)
        if p2 is not None:
            for m in media:
                if str(m.path) not in pass1_out:
                    continue
                try:
                    pass2_out[str(m.path)] = self._run_pass(p2, m)
                except Exception as e:  # noqa: BLE001
                    pass2_out[str(m.path)] = None
                    logger.error("ensemble pass2 failed on %s: %s",
                                 m.path.name, e)
            del p2

        results = []
        for m in media:
            key = str(m.path)
            if key not in pass1_out:
                results.append(EnsembleFileResult(m, "failed",
                                                  error=errors.get(key)))
                continue
            p2_subs = pass2_out.get(key)
            if p2_subs is None:
                results.append(self._finalize(m, output_dir, pass1_out[key],
                                              "degraded", None, lang))
                continue
            merged, stats = self.merge.merge(pass1_out[key], p2_subs)
            results.append(self._finalize(m, output_dir, merged, "ok",
                                          stats.to_dict(), lang))
        return results

    def _process_one(self, m: MediaInfo, output_dir: Path) -> EnsembleFileResult:
        lang = self.pass1_cfg.language
        try:
            p1_subs = self._run_pass(self._build(self.pass1_cfg), m)
        except Exception as e:  # noqa: BLE001
            return EnsembleFileResult(m, "failed", error=f"pass1: {e}")
        try:
            p2_subs = self._run_pass(self._build(self.pass2_cfg), m)
        except Exception as e:  # noqa: BLE001
            logger.error("ensemble pass2 failed on %s: %s", m.path.name, e)
            return self._finalize(m, output_dir, p1_subs, "degraded",
                                  None, lang)
        merged, stats = self.merge.merge(p1_subs, p2_subs)
        return self._finalize(m, output_dir, merged, "ok", stats.to_dict(),
                              lang)
