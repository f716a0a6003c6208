"""``whisperjav`` command-line interface.

Keeps the reference CLI's core surface (reference: whisperjav/main.py:
155-695 — --mode, --sensitivity, --subs-language, --model, batch inputs,
--output-dir, --stats-file, skip-existing resume, VTT conversion) on top
of the TPU pipeline. GPU-era flags that have no TPU meaning (compute
types, VRAM controls, subprocess workers) are intentionally absent.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import List, Optional


def parse_arguments(argv: Optional[List[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="whisperjav",
        description="TPU-native Japanese ASR → SRT subtitle pipeline",
    )
    p.add_argument("inputs", nargs="+",
                   help="media files, directories, or glob patterns")
    p.add_argument("--mode", default="balanced",
                   choices=["faster", "fast", "balanced", "fidelity",
                            "transformers", "qwen", "anime"],
                   help="pipeline mode preset")
    p.add_argument("--sensitivity", default="balanced",
                   choices=["conservative", "balanced", "aggressive"],
                   help="decoding/VAD sensitivity preset")
    p.add_argument("--model", default=None,
                   help="whisper size override (tiny/base/small/medium/"
                        "large-v2/large-v3/turbo)")
    p.add_argument("--checkpoint", default=None,
                   help="local HF checkpoint directory with model weights")
    p.add_argument("--language", "--lang", dest="language", default="ja")
    p.add_argument("--subs-language", default="japanese",
                   choices=["japanese", "english-direct"],
                   help="english-direct uses Whisper's translate task")
    p.add_argument("--output-dir", default="./output")
    p.add_argument("--temp-dir", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--vad-backend", default=None,
                   help="override VAD backend (energy/silero/whisperseg/none)")
    p.add_argument("--scene-backend", default=None,
                   help="override scene backend (energy/semantic/none)")
    p.add_argument("--enhancer", default=None,
                   help="speech enhancement backend "
                        "(none/dsp/zipenhancer/bs-roformer/clearvoice)")
    p.add_argument("--enhancer-weights", default=None,
                   help=".npz weights for the enhancement model")
    # fine-grained decode/VAD overrides (reference flag-surface parity)
    p.add_argument("--beam-size", type=int, default=None)
    p.add_argument("--no-timestamps", action="store_true",
                   help="decode without timestamp tokens")
    p.add_argument("--prompt", default=None,
                   help="initial prompt text conditioning the decoder")
    p.add_argument("--logprob-threshold", type=float, default=None)
    p.add_argument("--no-speech-threshold", type=float, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--vad-threshold", type=float, default=None)
    p.add_argument("--vad-arg", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="per-backend VAD parameter (repeatable), e.g. "
                        "--vad-arg min_silence_duration_ms=200")
    p.add_argument("--scene-arg", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="per-backend scene-detection parameter (repeatable)")
    p.add_argument("--enhancer-arg", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="per-backend enhancement parameter (repeatable)")
    p.add_argument("--max-group-duration", type=float, default=None,
                   help="max seconds of speech per decode window")
    p.add_argument("--no-pack", action="store_true",
                   help="disable packing multiple groups per decode window")
    p.add_argument("--int8-weights", action="store_true",
                   help="int8-quantize decoder weights (CTranslate2-style "
                        "int8 compute; slightly faster, near-lossless)")
    p.add_argument("--word-timestamps", action="store_true",
                   help="refine cue boundaries via cross-attention word "
                        "alignment (one extra forward pass per batch)")
    p.add_argument("--no-sanitize", action="store_true",
                   help="skip subtitle sanitization")
    # decoupled (qwen) stack knobs — reference main.py decoupled group
    p.add_argument("--timestamp-mode", default=None,
                   choices=["aligner_interpolation", "aligner_vad_fallback",
                            "aligner_only", "vad_only"],
                   help="how null/collapsed timestamps are resolved "
                        "(qwen/decoupled modes)")
    p.add_argument("--regroup-mode", default=None,
                   choices=["standard", "sentence_only", "off"],
                   help="reconstruction regroup flavor (qwen/decoupled)")
    p.add_argument("--no-step-down", action="store_true",
                   help="disable the collapsed-scene step-down retry")
    p.add_argument("--step-down-max-group", type=float, default=None,
                   help="tighter max group seconds for step-down retries")
    p.add_argument("--framer", default=None,
                   choices=["vad-grouped", "full-scene"],
                   help="temporal framer for the decoupled stack")
    p.add_argument("--ensemble", action="store_true",
                   help="two-pass ensemble mode")
    p.add_argument("--pass1-mode", default=None,
                   help="ensemble pass-1 mode (default: --mode)")
    p.add_argument("--pass1-sensitivity", default=None)
    p.add_argument("--pass2-mode", default=None,
                   help="ensemble pass-2 mode (default: --mode)")
    p.add_argument("--pass2-sensitivity", default="aggressive")
    p.add_argument("--merge-strategy", default="smart_merge",
                   choices=["pass1_primary", "pass2_primary",
                            "pass1_overlap", "pass2_overlap",
                            "smart_merge", "full_merge", "longest"])
    p.add_argument("--ensemble-serial", action="store_true",
                   help="process files one at a time through both passes")
    p.add_argument("--translate", default=None, metavar="PROVIDER",
                   help="translate output SRTs after transcription "
                        "(identity/deepseek/gpt/claude/gemini/ollama/…)")
    p.add_argument("--translate-model", default=None)
    p.add_argument("--translate-target", default="English")
    p.add_argument("--devices", type=int, default=None,
                   help="number of accelerator chips to shard window "
                        "batches over (default: all visible; 1 = "
                        "single-chip)")
    p.add_argument("--async-processing", action="store_true",
                   help="overlap host preprocessing with device decode")
    p.add_argument("--skip-existing", action="store_true",
                   help="skip files whose output SRT already exists")
    p.add_argument("--make-vtt", action="store_true",
                   help="also write a WebVTT copy")
    p.add_argument("--stats-file", default=None,
                   help="write batch statistics JSON here")
    p.add_argument("--trace-params", default=None,
                   help="stream parameter-trace JSONL to this path")
    p.add_argument("--recursive", action="store_true")
    p.add_argument("--verbosity", default="info",
                   choices=["quiet", "normal", "info", "verbose", "debug"])
    p.add_argument("--log-file", default=None)
    p.add_argument("--check", action="store_true",
                   help="run environment preflight checks and exit")
    p.add_argument("--dump-params", action="store_true",
                   help="print the resolved runtime config and exit")
    p.add_argument("--version", action="version",
                   version=_version_string())
    return p.parse_args(argv)


def _version_string() -> str:
    from whisperjav_tpu.version import __version__
    return f"whisperjav-tpu {__version__}"


def _parse_kv_args(pairs: List[str], flag: str) -> dict:
    """KEY=VALUE list → dict with int/float/bool coercion (the role of the
    reference factory's per-backend param schemas + type-coercion gate,
    speech_segmentation/factory.py:90-160)."""
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"{flag} expects KEY=VALUE, got {pair!r}")
        key, value = pair.split("=", 1)
        v: object = value
        low = value.lower()
        if low in ("true", "false"):
            v = low == "true"
        else:
            try:
                v = int(value)
            except ValueError:
                try:
                    v = float(value)
                except ValueError:
                    pass
        out[key.strip().replace("-", "_")] = v
    return out


def main(argv: Optional[List[str]] = None) -> int:
    args = parse_arguments(argv)

    from whisperjav_tpu.utils.logger import setup_logger
    logger = setup_logger(args.verbosity,
                          Path(args.log_file) if args.log_file else None)

    if args.check:
        from whisperjav_tpu.utils.preflight import run_preflight_checks
        ok = run_preflight_checks(verbose=True)
        return 0 if ok else 1

    from whisperjav_tpu.config.presets import resolve_pipeline_config
    task = "translate" if args.subs_language == "english-direct" else "transcribe"
    enhancer_kwargs = ({"weights": args.enhancer_weights}
                       if args.enhancer_weights else None)
    # one override set for BOTH the single-pipeline path and each ensemble
    # pass, so CLI flags are never silently dropped in ensemble runs
    vad_kwargs = _parse_kv_args(args.vad_arg, "--vad-arg") or None
    scene_kwargs = _parse_kv_args(args.scene_arg, "--scene-arg") or None
    extra_enh = _parse_kv_args(args.enhancer_arg, "--enhancer-arg")
    if extra_enh:
        enhancer_kwargs = {**(enhancer_kwargs or {}), **extra_enh}
    overrides = dict(
        language=args.language, task=task, model=args.model,
        batch_size=args.batch_size,
        vad_backend=args.vad_backend, scene_backend=args.scene_backend,
        vad_kwargs=vad_kwargs, scene_kwargs=scene_kwargs,
        enhancer_backend=args.enhancer, enhancer_kwargs=enhancer_kwargs,
        beam_size=args.beam_size,
        logprob_threshold=args.logprob_threshold,
        no_speech_threshold=args.no_speech_threshold,
        repetition_penalty=args.repetition_penalty,
        vad_threshold=args.vad_threshold,
        max_group_duration_s=args.max_group_duration,
        initial_prompt=args.prompt,
        no_timestamps=args.no_timestamps,
        pack_windows=not args.no_pack,
        word_timestamps=args.word_timestamps,
        int8_weights=args.int8_weights,
    )
    cfg = resolve_pipeline_config(
        mode=args.mode, sensitivity=args.sensitivity, **overrides)

    if args.dump_params:
        from dataclasses import asdict
        print(json.dumps({
            "mode": asdict(cfg.mode), "sensitivity": asdict(cfg.sensitivity),
            "language": cfg.language, "task": cfg.task, "model": cfg.model,
            "batch_size": cfg.batch_size,
        }, indent=2))
        return 0

    from whisperjav_tpu.modules.media_discovery import discover
    media = discover(args.inputs, recursive=args.recursive)
    if not media:
        logger.error("no media files found in inputs: %s", args.inputs)
        return 1
    logger.info("discovered %d media file(s)", len(media))

    output_dir = Path(args.output_dir)
    out_lang = "ja" if task == "transcribe" else "en"

    if args.skip_existing:
        remaining = []
        for m in media:
            srt = output_dir / f"{m.basename}.{out_lang}.whisperjav.srt"
            if srt.exists():
                logger.info("skip existing: %s", srt.name)
            else:
                remaining.append(m)
        media = remaining
        if not media:
            logger.info("nothing to do")
            return 0

    tracer = None
    if args.trace_params:
        from whisperjav_tpu.utils.tracer import ParameterTracer
        tracer = ParameterTracer(Path(args.trace_params))
        tracer.event("config", {"mode": cfg.mode.name,
                                "sensitivity": cfg.sensitivity.name,
                                "model": cfg.model})

    postprocessor = None
    if not args.no_sanitize:
        from whisperjav_tpu.modules.sanitize import SRTPostProcessor
        postprocessor = SRTPostProcessor()

    if args.ensemble:
        from whisperjav_tpu.ensemble.orchestrator import EnsembleOrchestrator
        # both passes receive the full CLI override set (beam/thresholds/
        # prompt/enhancer/pack/scene+vad kwargs); mode/sensitivity differ
        cfg1 = resolve_pipeline_config(
            mode=args.pass1_mode or args.mode,
            sensitivity=args.pass1_sensitivity or args.sensitivity,
            **overrides)
        cfg2 = resolve_pipeline_config(
            mode=args.pass2_mode or args.mode,
            sensitivity=args.pass2_sensitivity,
            **overrides)
        orch = EnsembleOrchestrator(cfg1, cfg2,
                                    merge_strategy=args.merge_strategy,
                                    checkpoint=args.checkpoint,
                                    postprocessor=postprocessor,
                                    serial_mode=args.ensemble_serial)
        summary = orch.process_batch(media, output_dir)
        if args.stats_file:
            Path(args.stats_file).write_text(
                json.dumps(summary, indent=2, default=str), encoding="utf-8")
        logger.info("ensemble done: %d ok, %d degraded, %d failed",
                    summary["ok"], summary["degraded"], summary["failed"])
        return 0 if summary["failed"] == 0 else 2

    if cfg.mode.name == "qwen":
        from whisperjav_tpu.modules.subtitle_pipeline.components import (
            AssemblyTextCleaner, FullSceneFramer, QwenAlignerAdapter,
            QwenGenerator, VadGroupedFramer,
        )
        from whisperjav_tpu.modules.subtitle_pipeline.orchestrator import (
            DecoupledSubtitlePipeline,
        )
        from whisperjav_tpu.modules.subtitle_pipeline.types import (
            HardeningConfig, RegroupMode, StepDownConfig, TimestampMode,
        )
        from whisperjav_tpu.pipelines.qwen import QwenPipeline
        model_size = (cfg.model if cfg.model.startswith("qwen")
                      else "qwen3-asr-1.7b")
        framer = (FullSceneFramer() if args.framer == "full-scene"
                  else VadGroupedFramer(vad_backend=cfg.mode.vad_backend))
        step_down = StepDownConfig(enabled=not args.no_step_down)
        if args.step_down_max_group is not None:
            step_down = StepDownConfig(
                enabled=step_down.enabled,
                fallback_max_group_s=args.step_down_max_group)
        hardening = None
        if args.timestamp_mode:
            hardening = HardeningConfig(
                timestamp_mode=TimestampMode(args.timestamp_mode))
        decoupled = DecoupledSubtitlePipeline(
            framer=framer,
            generator=QwenGenerator(model_size=model_size,
                                    batch_size=cfg.batch_size,
                                    checkpoint=args.checkpoint),
            cleaner=AssemblyTextCleaner(),
            aligner=QwenAlignerAdapter(),
            max_group_s=cfg.sensitivity.max_group_duration_s,
            step_down=step_down,
            hardening=hardening,
            regroup_mode=(RegroupMode(args.regroup_mode)
                          if args.regroup_mode else RegroupMode.STANDARD),
        )
        pipeline = QwenPipeline(decoupled,
                                scene_backend=cfg.mode.scene_backend,
                                enhancer_backend=cfg.enhancer_backend,
                                language=cfg.language)
    else:
        from whisperjav_tpu.pipelines.factory import build_pipeline
        pipeline = build_pipeline(cfg, checkpoint=args.checkpoint,
                                  postprocessor=postprocessor, tracer=tracer,
                                  devices=args.devices)

    if args.async_processing and cfg.mode.name != "qwen":
        from whisperjav_tpu.utils.async_processor import AsyncPipelineManager
        t_start = time.time()
        outcomes = AsyncPipelineManager(pipeline).process_files(
            media, output_dir)
        failures = sum(1 for o in outcomes if not o.ok)
        summary = {
            "files": len(media), "failures": failures,
            "wall_s": round(time.time() - t_start, 2),
            "results": [{"file": str(o.media.path), "ok": o.ok,
                         "output": str(o.result) if o.ok else None,
                         "error": o.error} for o in outcomes],
        }
        if args.stats_file:
            Path(args.stats_file).write_text(
                json.dumps(summary, indent=2, default=str), encoding="utf-8")
        logger.info("done (async): %d file(s), %d failure(s), %.1fs",
                    len(media), failures, summary["wall_s"])
        return 0 if failures == 0 else 2

    batch_stats = []
    failures = 0
    t_start = time.time()
    for m in media:
        try:
            result = pipeline.process(m, output_dir)
            if args.make_vtt and result.srt_path:
                from whisperjav_tpu.modules.srt import srt_to_vtt
                srt_to_vtt(result.srt_path)
            if args.translate and result.srt_path:
                from whisperjav_tpu.translate.service import translate_srt
                translate_srt(result.srt_path, provider=args.translate,
                              model=args.translate_model,
                              target_language=args.translate_target)
            batch_stats.append(result.metadata)
        except Exception as e:  # keep the batch going, reference behavior
            logger.error("failed on %s: %s", m.path.name, e, exc_info=True)
            failures += 1

    summary = {
        "files": len(media),
        "failures": failures,
        "wall_s": round(time.time() - t_start, 2),
        "results": batch_stats,
    }
    if args.stats_file:
        Path(args.stats_file).write_text(
            json.dumps(summary, indent=2, default=str), encoding="utf-8")
    logger.info("done: %d file(s), %d failure(s), %.1fs",
                len(media), failures, summary["wall_s"])
    return 0 if failures == 0 else 2


if __name__ == "__main__":
    sys.exit(main())
