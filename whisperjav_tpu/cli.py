"""``whisperjav`` command-line interface.

Keeps the reference CLI's surface (reference: whisperjav/main.py:155-695 —
--mode, --sensitivity, --subs-language, --model, batch inputs,
--output-dir, --stats-file, skip-existing resume, signatures, VTT
conversion, per-pass ensemble overrides, the --hf-*/--qwen-* groups) on
top of the TPU pipeline. GPU-era flags that have no TPU meaning (compute
types, VRAM controls, subprocess workers, crash tracing) are intentionally
absent; reference aliases (--speech-segmenter, --initial-prompt,
--log-level, …) map onto the same destinations as the native flags.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Dict, List, Optional


def parse_arguments(argv: Optional[List[str]] = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="whisperjav",
        description="TPU-native Japanese ASR → SRT subtitle pipeline",
    )
    p.add_argument("inputs", nargs="+",
                   help="media files, directories, or glob patterns")
    p.add_argument("--config", default=None, metavar="JSON",
                   help="JSON file of flag defaults (flag names with "
                        "dashes or underscores); explicit CLI flags win "
                        "(reference: main.py:172)")
    p.add_argument("--asr", default=None,
                   choices=["faster_whisper", "openai_whisper", "stable_ts",
                            "kotoba_faster_whisper", "transformers",
                            "qwen3", "qwen"],
                   help="ASR component spelling (reference ensemble-mode "
                        "resolver, main.py:178) — maps onto --mode")
    p.add_argument("--features", default=None,
                   help="comma-separated feature names (reference: "
                        "main.py:182), e.g. auditok_scene_detection")
    p.add_argument("--pipeline-config", default=None, metavar="FILE",
                   help="YAML/JSON file of decoupled-pipeline defaults "
                        "(reference: main.py:653); CLI flags win")
    p.add_argument("--mode", "--pipeline", dest="mode", default="balanced",
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
    p.add_argument("--task", default=None,
                   choices=["transcribe", "translate"],
                   help="explicit task override (wins over --subs-language)")
    # "source" (the reference's default, main.py:286) saves each SRT
    # next to its own input file; anything else is a literal directory
    p.add_argument("--output-dir", default="source")
    p.add_argument("--temp-dir", default=None)
    p.add_argument("--keep-temp", action="store_true",
                   help="keep intermediate artifacts (raw pre-sanitize SRT)")
    p.add_argument("--output-format", default=None,
                   choices=["srt", "vtt", "both"],
                   help="vtt converts and removes the SRT; both keeps it")
    p.add_argument("--batch-size", type=int, default=None,
                   help="decode windows per device batch "
                        "(default: the mode's measured per-"
                        "chip optimum, 32 — ADR-002 B-sweep)")
    p.add_argument("--vad-backend", "--speech-segmenter", "--vad",
                   dest="vad_backend", default=None,
                   help="override VAD backend (energy/silero/whisperseg/"
                        "ten/whisper-vad/none)")
    p.add_argument("--no-vad", action="store_true",
                   help="disable VAD (full-group decode)")
    p.add_argument("--scene-backend", "--scene-detection-method",
                   dest="scene_backend", default=None,
                   help="override scene backend (energy/semantic/silero/none)")
    p.add_argument("--enhancer", "--speech-enhancer", dest="enhancer",
                   default=None,
                   help="speech enhancement backend "
                        "(none/dsp/zipenhancer/bs-roformer/clearvoice)")
    p.add_argument("--enhancer-weights", default=None,
                   help=".npz weights for the enhancement model")
    p.add_argument("--enhance-for-vad", action="store_true",
                   help="enhanced audio drives VAD only; ASR decodes the "
                        "original track")
    # fine-grained decode/VAD overrides (reference flag-surface parity)
    p.add_argument("--beam-size", type=int, default=None)
    p.add_argument("--no-timestamps", action="store_true",
                   help="decode without timestamp tokens")
    p.add_argument("--prompt", "--initial-prompt", dest="prompt",
                   default=None,
                   help="initial prompt text conditioning the decoder")
    p.add_argument("--condition-on-previous-text", default=None,
                   choices=["true", "false"],
                   help="carry decoded text across windows; the TPU engine "
                        "decodes windows as one independent batch, so only "
                        "'false' (the reference presets' JAV default) is "
                        "supported — 'true' warns and is ignored")
    p.add_argument("--logprob-threshold", type=float, default=None)
    p.add_argument("--no-speech-threshold", type=float, default=None)
    p.add_argument("--repetition-penalty", type=float, default=None)
    p.add_argument("--vad-threshold", type=float, default=None)
    p.add_argument("--speech-pad-ms", type=float, default=None,
                   help="context padding added around speech segments")
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
    p.add_argument("--overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="dot-notation config override (repeatable), e.g. "
                        "--overrides sensitivity.beam_size=3")
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
    p.add_argument("--vocab-slice", default=None, metavar="ja|N",
                   help="decode against a language-plausible lm-head "
                        "slice ('ja' derives it from the checkpoint "
                        "tokenizer; an integer is a synthetic size). "
                        "Shrinks every (batch, vocab) logit rule ~3x; "
                        "restricts the emit set to the slice")
    p.add_argument("--no-sanitize", action="store_true",
                   help="skip subtitle sanitization")
    p.add_argument("--postprocess-preset", "--qwen-postprocess-preset",
                   dest="postprocess_preset", default="default",
                   choices=["default", "high_moan", "narrative"],
                   help="Japanese regrouping preset for the post chain")
    p.add_argument("--qwen-japanese-postprocess",
                   dest="qwen_japanese_postprocess", action="store_true",
                   help="deprecated parity flag: has no effect in qwen "
                        "mode (the assembly cleaner covers it) — matches "
                        "the reference's deprecation")
    p.add_argument("--no-qwen-japanese-postprocess",
                   dest="qwen_japanese_postprocess", action="store_false",
                   default=False)
    # signatures (reference: main.py:698-770 add_signatures_to_srt)
    p.add_argument("--credit", default=None,
                   help="producer credit cue inserted at the start of the SRT")
    p.add_argument("--no-signature", action="store_true",
                   help="skip the technical signature cue at the end")
    # transformers-mode (--hf-*) group (reference: main.py:478-517)
    hf = p.add_argument_group("transformers mode (--mode transformers)")
    hf.add_argument("--hf-model-id", default=None,
                    help="local checkpoint dir for the chunked HF-style "
                         "path (alias of --checkpoint in transformers mode)")
    hf.add_argument("--hf-batch-size", type=int, default=None)
    hf.add_argument("--hf-chunk-length", type=float, default=None,
                    help="chunk seconds for overlapped long-form decoding")
    hf.add_argument("--hf-stride", type=float, default=None,
                    help="overlap seconds between adjacent chunks")
    hf.add_argument("--hf-beam-size", type=int, default=None)
    hf.add_argument("--hf-temperature", type=float, default=None)
    hf.add_argument("--hf-language", default=None)
    hf.add_argument("--hf-scene", default=None,
                    help="scene backend for transformers mode")
    hf.add_argument("--hf-timestamps", default=None,
                    choices=["true", "false"],
                    help="emit timestamp tokens in transformers mode")
    # decoupled (qwen) stack knobs — reference main.py qwen group
    q = p.add_argument_group("qwen / decoupled mode (--mode qwen)")
    q.add_argument("--timestamp-mode", "--qwen-timestamp-mode",
                   dest="timestamp_mode", default=None,
                   choices=["aligner_interpolation", "aligner_vad_fallback",
                            "aligner_only", "vad_only"],
                   help="how null/collapsed timestamps are resolved")
    q.add_argument("--regroup-mode", "--qwen-regroup", dest="regroup_mode",
                   default=None,
                   choices=["standard", "sentence_only", "off"],
                   help="reconstruction regroup flavor")
    q.add_argument("--no-step-down", "--no-qwen-stepdown",
                   dest="no_step_down", action="store_true",
                   help="disable the collapsed-scene step-down retry")
    q.add_argument("--qwen-stepdown", dest="no_step_down",
                   action="store_false",
                   help="enable step-down (the default; parity spelling)")
    q.add_argument("--step-down-attempts", type=int, default=None,
                   help="step-down retry attempts (0 = disabled)")
    q.add_argument("--step-down-max-group", "--qwen-stepdown-fallback-group",
                   dest="step_down_max_group", type=float, default=None,
                   help="tighter max group seconds for step-down retries")
    q.add_argument("--qwen-stepdown-initial-group", type=float, default=None,
                   help="tier-1 group duration (seconds) before step-down")
    q.add_argument("--framer", "--qwen-framer", dest="framer", default=None,
                   choices=["vad-grouped", "full-scene", "srt-source"],
                   help="temporal framer for the decoupled stack")
    q.add_argument("--framer-srt-path", "--qwen-framer-srt-path",
                   dest="framer_srt_path", default=None,
                   help="existing SRT whose cue times frame the audio "
                        "(with --framer srt-source)")
    q.add_argument("--qwen-model-id", default=None,
                   help="qwen model size key (e.g. qwen3-asr-1.7b)")
    q.add_argument("--qwen-sensitivity", default=None,
                   choices=["conservative", "balanced", "aggressive"],
                   help="sensitivity override for qwen mode")
    q.add_argument("--qwen-batch-size", type=int, default=None)
    q.add_argument("--qwen-max-group-duration", type=float, default=None)
    q.add_argument("--qwen-scene", default=None,
                   help="scene backend for qwen mode (semantic default)")
    q.add_argument("--qwen-segmenter", default=None,
                   help="VAD backend for the vad-grouped framer")
    q.add_argument("--qwen-vad-threshold", type=float, default=None)
    q.add_argument("--qwen-repetition-penalty", type=float, default=None)
    q.add_argument("--qwen-enhancer", default=None,
                   help="enhancement backend for qwen mode")
    q.add_argument("--qwen-enhancer-model", default=None,
                   help=".npz weights for the qwen-mode enhancer")
    q.add_argument("--qwen-language", default=None,
                   help="language override for qwen mode (e.g. Japanese)")
    q.add_argument("--qwen-max-tokens", type=int, default=None,
                   help="hard cap on generated tokens per group")
    q.add_argument("--qwen-max-tokens-per-second", type=float, default=None,
                   help="dynamic token budget per audio second "
                        "(0 = disabled)")
    q.add_argument("--qwen-chunk-threshold", type=float, default=None,
                   help="silence gap (seconds) that closes a VAD group")
    q.add_argument("--qwen-vad-padding", type=int, default=None,
                   help="VAD speech padding in ms")
    q.add_argument("--qwen-input-mode", default="assembly",
                   choices=["assembly", "context_aware", "vad_slicing"],
                   help="'assembly' (default); the others are deprecated "
                        "reference aliases of it")
    q.add_argument("--qwen-safe-chunking", dest="qwen_safe_chunking",
                   action="store_true", default=True,
                   help="clamp scenes for the aligner's 180 s limit "
                        "(default on)")
    q.add_argument("--no-qwen-safe-chunking", dest="qwen_safe_chunking",
                   action="store_false",
                   help="allow arbitrarily long scenes")
    q.add_argument("--qwen-scene-min-duration", type=float, default=None,
                   help="minimum safe-chunked scene seconds (default 12)")
    q.add_argument("--qwen-scene-max-duration", type=float, default=None,
                   help="maximum safe-chunked scene seconds (default 48)")
    q.add_argument("--qwen-timestamps", default=None,
                   choices=["word", "none"],
                   help="'none' skips the forced aligner entirely")
    q.add_argument("--context", "--qwen-context", dest="context",
                   default=None,
                   help="context string biasing generation (speaker "
                        "names, domain terms)")
    q.add_argument("--context-file", "--qwen-context-file",
                   dest="context_file", default=None,
                   help="text file whose contents become --context")
    q.add_argument("--generator", "--qwen-generator", dest="generator",
                   default=None,
                   choices=["qwen3", "anime-whisper", "cohere"],
                   help="decoupled-stack generator backend (cohere = "
                        "experimental text-only LALM slot)")
    q.add_argument("--cleaner", default=None,
                   choices=["qwen3", "assembly", "passthrough"],
                   help="decoupled-stack text cleaner backend")
    q.add_argument("--qwen-assembly-cleaner", dest="qwen_assembly_cleaner",
                   action="store_true", default=True,
                   help="pre-alignment text cleaning (default on)")
    q.add_argument("--no-qwen-assembly-cleaner", dest="qwen_assembly_cleaner",
                   action="store_false")
    q.add_argument("--aligner", "--qwen-aligner", dest="aligner",
                   default=None,
                   help="decoupled-stack aligner backend (qwen3/none)")
    q.add_argument("--framer-config", default=None, metavar="JSON",
                   help="JSON kwargs for the framer backend")
    q.add_argument("--generator-config", default=None, metavar="JSON",
                   help="JSON kwargs for the generator backend")
    q.add_argument("--cleaner-config", default=None, metavar="JSON",
                   help="JSON kwargs for the cleaner backend")
    q.add_argument("--aligner-config", default=None, metavar="JSON",
                   help="JSON kwargs for the aligner backend")
    # ensemble
    e = p.add_argument_group("two-pass ensemble")
    e.add_argument("--ensemble", action="store_true",
                   help="two-pass ensemble mode")
    e.add_argument("--pass1-mode", "--pass1-pipeline", dest="pass1_mode",
                   default=None,
                   help="ensemble pass-1 mode (default: --mode)")
    e.add_argument("--pass1-sensitivity", default=None)
    e.add_argument("--pass1-model", default=None)
    e.add_argument("--pass1-vad-threshold", type=float, default=None)
    e.add_argument("--pass1-speech-segmenter", default=None)
    e.add_argument("--pass1-scene-detector", default=None)
    e.add_argument("--pass1-speech-enhancer", default=None)
    e.add_argument("--pass1-speech-pad-ms", type=float, default=None)
    e.add_argument("--pass1-enhance-for-vad", action="store_true")
    e.add_argument("--pass1-overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="dot-notation overrides for pass 1 only")
    e.add_argument("--pass1-params", default=None, metavar="JSON",
                   help="JSON dict of config fields for pass 1 (flat or "
                        "dot-notation keys)")
    e.add_argument("--pass1-hf-params", default=None, metavar="JSON",
                   help="JSON hf params for pass 1 when its pipeline is "
                        "transformers")
    e.add_argument("--pass1-qwen-params", default=None, metavar="JSON",
                   help="JSON qwen params for pass 1 when its pipeline "
                        "is qwen")
    e.add_argument("--pass2-mode", "--pass2-pipeline", dest="pass2_mode",
                   default=None,
                   help="ensemble pass-2 mode (default: --mode)")
    e.add_argument("--pass2-sensitivity", default="aggressive")
    e.add_argument("--pass2-model", default=None)
    e.add_argument("--pass2-vad-threshold", type=float, default=None)
    e.add_argument("--pass2-speech-segmenter", default=None)
    e.add_argument("--pass2-scene-detector", default=None)
    e.add_argument("--pass2-speech-enhancer", default=None)
    e.add_argument("--pass2-speech-pad-ms", type=float, default=None)
    e.add_argument("--pass2-enhance-for-vad", action="store_true")
    e.add_argument("--pass2-overrides", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="dot-notation overrides for pass 2 only")
    e.add_argument("--pass2-params", default=None, metavar="JSON",
                   help="JSON dict of config fields for pass 2")
    e.add_argument("--pass2-hf-params", default=None, metavar="JSON")
    e.add_argument("--pass2-qwen-params", default=None, metavar="JSON")
    e.add_argument("--merge-strategy", default="smart_merge",
                   choices=["pass1_primary", "pass2_primary",
                            "pass1_overlap", "pass2_overlap",
                            "smart_merge", "full_merge", "longest"])
    e.add_argument("--ensemble-serial", action="store_true",
                   help="process files one at a time through both passes")
    p.add_argument("--translate", "--translate-provider", dest="translate",
                   default=None, metavar="PROVIDER",
                   help="translate output SRTs after transcription "
                        "(identity/deepseek/gpt/claude/gemini/ollama/…)")
    p.add_argument("--translate-model", default=None)
    p.add_argument("--translate-target", default="English")
    p.add_argument("--translate-tone", default="standard",
                   choices=["standard", "pornify"],
                   help="translation instruction-set flavor")
    p.add_argument("--translate-title", default=None,
                   help="movie title for translation context")
    p.add_argument("--translate-plot", default=None,
                   help="plot summary for translation context")
    p.add_argument("--translate-actress", default=None,
                   help="performer name(s) for pronoun/name handling")
    p.add_argument("--translate-endpoint", "--ollama-url",
                   dest="translate_endpoint", default=None,
                   help="custom API/Ollama base URL for translation")
    p.add_argument("--translate-api-key", default=None,
                   help="API key for the translation provider (exported "
                        "to the provider's key env var for this run)")
    p.add_argument("--translate-quiet", action="store_true",
                   help="hide translation progress messages")
    p.add_argument("--ollama-max-tokens", type=int, default=None,
                   help="accepted for reference compatibility; the TPU "
                        "build derives output budgets from the model's "
                        "context window (translate/ollama_manager.py)")
    p.add_argument("--ollama-num-ctx", type=int, default=None,
                   help="override the Ollama context window used to "
                        "derive the translation batch size")
    p.add_argument("--stream", action="store_true",
                   help="accepted for reference compatibility; providers "
                        "here run batch requests")
    p.add_argument("--yes", "-y", action="store_true",
                   help="auto-confirm prompts (server starts); the TPU "
                        "CLI never blocks on confirmation anyway")
    p.add_argument("--devices", type=int, default=None,
                   help="number of accelerator chips to shard window "
                        "batches over (default: all visible; 1 = "
                        "single-chip)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host batch job: initialize jax.distributed "
                        "and take this process's slice of the file list "
                        "(see parallel/multihost.py)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="jax.distributed coordinator address")
    p.add_argument("--num-hosts", type=int, default=None)
    p.add_argument("--host-id", type=int, default=None)
    p.add_argument("--daemon", action="store_true",
                   help="route decoding through a resident whisperjav-serve "
                        "engine (autostarted when none is running): repeat "
                        "invocations skip the per-process first-batch "
                        "compile/load wall — the fast path for one-file-at-"
                        "a-time workflows and the GUI")
    p.add_argument("--daemon-port", type=int, default=8478,
                   help="port of the resident engine (--daemon)")
    p.add_argument("--daemon-stop", action="store_true",
                   help="stop the resident engine on --daemon-port and "
                        "exit (frees the chip for a different-config "
                        "daemon — two residents can exceed one chip's HBM)")
    p.add_argument("--daemon-replace", action="store_true",
                   help="with --daemon: if a resident engine with a "
                        "different config occupies the port, shut it "
                        "down and start a matching one instead of "
                        "falling back in-process")
    p.add_argument("--async-processing", action="store_true",
                   help="overlap host preprocessing with device decode")
    p.add_argument("--max-workers", type=int, default=2,
                   help="prefetch depth for --async-processing")
    p.add_argument("--skip-existing", action="store_true",
                   help="skip files whose output SRT already exists")
    p.add_argument("--make-vtt", action="store_true",
                   help="also write a WebVTT copy (alias of "
                        "--output-format both)")
    p.add_argument("--stats-file", default=None,
                   help="write batch statistics JSON here")
    p.add_argument("--trace-params", default=None,
                   help="stream parameter-trace JSONL to this path")
    p.add_argument("--recursive", action="store_true")
    p.add_argument("--verbosity", "--log-level", dest="verbosity",
                   default="info",
                   choices=["quiet", "normal", "info", "verbose", "debug"])
    p.add_argument("--debug", action="store_true",
                   help="shortcut for --verbosity debug")
    p.add_argument("--no-progress", action="store_true",
                   help="accepted for reference-CLI compatibility; the TPU "
                        "CLI logs progress lines rather than drawing bars")
    p.add_argument("--log-file", default=None)
    p.add_argument("--check", action="store_true",
                   help="run environment preflight checks and exit")
    p.add_argument("--check-verbose", action="store_true",
                   help="alias of --check (reference main.py:267)")
    # ── CUDA/torch-era hardware flags (reference main.py hardware
    # group): accepted so reference command lines run unchanged; the
    # TPU build selects device/dtype itself. --compute-type maps onto
    # the int8-weight path (CTranslate2 int8 ≙ quant.py int8).
    p.add_argument("--device", default=None,
                   help="accepted for reference compatibility (cuda/cpu); "
                        "device selection here is JAX_PLATFORMS")
    p.add_argument("--compute-type", default=None,
                   choices=["int8", "int8_float16", "int8_bfloat16",
                            "float16", "bfloat16", "float32", "auto"],
                   help="CTranslate2-style precision: int8* enables "
                        "--int8-weights, float* disables it")
    p.add_argument("--accept-cpu-mode", action="store_true",
                   help="proceed without an accelerator (CPU fallback is "
                        "automatic here; flag accepted for compatibility)")
    p.add_argument("--crash-trace", action="store_true",
                   help="enable faulthandler crash tracebacks "
                        "(reference: utils/crash_tracer.py role)")
    p.add_argument("--xxl-exe", default=None,
                   help="accepted for reference compatibility; BYOP XXL "
                        "external executables are n/a on TPU (PARITY #59)")
    for _flag in ("--hf-attn", "--hf-device", "--hf-dtype", "--qwen-attn",
                  "--qwen-device", "--qwen-dtype",
                  "--translate-gpu-layers"):
        p.add_argument(_flag, default=None,
                       help="accepted for reference compatibility; "
                            "torch/CUDA-specific, no TPU effect")
    p.add_argument("--dump-params", action="store_true",
                   help="print the resolved runtime config and exit")
    p.add_argument("--version", action="version",
                   version=_version_string())
    _apply_config_file_defaults(p, argv)
    return p.parse_args(argv)


def _apply_config_file_defaults(p: argparse.ArgumentParser,
                                argv: Optional[List[str]]) -> None:
    """Pre-scan for --config and install the JSON file's values as parser
    defaults, so explicit CLI flags always win (reference: main.py:172 —
    JSON configuration file)."""
    av = list(sys.argv[1:] if argv is None else argv)
    paths = []
    for flag in ("--pipeline-config", "--config"):   # --config wins
        for i, a in enumerate(av):
            if a == flag and i + 1 < len(av):
                paths.append((flag, av[i + 1]))
            elif a.startswith(flag + "="):
                paths.append((flag, a.split("=", 1)[1]))
    if not paths:
        return
    known = {a.dest for a in p._actions}
    defaults = {}
    for flag, path in paths:
        text = None
        try:
            text = Path(path).read_text(encoding="utf-8")
            loaded = json.loads(text)
        except json.JSONDecodeError:
            try:
                import yaml
                loaded = yaml.safe_load(text)
            except Exception as e:  # noqa: BLE001
                raise SystemExit(f"{flag} {path}: {e}")
        except OSError as e:
            raise SystemExit(f"{flag} {path}: {e}")
        if not isinstance(loaded, dict):
            raise SystemExit(f"{flag} {path}: expected a mapping")
        for key, value in loaded.items():
            dest = key.replace("-", "_").lstrip("_")
            if dest not in known:
                raise SystemExit(f"{flag} {path}: unknown option {key!r}")
            defaults[dest] = value
    p.set_defaults(**defaults)


def _version_string() -> str:
    from whisperjav_tpu.version import __version__
    return f"whisperjav-tpu {__version__}"


def _coerce(value: str) -> object:
    low = value.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(value)
    except ValueError:
        try:
            return float(value)
        except ValueError:
            return value


def _parse_kv_args(pairs: List[str], flag: str,
                   keep_dots: bool = False) -> dict:
    """KEY=VALUE list → dict with int/float/bool coercion (the role of the
    reference factory's per-backend param schemas + type-coercion gate,
    speech_segmentation/factory.py:90-160)."""
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"{flag} expects KEY=VALUE, got {pair!r}")
        key, value = pair.split("=", 1)
        key = key.strip()
        if not keep_dots:
            key = key.replace("-", "_")
        out[key] = _coerce(value)
    return out


def _json_flag(value: Optional[str], flag: str) -> Dict:
    """Parse a JSON-dict flag value (reference: main.py:2137 error path)."""
    if not value:
        return {}
    try:
        loaded = json.loads(value)
    except json.JSONDecodeError as e:
        raise SystemExit(f"invalid JSON in {flag}: {e}")
    if not isinstance(loaded, dict):
        raise SystemExit(f"{flag} expects a JSON object")
    return loaded


def _pass_overrides(args, n: int, base: Dict) -> Dict:
    """Per-pass ensemble overrides on top of the shared CLI override set
    (reference: main.py pass1/pass2 flag groups, :155-695)."""
    out = dict(base)
    get = lambda name: getattr(args, f"pass{n}_{name}")  # noqa: E731
    if get("model"):
        out["model"] = get("model")
    if get("vad_threshold") is not None:
        out["vad_threshold"] = get("vad_threshold")
    if get("speech_segmenter"):
        out["vad_backend"] = get("speech_segmenter")
    if get("scene_detector"):
        out["scene_backend"] = get("scene_detector")
    if get("speech_enhancer"):
        out["enhancer_backend"] = get("speech_enhancer")
    if get("enhance_for_vad"):
        out["enhance_for_vad"] = True
    if get("speech_pad_ms") is not None:
        pad_s = get("speech_pad_ms") / 1000.0
        out["vad_kwargs"] = {**(out.get("vad_kwargs") or {}),
                             "pad_start_s": pad_s, "pad_end_s": pad_s}
    return out


_ASR_TO_MODE = {
    # reference ensemble-resolver component names → mode presets
    # (main.py:178, pipelines registry)
    "faster_whisper": "faster",
    "kotoba_faster_whisper": "fast",
    "openai_whisper": "balanced",
    "stable_ts": "fidelity",
    "transformers": "transformers",
    "qwen3": "qwen",
    "qwen": "qwen",
}

_FEATURE_TO_SCENE = {
    "auditok_scene_detection": "energy",
    "silero_scene_detection": "silero",
    "semantic_scene_detection": "semantic",
}


def _translate_output(args, srt_path: Path) -> None:
    """Post-transcription translation with the full reference flag set
    (reference main.py translation_group): tone, movie context,
    endpoint/api-key overrides, Ollama context-window override, quiet
    mode."""
    import logging
    import os as _os

    from whisperjav_tpu.translate.providers import resolve_provider
    from whisperjav_tpu.translate.service import translate_srt
    from whisperjav_tpu.translate.settings import movie_context_block

    if args.translate_api_key:
        cfg = resolve_provider(args.translate,
                               base_url=args.translate_endpoint,
                               model=args.translate_model)
        if cfg.api_key_env:
            _os.environ[cfg.api_key_env] = args.translate_api_key
    max_batch = None
    if args.ollama_num_ctx:
        import dataclasses as _dc

        from whisperjav_tpu.translate.providers import max_batch_lines
        cfg = resolve_provider(args.translate,
                               base_url=args.translate_endpoint,
                               model=args.translate_model)
        max_batch = max_batch_lines(
            _dc.replace(cfg, context_window=args.ollama_num_ctx))
    ctx = movie_context_block({
        "movie_title": args.translate_title,
        "movie_plot": args.translate_plot,
        "actress": args.translate_actress,
    })
    wj_logger = logging.getLogger("whisperjav_tpu")
    prev_level = wj_logger.level
    if args.translate_quiet:
        wj_logger.setLevel(logging.WARNING)
    try:
        translate_srt(srt_path, provider=args.translate,
                      model=args.translate_model,
                      target_language=args.translate_target,
                      base_url=args.translate_endpoint,
                      tone=args.translate_tone,
                      max_batch_size=max_batch,
                      movie_context=ctx)
    finally:
        if args.translate_quiet:
            wj_logger.setLevel(prev_level)


def _qwen_deep_flags(args) -> List[str]:
    """Qwen stack-level knobs the resident engine's default decoupled
    stack (pipelines/qwen_factory.py) cannot receive. Any of them set
    makes a ``--daemon`` invocation fall back in-process; cfg-level
    overrides (scene/VAD/sensitivity fields) are separately caught by
    the full-config fingerprint hash (daemon_client.daemon_reproducible)."""
    checks = [
        ("--timestamp-mode", args.timestamp_mode is not None),
        ("--regroup-mode", args.regroup_mode is not None),
        ("--no-step-down", args.no_step_down),
        ("--step-down-attempts", args.step_down_attempts is not None),
        ("--step-down-max-group", args.step_down_max_group is not None),
        ("--qwen-stepdown-initial-group",
         args.qwen_stepdown_initial_group is not None),
        ("--framer", args.framer is not None),
        ("--framer-srt-path", args.framer_srt_path is not None),
        ("--framer-config", args.framer_config is not None),
        ("--generator", args.generator is not None),
        ("--generator-config", args.generator_config is not None),
        ("--cleaner", args.cleaner is not None),
        ("--cleaner-config", args.cleaner_config is not None),
        ("--aligner", args.aligner is not None),
        ("--aligner-config", args.aligner_config is not None),
        ("--context", args.context is not None),
        ("--context-file", args.context_file is not None),
        ("--qwen-repetition-penalty",
         args.qwen_repetition_penalty is not None),
        ("--qwen-max-tokens", args.qwen_max_tokens is not None),
        ("--qwen-max-tokens-per-second",
         args.qwen_max_tokens_per_second is not None),
        ("--qwen-chunk-threshold", args.qwen_chunk_threshold is not None),
        ("--qwen-vad-padding", args.qwen_vad_padding is not None),
        ("--qwen-timestamps", args.qwen_timestamps is not None),
        ("--no-qwen-safe-chunking", not args.qwen_safe_chunking),
        ("--qwen-scene-min-duration",
         args.qwen_scene_min_duration is not None),
        ("--qwen-scene-max-duration",
         args.qwen_scene_max_duration is not None),
        ("--no-qwen-assembly-cleaner", not args.qwen_assembly_cleaner),
    ]
    return [name for name, is_set in checks if is_set]


def _daemon_stop(port: int) -> int:
    """Stop the resident engine; rc 0 when the port ends up free."""
    from whisperjav_tpu.pipelines.daemon_client import _health, stop_daemon
    from whisperjav_tpu.utils.logger import logger
    if _health(port) is None:
        logger.warning("no resident engine on port %d", port)
        return 1
    if stop_daemon(port):
        logger.info("resident engine on port %d stopped", port)
        return 0
    logger.warning("resident engine on port %d did not stop (it may "
                   "predate the /shutdown endpoint — kill its pid)", port)
    return 1


def main(argv: Optional[List[str]] = None) -> int:
    from whisperjav_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
    )
    enable_persistent_compilation_cache()
    raw = list(argv) if argv is not None else sys.argv[1:]
    if "--daemon-stop" in raw:
        # management action: no inputs required, exits immediately
        mini = argparse.ArgumentParser(add_help=False)
        mini.add_argument("--daemon-port", type=int, default=8478)
        known, _ = mini.parse_known_args(raw)
        return _daemon_stop(known.daemon_port)
    args = parse_arguments(argv)
    if args.asr:
        args.mode = _ASR_TO_MODE[args.asr]
    if args.features:
        for feat in (f.strip() for f in args.features.split(",")):
            if not feat:
                continue
            if feat in _FEATURE_TO_SCENE:
                if not args.scene_backend:
                    args.scene_backend = _FEATURE_TO_SCENE[feat]
            else:
                print(f"warning: unknown feature {feat!r} ignored",
                      file=sys.stderr)
    if args.debug:
        args.verbosity = "debug"
    if args.make_vtt and args.output_format is None:
        args.output_format = "both"
    output_format = args.output_format or "srt"

    from whisperjav_tpu.utils.logger import setup_logger
    logger = setup_logger(args.verbosity,
                          Path(args.log_file) if args.log_file else None)

    if args.check or args.check_verbose:
        from whisperjav_tpu.utils.preflight import run_preflight_checks
        ok = run_preflight_checks(verbose=True)
        return 0 if ok else 1

    if args.crash_trace:
        import faulthandler
        faulthandler.enable()
        logger.info("crash tracing enabled (faulthandler)")
    if args.compute_type:
        # CTranslate2 precision spelling → int8 weight path (quant.py)
        args.int8_weights = args.compute_type.startswith("int8")
        logger.info("--compute-type %s → int8_weights=%s",
                    args.compute_type, args.int8_weights)
    if args.device and args.device.lower().startswith("cuda"):
        logger.warning("--device %s has no effect: this build targets "
                       "TPU via JAX (JAX_PLATFORMS selects the backend)",
                       args.device)
    _torch_era = [f for f in ("hf_attn", "hf_device", "hf_dtype",
                              "qwen_attn", "qwen_device", "qwen_dtype",
                              "translate_gpu_layers")
                  if getattr(args, f, None) is not None]
    if _torch_era or args.xxl_exe:
        logger.debug("torch/CUDA-era flags accepted without effect: %s",
                     ", ".join(_torch_era + (["xxl_exe"] if args.xxl_exe
                                             else [])))

    if args.condition_on_previous_text == "true":
        logger.warning(
            "--condition-on-previous-text true is not supported: the TPU "
            "engine decodes all windows as one independent batch (the "
            "reference's JAV presets also default this off to stop "
            "hallucination propagation); continuing without it")

    from whisperjav_tpu.config.presets import (
        apply_dot_overrides, resolve_pipeline_config,
    )
    task = args.task or (
        "translate" if args.subs_language == "english-direct" else "transcribe")
    enhancer_kwargs = ({"weights": args.enhancer_weights}
                       if args.enhancer_weights else None)
    # one override set for BOTH the single-pipeline path and each ensemble
    # pass, so CLI flags are never silently dropped in ensemble runs
    vad_kwargs = _parse_kv_args(args.vad_arg, "--vad-arg") or None
    if args.speech_pad_ms is not None:
        pad_s = args.speech_pad_ms / 1000.0
        vad_kwargs = {**(vad_kwargs or {}),
                      "pad_start_s": pad_s, "pad_end_s": pad_s}
    scene_kwargs = _parse_kv_args(args.scene_arg, "--scene-arg") or None
    extra_enh = _parse_kv_args(args.enhancer_arg, "--enhancer-arg")
    if extra_enh:
        enhancer_kwargs = {**(enhancer_kwargs or {}), **extra_enh}
    dot_overrides = _parse_kv_args(args.overrides, "--overrides",
                                   keep_dots=True)
    vad_backend = "none" if args.no_vad else args.vad_backend
    overrides = dict(
        language=args.language, task=task, model=args.model,
        batch_size=args.batch_size,
        vad_backend=vad_backend, scene_backend=args.scene_backend,
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
        vocab_slice=args.vocab_slice,
        enhance_for_vad=args.enhance_for_vad,
        keep_intermediates=args.keep_temp,
        output_format=output_format,
    )
    checkpoint = args.checkpoint
    sensitivity = args.sensitivity
    if args.mode == "transformers":
        # --hf-* group maps onto the chunked long-form path
        # (reference: main.py:478-517 --hf-batch-size/chunk/stride/…)
        if args.hf_model_id:
            checkpoint = checkpoint or args.hf_model_id
        if args.hf_batch_size is not None:
            overrides["batch_size"] = args.hf_batch_size
        if args.hf_chunk_length is not None:
            overrides["chunk_s"] = args.hf_chunk_length
        if args.hf_stride is not None:
            overrides["chunk_overlap_s"] = args.hf_stride
        if args.hf_beam_size is not None:
            overrides["beam_size"] = args.hf_beam_size
        if args.hf_temperature is not None:
            overrides["temperatures"] = (args.hf_temperature,)
        if args.hf_language:
            overrides["language"] = args.hf_language
        if args.hf_scene:
            overrides["scene_backend"] = args.hf_scene
        if args.hf_timestamps is not None:
            overrides["no_timestamps"] = args.hf_timestamps == "false"
    if args.mode == "qwen":
        if args.qwen_sensitivity:
            sensitivity = args.qwen_sensitivity
        if args.qwen_batch_size is not None:
            overrides["batch_size"] = args.qwen_batch_size
        if args.qwen_max_group_duration is not None:
            overrides["max_group_duration_s"] = args.qwen_max_group_duration
        if args.qwen_scene:
            overrides["scene_backend"] = args.qwen_scene
        if args.qwen_segmenter:
            overrides["vad_backend"] = args.qwen_segmenter
        if args.qwen_vad_threshold is not None:
            overrides["vad_threshold"] = args.qwen_vad_threshold
        if args.qwen_enhancer:
            overrides["enhancer_backend"] = args.qwen_enhancer
        if args.qwen_enhancer_model:
            overrides["enhancer_kwargs"] = {
                **(overrides.get("enhancer_kwargs") or {}),
                "weights": args.qwen_enhancer_model}
        if args.qwen_model_id:
            overrides["model"] = args.qwen_model_id
        if args.qwen_language:
            lang_map = {"japanese": "ja", "english": "en", "chinese": "zh",
                        "korean": "ko"}
            overrides["language"] = lang_map.get(
                args.qwen_language.lower(), args.qwen_language)
        if args.qwen_input_mode in ("context_aware", "vad_slicing"):
            logger.warning(
                "--qwen-input-mode %s is a deprecated alias of 'assembly' "
                "(reference: main.py:566-568); using assembly",
                args.qwen_input_mode)
    cfg = resolve_pipeline_config(
        mode=args.mode, sensitivity=sensitivity, **overrides)
    if dot_overrides:
        cfg = apply_dot_overrides(cfg, dot_overrides)

    if args.dump_params:
        from dataclasses import asdict
        print(json.dumps({
            "mode": asdict(cfg.mode), "sensitivity": asdict(cfg.sensitivity),
            "language": cfg.language, "task": cfg.task, "model": cfg.model,
            "batch_size": cfg.batch_size,
            "output_format": cfg.output_format,
        }, indent=2))
        return 0

    from whisperjav_tpu.modules.media_discovery import discover
    media = discover(args.inputs, recursive=args.recursive)
    if not media:
        logger.error("no media files found in inputs: %s", args.inputs)
        return 1
    logger.info("discovered %d media file(s)", len(media))

    if args.multihost:
        from whisperjav_tpu.parallel.multihost import (
            initialize_distributed, shard_files,
        )
        proc, nprocs = initialize_distributed(
            args.coordinator, args.num_hosts, args.host_id)
        media = shard_files(media, proc, nprocs)
        if not media:
            logger.info("multihost: no files assigned to this process")
            return 0

    from whisperjav_tpu.modules.media_discovery import resolve_output_dir
    output_dir = args.output_dir          # may be the "source" sentinel

    def out_for(m):
        return resolve_output_dir(output_dir, m)

    # both pipelines name outputs <basename>.<language>.whisperjav.srt
    # (transcribe.py:284, qwen.py); translate task always lands on en
    out_lang = cfg.language if task == "transcribe" else "en"

    if args.skip_existing:
        remaining = []
        for m in media:
            stem = f"{m.basename}.{out_lang}.whisperjav"
            srt = out_for(m) / f"{stem}.srt"
            vtt = out_for(m) / f"{stem}.vtt"   # reference checks both,
            if srt.exists() or vtt.exists():   # main.py:1254-1257
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

    if args.qwen_japanese_postprocess and args.mode == "qwen":
        logger.warning(
            "--qwen-japanese-postprocess has no effect for qwen mode "
            "(AssemblyTextCleaner covers it) — reference deprecation, "
            "qwen_pipeline.py:249-252")

    postprocessor = None
    if not args.no_sanitize:
        from whisperjav_tpu.modules.sanitize import SRTPostProcessor
        postprocessor = SRTPostProcessor(
            regroup_preset=args.postprocess_preset)

    def _finalize_outputs(srt_path) -> None:
        """Signatures → VTT conversion, reference post-step order
        (main.py:1277-1338 then apply_vtt_conversion)."""
        if srt_path is None:
            return
        srt_path = Path(srt_path)
        if args.credit or not args.no_signature:
            from whisperjav_tpu.modules.srt import add_signatures
            add_signatures(srt_path, producer_credit=args.credit,
                           add_technical_sig=not args.no_signature,
                           mode=cfg.mode.name,
                           sensitivity=cfg.sensitivity.name)
        if args.translate:
            _translate_output(args, srt_path)
        if output_format in ("vtt", "both"):
            from whisperjav_tpu.modules.srt import srt_to_vtt
            srt_to_vtt(srt_path)
            if output_format == "vtt":
                srt_path.unlink()

    daemon_eligible = args.daemon and not args.ensemble
    if daemon_eligible and cfg.mode.name == "qwen":
        # the resident qwen engine runs the DEFAULT decoupled stack
        # (pipelines/qwen_factory.py); stack-level knobs can't reach it
        deep = _qwen_deep_flags(args)
        if deep:
            logger.warning(
                "--daemon: qwen stack knobs (%s) can't be routed to a "
                "resident engine; continuing in-process",
                ", ".join(deep))
            daemon_eligible = False
    if daemon_eligible:
        from whisperjav_tpu.pipelines.daemon_client import (
            daemon_reproducible,
        )
        if not daemon_reproducible(cfg):
            logger.warning(
                "--daemon: this invocation carries config overrides a "
                "daemon can't receive (scene/VAD/enhancer/decode knobs); "
                "continuing in-process")
            daemon_eligible = False
    if daemon_eligible:
        # Resident-engine routing: skip the per-process first-batch
        # compile/load wall (140-500 s measured, ADR-002 round 5) by
        # decoding through a hot whisperjav-serve engine. The daemon owns
        # scenes/VAD/decode/sanitize under ITS config (fingerprint-matched
        # in find_daemon); this process only discovers media, writes
        # outputs, and runs signatures/translate/VTT.
        from whisperjav_tpu.pipelines.daemon_client import get_daemon
        client = get_daemon(cfg, port=args.daemon_port,
                            checkpoint=checkpoint,
                            replace=args.daemon_replace)
        if client is not None:
            from whisperjav_tpu.modules.srt import compose_srt
            batch_stats = []
            failures = 0
            t_start = time.time()
            for m in media:
                try:
                    t0 = time.time()
                    subs, stats = client.transcribe(m.path)
                    out_dir_m = out_for(m)
                    out_dir_m.mkdir(parents=True, exist_ok=True)
                    srt_path = (out_dir_m /
                                f"{m.basename}.{out_lang}.whisperjav.srt")
                    srt_path.write_text(compose_srt(subs),
                                        encoding="utf-8")
                    _finalize_outputs(srt_path)
                    wall = time.time() - t0
                    audio_s = float(stats.get("audio_s", 0.0) or 0.0)
                    # same per-file metadata contract as the in-process
                    # path (transcribe.py), so downstream tooling
                    # (e2e_bench, analytics, users' scripts) works
                    # identically under --daemon; client-side wall
                    # recorded alongside the daemon's own stats
                    stats = dict(stats)
                    stats["daemon_client_wall_s"] = round(wall, 3)
                    # client-observed per-file wall is the number a
                    # --daemon user experiences; the daemon's own
                    # stage walls stay inside stats untouched
                    stats.setdefault("e2e_wall_s", round(wall, 3))
                    stats["e2e_rtf_x"] = round(
                        audio_s / max(wall, 1e-9), 2)
                    stats.setdefault("final_subtitles", len(subs))
                    meta = {"input": str(m.path),
                            "pipeline": cfg.mode.name,
                            "duration_s": audio_s,
                            "output": str(srt_path),
                            "stats": stats}
                    # qwen daemon responses carry analytics/diagnostics;
                    # hoist them to the in-process metadata layout
                    for key in ("analytics", "scene_diagnostics"):
                        if key in stats:
                            meta[key] = stats.pop(key)
                    meta_path = (out_dir_m /
                                 f"{m.basename}.whisperjav.json")
                    meta_path.write_text(
                        json.dumps(meta, indent=2, default=str),
                        encoding="utf-8")
                    logger.info(
                        "wrote %s (%d subtitles, daemon, RTF %.2fx)",
                        srt_path.name, len(subs),
                        audio_s / wall if wall > 0 else 0.0)
                    batch_stats.append({"file": str(m.path),
                                        "output": str(srt_path),
                                        "wall_s": round(wall, 2),
                                        **stats})
                except Exception as e:  # keep the batch going
                    logger.error("daemon transcribe failed on %s: %s",
                                 m.path.name, e)
                    failures += 1
            summary = {"files": len(media), "failures": failures,
                       "wall_s": round(time.time() - t_start, 2),
                       "daemon_port": args.daemon_port,
                       "results": batch_stats}
            if args.stats_file:
                Path(args.stats_file).write_text(
                    json.dumps(summary, indent=2, default=str),
                    encoding="utf-8")
            logger.info("done (daemon): %d file(s), %d failure(s), %.1fs",
                        len(media), failures, summary["wall_s"])
            return 0 if failures == 0 else 2
        logger.warning("--daemon requested but no resident engine is "
                       "available; continuing in-process")
    elif args.daemon and args.ensemble:
        logger.warning("--daemon does not cover ensemble mode (two engine "
                       "configs per file); continuing in-process")

    if args.ensemble:
        from whisperjav_tpu.ensemble.orchestrator import EnsembleOrchestrator
        # both passes receive the full CLI override set (beam/thresholds/
        # prompt/enhancer/pack/scene+vad kwargs) plus their per-pass
        # overrides; mode/sensitivity differ
        ov1 = _pass_overrides(args, 1, overrides)
        ov2 = _pass_overrides(args, 2, overrides)
        cfg1 = resolve_pipeline_config(
            mode=args.pass1_mode or args.mode,
            sensitivity=args.pass1_sensitivity or args.sensitivity,
            **ov1)
        cfg2 = resolve_pipeline_config(
            mode=args.pass2_mode or args.mode,
            sensitivity=args.pass2_sensitivity,
            **ov2)
        if args.pass1_overrides:
            cfg1 = apply_dot_overrides(cfg1, _parse_kv_args(
                args.pass1_overrides, "--pass1-overrides", keep_dots=True))
        if args.pass2_overrides:
            cfg2 = apply_dot_overrides(cfg2, _parse_kv_args(
                args.pass2_overrides, "--pass2-overrides", keep_dots=True))
        # --passN-params / --passN-hf-params / --passN-qwen-params: JSON
        # dicts of config fields (flat or dot-notation keys), the
        # reference's "custom mode" per-pass parameterization
        # (main.py:202-207, 2137)
        for n, c in ((1, cfg1), (2, cfg2)):
            merged = {}
            merged.update(_json_flag(getattr(args, f"pass{n}_params"),
                                     f"--pass{n}-params"))
            mode_n = getattr(args, f"pass{n}_mode") or args.mode
            if mode_n == "transformers":
                merged.update(_json_flag(
                    getattr(args, f"pass{n}_hf_params"),
                    f"--pass{n}-hf-params"))
            if mode_n == "qwen":
                merged.update(_json_flag(
                    getattr(args, f"pass{n}_qwen_params"),
                    f"--pass{n}-qwen-params"))
            if merged:
                c2 = apply_dot_overrides(c, merged)
                if n == 1:
                    cfg1 = c2
                else:
                    cfg2 = c2
        if dot_overrides:
            cfg1 = apply_dot_overrides(cfg1, dot_overrides)
            cfg2 = apply_dot_overrides(cfg2, dot_overrides)
        orch = EnsembleOrchestrator(cfg1, cfg2,
                                    merge_strategy=args.merge_strategy,
                                    checkpoint=checkpoint,
                                    postprocessor=postprocessor,
                                    serial_mode=args.ensemble_serial)
        summary = orch.process_batch(media, output_dir)
        for r in summary.get("results", []):
            _finalize_outputs(r.get("output"))
        if args.stats_file:
            Path(args.stats_file).write_text(
                json.dumps(summary, indent=2, default=str), encoding="utf-8")
        logger.info("ensemble done: %d ok, %d degraded, %d failed",
                    summary["ok"], summary["degraded"], summary["failed"])
        return 0 if summary["failed"] == 0 else 2

    if cfg.mode.name == "qwen":
        from whisperjav_tpu.modules.subtitle_pipeline.components import (
            QwenGenerator, WhisperGenerator, create_aligner, create_cleaner,
            create_framer,
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
        framer_kwargs: Dict = {}
        framer_name = args.framer or "vad-grouped"
        if framer_name == "vad-grouped":
            framer_kwargs["vad_backend"] = cfg.mode.vad_backend
            if args.qwen_vad_threshold is not None:
                framer_kwargs["threshold"] = args.qwen_vad_threshold
            if args.qwen_chunk_threshold is not None:
                framer_kwargs["max_gap_s"] = args.qwen_chunk_threshold
            if args.qwen_vad_padding is not None:
                pad_s = args.qwen_vad_padding / 1000.0
                framer_kwargs["pad_start_s"] = pad_s
                framer_kwargs["pad_end_s"] = pad_s
            if cfg.vad_kwargs:
                framer_kwargs.update(cfg.vad_kwargs)
        elif framer_name == "srt-source":
            if not args.framer_srt_path:
                raise SystemExit(
                    "--framer srt-source requires --framer-srt-path")
            framer_kwargs["srt_path"] = args.framer_srt_path
        framer_kwargs.update(_json_flag(args.framer_config,
                                        "--framer-config"))
        framer = create_framer(framer_name, **framer_kwargs)
        step_down = StepDownConfig(enabled=not args.no_step_down)
        if args.step_down_attempts is not None:
            step_down = StepDownConfig(
                enabled=step_down.enabled and args.step_down_attempts > 0,
                fallback_max_group_s=step_down.fallback_max_group_s,
                max_retries=max(args.step_down_attempts, 0))
        if args.step_down_max_group is not None:
            step_down = StepDownConfig(
                enabled=step_down.enabled,
                fallback_max_group_s=args.step_down_max_group,
                max_retries=step_down.max_retries)
        hardening = None
        if args.timestamp_mode:
            hardening = HardeningConfig(
                timestamp_mode=TimestampMode(args.timestamp_mode))
        context = args.context
        if args.context_file:
            try:
                file_ctx = Path(args.context_file).read_text(
                    encoding="utf-8").strip()
            except OSError as e:
                raise SystemExit(f"--context-file: {e}")
            context = f"{context}\n{file_ctx}" if context else file_ctx
        gen_kwargs: Dict = {}
        if args.qwen_repetition_penalty is not None:
            gen_kwargs["repetition_penalty"] = args.qwen_repetition_penalty
        if context:
            gen_kwargs["context"] = context
        if args.qwen_max_tokens is not None:
            gen_kwargs["max_tokens"] = args.qwen_max_tokens
        if args.qwen_max_tokens_per_second is not None:
            gen_kwargs["max_tokens_per_second"] = \
                args.qwen_max_tokens_per_second
        gen_kwargs.update(_json_flag(args.generator_config,
                                     "--generator-config"))
        if args.generator == "anime-whisper":
            # anime-whisper = a Whisper fine-tune decoded without prompts;
            # any local Whisper checkpoint slots in (PARITY row 33)
            import copy
            from whisperjav_tpu.pipelines.factory import build_engine
            wcfg = copy.copy(cfg)
            if wcfg.model.startswith("qwen"):
                wcfg.model = args.model or "small"
            generator = WhisperGenerator(
                engine=build_engine(wcfg, checkpoint=checkpoint))
        elif args.generator == "cohere":
            # experimental text-only LALM slot (reference:
            # generators/cohere.py) — greedy, context-ignoring, chunked
            from whisperjav_tpu.modules.subtitle_pipeline.components import (
                CohereStyleGenerator,
            )
            dropped = [name for key, name in
                       (("repetition_penalty", "--qwen-repetition-penalty"),
                        ("context", "--context/--context-file"))
                       if gen_kwargs.pop(key, None) is not None]
            if dropped:
                logger.warning(
                    "--generator cohere does not support %s; ignoring "
                    "(the cohere slot is greedy and prompt-free — "
                    "reference generators/cohere.py:617-661)",
                    " and ".join(dropped))
            if "max_tokens" in gen_kwargs:
                gen_kwargs["max_new_tokens"] = gen_kwargs.pop("max_tokens")
            if "model_id" in gen_kwargs:
                model_size = gen_kwargs.pop("model_id")
            generator = CohereStyleGenerator(
                model_size=model_size, batch_size=cfg.batch_size,
                checkpoint=checkpoint, **gen_kwargs)
        else:
            if "model_id" in gen_kwargs:    # reference config-key spelling
                model_size = gen_kwargs.pop("model_id")
            generator = QwenGenerator(model_size=model_size,
                                      batch_size=cfg.batch_size,
                                      checkpoint=checkpoint, **gen_kwargs)
        cleaner_name = args.cleaner or (
            "assembly" if args.qwen_assembly_cleaner else "passthrough")
        cleaner = create_cleaner(cleaner_name,
                                 **_json_flag(args.cleaner_config,
                                              "--cleaner-config"))
        aligner_name = args.aligner or (
            "none" if args.qwen_timestamps == "none" else "qwen3")
        aligner = create_aligner(aligner_name,
                                 **_json_flag(args.aligner_config,
                                              "--aligner-config"))
        max_group_s = (args.qwen_stepdown_initial_group
                       if args.qwen_stepdown_initial_group is not None
                       else cfg.sensitivity.max_group_duration_s)
        decoupled = DecoupledSubtitlePipeline(
            framer=framer,
            generator=generator,
            cleaner=cleaner,
            aligner=aligner,
            max_group_s=max_group_s,
            step_down=step_down,
            hardening=hardening,
            regroup_mode=(RegroupMode(args.regroup_mode)
                          if args.regroup_mode else RegroupMode.STANDARD),
        )
        qwen_pipe_kwargs: Dict = {"safe_chunking": args.qwen_safe_chunking}
        if args.qwen_scene_min_duration is not None:
            qwen_pipe_kwargs["scene_min_s"] = args.qwen_scene_min_duration
        if args.qwen_scene_max_duration is not None:
            qwen_pipe_kwargs["scene_max_s"] = args.qwen_scene_max_duration
        pipeline = QwenPipeline(decoupled,
                                scene_backend=cfg.mode.scene_backend,
                                scene_kwargs=cfg.scene_kwargs or None,
                                enhancer_backend=cfg.enhancer_backend,
                                language=cfg.language,
                                **qwen_pipe_kwargs)
    else:
        from whisperjav_tpu.pipelines.factory import build_pipeline
        pipeline = build_pipeline(cfg, checkpoint=checkpoint,
                                  postprocessor=postprocessor, tracer=tracer,
                                  devices=args.devices)

    if args.async_processing and cfg.mode.name != "qwen":
        from whisperjav_tpu.utils.async_processor import AsyncPipelineManager
        t_start = time.time()
        outcomes = AsyncPipelineManager(
            pipeline, max_prefetch=max(args.max_workers, 1),
        ).process_files(media, output_dir)
        failures = sum(1 for o in outcomes if not o.ok)
        for o in outcomes:
            if o.ok and getattr(o.result, "srt_path", None):
                _finalize_outputs(o.result.srt_path)
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

    from whisperjav_tpu.utils.progress import ProgressManager
    progress = ProgressManager(
        enabled=False if (args.no_progress or args.verbosity == "quiet")
        else None)
    progress.task("files", len(media))
    batch_stats = []
    failures = 0
    t_start = time.time()
    for m in media:
        try:
            with progress.suppress_external():
                result = pipeline.process(m, out_for(m))
            _finalize_outputs(result.srt_path)
            batch_stats.append(result.metadata)
        except Exception as e:  # keep the batch going, reference behavior
            logger.error("failed on %s: %s", m.path.name, e, exc_info=True)
            failures += 1
        progress.advance("files")
    progress.finish("files")

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
