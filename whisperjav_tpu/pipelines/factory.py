"""Build a ready-to-run pipeline from a resolved PipelineConfig."""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.config.presets import PipelineConfig
from whisperjav_tpu.models.whisper.config import WHISPER_SIZES, WhisperConfig
from whisperjav_tpu.models.whisper.decode import DecodeOptions
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.models.whisper.tokenizer import (
    WhisperTokenizer, find_tokenizer_files,
)
from whisperjav_tpu.pipelines.engine import (
    QualityThresholds, TranscriptionEngine,
)
from whisperjav_tpu.pipelines.transcribe import TranscribePipeline
from whisperjav_tpu.utils.logger import logger


def load_model(model_name: str, checkpoint: Optional[str] = None,
               dtype=jnp.bfloat16):
    """Load Whisper weights: local HF checkpoint dir when given, otherwise
    random-init at the requested architecture (zero-egress environments
    cannot download; decoding then produces structurally valid but
    meaningless text — still useful for benchmarks and plumbing tests)."""
    if checkpoint:
        from whisperjav_tpu.models.whisper.convert import load_pretrained
        config, params = load_pretrained(checkpoint, dtype=jnp.float32)
        logger.info("loaded checkpoint %s (%s)", checkpoint, config.name)
        return config, params
    if model_name not in WHISPER_SIZES:
        raise ValueError(f"unknown model {model_name!r}; "
                         f"choose from {sorted(WHISPER_SIZES)}")
    config = WHISPER_SIZES[model_name]
    # named sizes get the bundled per-model word-alignment heads (real
    # checkpoints override via generation_config — convert.load_pretrained)
    from whisperjav_tpu.models.whisper.alignment_heads import (
        resolve_alignment_heads,
    )
    heads = resolve_alignment_heads(
        model_name, config.n_text_layer, config.n_text_head)
    if heads:
        import dataclasses
        config = dataclasses.replace(config, alignment_heads=heads)
    logger.warning("no checkpoint provided — using random-init %s weights "
                   "(text output will not be meaningful)", model_name)
    # ONE jitted program for the whole init: eager per-leaf dispatch pays
    # a tunnel round trip per op (~0.5 s × ~44 ops ≈ 22 s of engine
    # startup measured on the axon backend, 2026-08-19). The key uses the
    # TPU's hardware RNG ("rbg") instead of default threefry: the
    # threefry init program for turbo took 64 s to compile and ~32 s to
    # LOAD from the persistent cache per process, vs 6 s / ~2 s for rbg
    # (measured same-day A/B, ADR-002 round 5) — random init is a
    # bench/plumbing path, so counter-based reproducibility guarantees
    # don't matter, only the distribution.
    import functools
    try:
        key = jax.random.key(0, impl="rbg")
    except Exception:                        # older jax / odd backends
        key = jax.random.PRNGKey(0)
    params = jax.jit(functools.partial(init_params, config, dtype=dtype))(
        key)
    return config, params


def build_engine(cfg: PipelineConfig,
                 checkpoint: Optional[str] = None) -> TranscriptionEngine:
    """Bare TranscriptionEngine (no scene/VAD pipeline around it) — used
    when a Whisper model plays the generator role inside the decoupled
    stack (anime-whisper slot, reference: generators/anime_whisper.py)."""
    model_config, params = load_model(cfg.model, checkpoint)
    sens = cfg.sensitivity
    options = DecodeOptions(
        task=cfg.task, language=cfg.language,
        with_timestamps=False,      # generator path: text only
        repetition_penalty=sens.repetition_penalty,
        cross_kv_int8=True,
    )
    tokenizer = WhisperTokenizer(model_config,
                                 find_tokenizer_files(checkpoint))
    return TranscriptionEngine(
        model_config, params, options=options,
        thresholds=QualityThresholds(temperatures=(0.0,)),
        batch_size=cfg.batch_size, tokenizer=tokenizer)


def build_pipeline(
    cfg: PipelineConfig,
    checkpoint: Optional[str] = None,
    mesh=None,
    postprocessor=None,
    tracer=None,
    model_config: Optional[WhisperConfig] = None,
    params=None,
    devices: Optional[int] = None,
) -> TranscribePipeline:
    if params is None or model_config is None:
        model_config, params = load_model(cfg.model, checkpoint)

    # Multi-chip by default: when more than one device is visible, shard
    # window batches data-parallel over ICI (SURVEY §2.2 — the
    # reference-faithful scaling axis). ``devices`` caps the mesh
    # (--devices 1 forces single-chip); the global batch pads up to a
    # mesh multiple so P("data") sharding divides evenly.
    if mesh is None and devices != 1:
        avail = jax.device_count()
        n_dev = min(devices or avail, avail)
        if n_dev > 1:
            from whisperjav_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(n_dev)
            if cfg.batch_size % n_dev:
                padded = ((cfg.batch_size + n_dev - 1) // n_dev) * n_dev
                logger.info(
                    "data-parallel mesh over %d devices: global batch "
                    "%d → %d", n_dev, cfg.batch_size, padded)
                cfg.batch_size = padded
            else:
                logger.info("data-parallel mesh over %d devices "
                            "(global batch %d)", n_dev, cfg.batch_size)

    sens = cfg.sensitivity
    options = DecodeOptions(
        task=cfg.task,
        language=cfg.language,
        with_timestamps=(cfg.mode.with_timestamps
                         and not getattr(cfg, "no_timestamps", False)),
        repetition_penalty=sens.repetition_penalty,
        no_repeat_ngram_size=sens.no_repeat_ngram_size,
        beam_size=sens.beam_size,
        patience=sens.patience,
        best_of=sens.best_of,
        cross_kv_int8=True,   # production default: halves decode HBM traffic
    )
    # WJAV_LADDER_RUNGS=N clamps the temperature-fallback ladder to its
    # first N rungs (0/unset = full ladder). Measurement knob: random
    # weights fail every quality gate, saturating the ladder — real
    # weights pass at rung 1 for ~all windows (see bench.py PRESET docs).
    ladder = sens.temperatures + tuple(
        t for t in (0.4, 0.6, 0.8, 1.0) if t > max(sens.temperatures))
    _rungs = int(os.environ.get("WJAV_LADDER_RUNGS", "0"))
    if _rungs > 0:
        ladder = ladder[:_rungs]
    thresholds = QualityThresholds(
        logprob_threshold=sens.logprob_threshold,
        no_speech_threshold=sens.no_speech_threshold,
        compression_ratio_threshold=sens.compression_ratio_threshold,
        temperatures=ladder,
    )
    # HBM guard: cross-KV scales with batch x beams; large-v2-class models
    # fit ~64 effective rows PER CHIP with int8 cross-KV (measured: 64
    # runs at 207x RT on one v5e-class chip; 80 OOMs)
    n_chips = int(np.prod(mesh.devices.shape)) if mesh is not None else 1
    effective_rows = cfg.batch_size * max(sens.beam_size, 1) // n_chips
    if model_config.n_audio_state >= 1280 and effective_rows > 64:
        logger.warning(
            "batch_size(%d) x beam_size(%d) / %d chips = %d effective "
            "decode rows per chip may exceed HBM for %s; consider "
            "--batch-size %d",
            cfg.batch_size, sens.beam_size, n_chips, effective_rows,
            model_config.name,
            max(64 * n_chips // max(sens.beam_size, 1), 1))

    tokenizer = WhisperTokenizer(model_config,
                                 find_tokenizer_files(checkpoint))
    prompt_tokens: tuple = ()
    initial_prompt = getattr(cfg, "initial_prompt", None)
    if initial_prompt:
        prompt_tokens = tuple(tokenizer.encode(initial_prompt))[-200:]
        if not tokenizer.is_real:
            logger.warning("--prompt set without a real tokenizer; prompt "
                           "conditioning uses fallback token ids")
    # --vocab-slice / WJAV_VOCAB_SLICE: "ja" derives the JA-plausible
    # text-token subset from a real tokenizer (sliced lm head + logit
    # rules — see models/whisper/vocab_subset.py); <int> is the
    # synthetic measurement subset. Unset/0 = full vocab.
    vocab_subset = None
    _vs = (getattr(cfg, "vocab_slice", None)
           or os.environ.get("WJAV_VOCAB_SLICE", ""))
    if _vs == "ja":
        from whisperjav_tpu.models.whisper.vocab_subset import ja_text_ids
        vocab_subset = ja_text_ids(tokenizer, model_config)
        if vocab_subset is None:
            logger.warning("WJAV_VOCAB_SLICE=ja needs a real tokenizer "
                           "(checkpoint vocab); decoding the full vocab")
        else:
            logger.info("vocab slice: %d/%d text ids kept",
                        len(vocab_subset), model_config.eot)
    elif _vs.isdigit() and int(_vs) > 0:
        from whisperjav_tpu.models.whisper.vocab_subset import (
            synthetic_text_ids,
        )
        vocab_subset = synthetic_text_ids(model_config, int(_vs))
    engine = TranscriptionEngine(
        model_config, params, options=options, thresholds=thresholds,
        batch_size=cfg.batch_size, mesh=mesh, tokenizer=tokenizer,
        prompt_tokens=prompt_tokens,
        word_timestamps=getattr(cfg, "word_timestamps", False),
        int8_weights=getattr(cfg, "int8_weights", False),
        vocab_subset=vocab_subset,
    )
    vad_kwargs = dict(cfg.vad_kwargs)
    if cfg.mode.vad_backend == "energy":
        vad_kwargs.setdefault("energy_db", sens.energy_vad_db)
        vad_kwargs.setdefault("max_group_duration_s",
                              sens.max_group_duration_s)
    elif cfg.mode.vad_backend in ("silero", "silero-jax"):
        vad_kwargs.setdefault("threshold", sens.vad_threshold)
        vad_kwargs.setdefault("max_group_duration_s",
                              sens.max_group_duration_s)
    return TranscribePipeline(
        engine,
        scene_backend=cfg.mode.scene_backend,
        vad_backend=cfg.mode.vad_backend,
        scene_kwargs=cfg.scene_kwargs,
        vad_kwargs=vad_kwargs,
        language=cfg.language,
        enhancer_backend=getattr(cfg, "enhancer_backend", None),
        enhancer_kwargs=getattr(cfg, "enhancer_kwargs", None),
        postprocessor=postprocessor,
        tracer=tracer,
        pack=getattr(cfg, "pack_windows", True),
        chunked=(cfg.mode.name == "transformers"),
        chunk_s=getattr(cfg, "chunk_s", 30.0),
        chunk_overlap_s=getattr(cfg, "chunk_overlap_s", 5.0),
        enhance_for_vad=getattr(cfg, "enhance_for_vad", False),
        keep_intermediates=getattr(cfg, "keep_intermediates", False),
        output_format=getattr(cfg, "output_format", "srt"),
    )
