"""Benchmark: Whisper large-v2 batched transcription throughput per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference's headline number — faster-whisper (CTranslate2)
large-v2 at ~15x realtime on an RTX 4090 (BASELINE.md). value is the
realtime factor (audio seconds transcribed per wall second) of the
TPU engine on fixed 30 s windows with a representative decode budget.

Weights are random (no network egress): throughput is weight-value
independent — the decode loop runs its full token budget per window,
which slightly *understates* steady-state RTF versus real weights that
emit EOT early.
"""

import json
import os
import sys
import time

import numpy as np


BASELINE_RTF = 15.0          # CUDA faster-whisper large-v2 on RTX 4090
MODEL = os.environ.get("WJAV_BENCH_MODEL", "large-v2")
# 64 measured as the single-chip HBM sweet spot for large-v2 with int8
# cross-KV (207x vs ~175x at 48; 80 and 96 OOM on v5e-class chips)
BATCH = int(os.environ.get("WJAV_BENCH_BATCH", "64"))
DECODE_TOKENS = 128          # representative tokens per 30 s JA window
TIMED_BATCHES = int(os.environ.get("WJAV_BENCH_ITERS", "8"))


def main():
    import jax
    import jax.numpy as jnp
    from whisperjav_tpu.models.whisper.config import WHISPER_SIZES
    from whisperjav_tpu.models.whisper.decode import DecodeOptions
    from whisperjav_tpu.models.whisper.model import init_params
    from whisperjav_tpu.ops.mel import N_SAMPLES
    from whisperjav_tpu.pipelines.engine import (
        QualityThresholds, TranscriptionEngine,
    )

    config = WHISPER_SIZES[MODEL]
    params = init_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    kv_bits = int(os.environ.get("WJAV_BENCH_KV_BITS", "8"))
    options = DecodeOptions(
        max_new_tokens=DECODE_TOKENS,
        cross_kv_int8=kv_bits == 8,
        cross_kv_int4=kv_bits == 4,
        # production presets run the n-gram ban (factory.py); measure
        # its cost with WJAV_BENCH_NGRAM=3
        no_repeat_ngram_size=int(os.environ.get("WJAV_BENCH_NGRAM", "0")))
    engine = TranscriptionEngine(
        config, params, options=options,
        thresholds=QualityThresholds(temperatures=(0.0,)),
        batch_size=BATCH, int8_weights=True,
    )

    rng = np.random.default_rng(0)
    t = np.arange(N_SAMPLES) / 16000.0
    base = (0.3 * np.sin(2 * np.pi * 180 * t)
            * (1 + 0.5 * np.sin(2 * np.pi * 4 * t)))
    audio = np.stack([
        (base + 0.05 * rng.standard_normal(N_SAMPLES)).astype(np.float32)
        for _ in range(BATCH)])

    # compile + warmup (materialized: block_until_ready does NOT reliably
    # block through the axon tunnel — CLAUDE.md timing rule)
    res = engine.decode_batch(audio, 0.0, 0)
    np.asarray(res.tokens)

    # steady-state loop mirrors transcribe_windows' double buffering:
    # batch i+1's host->device upload is dispatched before batch i's
    # tokens are drained, so the transfer streams behind compute
    dev = engine.upload_audio(audio)
    t0 = time.time()
    for i in range(TIMED_BATCHES):
        nxt = engine.upload_audio(audio) if i + 1 < TIMED_BATCHES else None
        res = engine.decode_batch(audio, 0.0, i + 1, device_audio=dev)
        np.asarray(res.tokens)  # force per-iteration materialization
        dev = nxt
    wall = time.time() - t0

    audio_seconds = TIMED_BATCHES * BATCH * 30.0
    rtf = audio_seconds / wall
    print(json.dumps({
        "metric": f"whisper_{MODEL.replace('-', '_')}_rtf_per_chip",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
    }))


if __name__ == "__main__":
    sys.exit(main() or 0)
