"""Decode step-time attribution by controlled ablation (ADR-002 §Next).

The tunnel blocks ``jax.profiler``, so this tool measures what a trace
would show by differencing: each variant changes ONE cost source, and
every (variant, budget) cell is timed end-to-end with forced
materialization.  Two token budgets per variant give

    seconds(budget) = intercept + slope * steps

so ``slope`` is the true ms/step with the per-batch fixed work
(cross-KV precompute, prefill, upload) removed, and differences of
slopes against ``base`` attribute the per-step cost of the ablated
component (cross-KV stream length, int8 weight dequant, int8 KV
quantization, logit rules, self-cache size).

Usage (idle TPU host; first run compiles ~10-20 min, cached after):

    python -m whisperjav_tpu.tools.decode_profile [--model large-v2]
        [--batch 64] [--iters 3] [--json OUT]

Prints one JSON line per cell plus a final attribution summary.
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Dict, List

import numpy as np


def _build(model: str, batch: int):
    import jax
    import jax.numpy as jnp

    from whisperjav_tpu.models.whisper.config import WHISPER_SIZES
    from whisperjav_tpu.models.whisper.model import init_params
    from whisperjav_tpu.models.whisper.quant import (
        quantize_decoder_weights,
    )

    config = WHISPER_SIZES[model]
    # decode touches only params["decoder"] (model.py:decode_step /
    # precompute_cross_kv); dropping the encoder halves the resident
    # params HBM — holding full bf16 + quantized trees OOMs large-v2.
    params = jax.jit(
        lambda k: {"decoder": init_params(config, k,
                                          dtype=jnp.bfloat16)["decoder"]}
    )(jax.random.PRNGKey(0))
    params_q = jax.jit(quantize_decoder_weights)(params)
    jax.block_until_ready(params_q)

    # encoder output stand-in: decode cost does not depend on xa values
    xa = jax.jit(
        lambda k: 0.1 * jax.random.normal(
            k, (batch, config.n_audio_ctx, config.n_audio_state),
            jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    return config, params, params_q, xa


def _time_cell(config, params, xa, options, iters: int) -> float:
    """Median wall seconds per decode over ``iters`` timed calls."""
    import jax.numpy as jnp

    from whisperjav_tpu.models.whisper.decode import decode_greedy

    def run():
        res = decode_greedy(params, config, xa, options)
        np.asarray(res.tokens)        # tunnel-proof materialization

    run()                             # compile + warm
    times = []
    for _ in range(iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return float(np.median(times))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v2")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--budgets", type=int, nargs=2, default=(32, 128))
    ap.add_argument("--long-budget", type=int, default=256,
                    help="extra base cell for self-cache-growth slope")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    import jax

    from whisperjav_tpu.models.whisper.decode import DecodeOptions

    cache_dir = ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    config, params, params_q, xa = _build(args.model, args.batch)
    lo, hi = args.budgets

    def opts(budget, **kw):
        base = dict(max_new_tokens=budget, cross_kv_int8=True,
                    no_repeat_ngram_size=0)
        base.update(kw)
        return DecodeOptions(**base)

    # bf16_weights runs FIRST so the bf16 param copy can be freed before
    # the int8 cells (holding both trees OOMs large-v2 at batch 64)
    variants = {
        "bf16_weights": dict(_params="bf16"),
        "base": dict(),
        "bucket448": dict(_slice=448),
        # bf16 cross-KV OOMs large-v2 at B=64 (the stream alone is
        # ~15.7 GB) — ablate the KV stream the other way: int4 halves it
        "int4_cross_kv": dict(cross_kv_int8=False, cross_kv_int4=True),
        "rules_off": dict(with_timestamps=False, suppress_blank=False,
                          suppress_tokens=()),
        "ngram3": dict(no_repeat_ngram_size=3),
    }

    rows: List[Dict] = []
    holder = {"bf16": params}
    del params

    def cell(name, kw, budget):
        kw = dict(kw)
        p = holder["bf16"] if kw.pop("_params", None) == "bf16" else params_q
        t_slice = kw.pop("_slice", None)
        xa_v = xa[:, :t_slice] if t_slice else xa
        sec = _time_cell(config, p, xa_v, opts(budget, **kw), args.iters)
        row = {"variant": name, "budget": budget, "seconds": round(sec, 4),
               "ms_per_token_naive": round(1000 * sec / budget, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        return sec

    slopes = {}
    for name, kw in variants.items():
        try:
            t_lo = cell(name, kw, lo)
            t_hi = cell(name, kw, hi)
        except Exception as e:  # OOM etc: record, keep profiling
            msg = str(e).splitlines()[0][:200]
            rows.append({"variant": name, "error": msg})
            print(json.dumps({"variant": name, "error": msg}), flush=True)
            continue
        finally:
            if name == "bf16_weights":
                holder.clear()   # free the bf16 tree for the int8 cells
        slopes[name] = 1000.0 * (t_hi - t_lo) / (hi - lo)

    t_long = cell("base", {}, args.long_budget)
    base_hi = next(r["seconds"] for r in rows
                   if r["variant"] == "base" and r["budget"] == hi)
    slope_long = 1000.0 * (t_long - base_hi) / (args.long_budget - hi)

    def delta(a, b):
        if a in slopes and b in slopes:
            return round(slopes[a] - slopes[b], 2)
        return None

    summary = {
        "model": args.model, "batch": args.batch,
        "ms_per_step": {k: round(v, 2) for k, v in slopes.items()},
        "ms_per_step_base_long": round(slope_long, 2),
        "attribution_ms": {
            # cross-KV stream beyond 448 frames (what bucketing saves)
            "cross_kv_1500_vs_448": delta("base", "bucket448"),
            # int8 weight stream vs bf16 weight stream
            "int8_weight_saving": delta("bf16_weights", "base"),
            # int8→int4 KV: halving the dominant stream again
            "int4_kv_saving": delta("base", "int4_cross_kv"),
            "logit_rules": delta("base", "rules_off"),
            "ngram_ban": delta("ngram3", "base"),
            # self-cache growth: slope change as mean cache len rises
            "self_cache_growth": round(slope_long - slopes["base"], 2),
        },
    }
    print(json.dumps(summary), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "summary": summary}, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
