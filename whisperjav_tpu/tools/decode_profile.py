"""Decode step-time attribution by controlled ablation (ADR-002 §Next).

The tunnel blocks ``jax.profiler``, so this tool measures what a trace
would show by differencing: each variant changes ONE cost source, and
every (variant, budget) cell is timed end-to-end with forced
materialization.  Two token budgets per variant give

    seconds(budget) = intercept + slope * steps

so ``slope`` is the true ms/step with the per-batch fixed work
(cross-KV precompute, prefill, upload) removed, and differences of
slopes against ``base`` attribute the per-step cost of the ablated
component (cross-KV stream length, int8 weight dequant, int4 KV
packing, logit rules, gumbel RNG, self-cache size).

Round-3 methodology upgrade: the step budget is a TRACED loop bound
(``decode_greedy(..., stop_at=b)``), so both budgets of a slope pair
run the SAME executable — same cache allocation, same compile — and
the slope is a pure per-step cost, uncontaminated by the cache-size
difference the old per-budget compiles carried. This also halves
per-group executable residency (one program per variant, not two),
which is what lets a group hold three variants without OOM.

Timing discipline: the tunnel's throughput drifts over minutes, so
cells are NOT timed in variant order — after a compile/warmup sweep,
the timed runs INTERLEAVE all cells round-robin for ``--iters`` rounds
and take the per-cell median.  Drift then biases every variant equally
and slope differences stay meaningful.  (The round-2 grouped-order run
showed rules_off "slower than base" purely from drift.)

The one exception is ``bf16_weights``: holding the bf16 decoder tree
and the int8 tree simultaneously OOMs large-v2 at batch 64, so its two
cells run in a separate phase first and the tree is freed before the
interleaved phase.  Its delta is therefore drift-exposed; treat it as
a bound, not a point estimate.

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
        fuse_qkv_weights, quantize_decoder_weights,
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
    # production tree (engine._prepare fuses q/k/v by default): the
    # fused_qkv variant measures the per-step kernel-count saving
    params_qf = jax.jit(
        lambda t: quantize_decoder_weights(fuse_qkv_weights(t)))(params)
    jax.block_until_ready(params_q)

    # encoder output stand-in: decode cost does not depend on xa values
    xa = jax.jit(
        lambda k: 0.1 * jax.random.normal(
            k, (batch, config.n_audio_ctx, config.n_audio_state),
            jnp.bfloat16)
    )(jax.random.PRNGKey(1))
    return config, params, params_q, params_qf, xa


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v2")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--budgets", type=int, nargs=2, default=(32, 128))
    ap.add_argument("--mid-budget", type=int, default=80,
                    help="extra base cell: early (lo→mid) vs late "
                         "(mid→hi) slope difference isolates self-cache "
                         "growth. (Budgets past ~160 OOM large-v2 at "
                         "batch 64 — the eager cross-KV + cache "
                         "arguments alone are ~12 GB.)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--group", type=int, default=None,
                    help="run only this phase-2 group index (the axon "
                         "backend does not release executables on "
                         "jax.clear_caches(), so a 4-group run "
                         "accumulates HBM and later groups OOM — run "
                         "one group per process instead)")
    ap.add_argument("--skip-bf16", action="store_true",
                    help="skip the separate bf16-weights phase")
    args = ap.parse_args(argv)

    import jax

    from whisperjav_tpu.models.whisper.decode import (
        DecodeOptions, decode_greedy,
    )

    cache_dir = ".jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import sys

    def mark(msg):
        print(f"decode_profile: {msg}", file=sys.stderr, flush=True)

    mark("building params (first device contact — a silent hang here "
         "is the tunnel claim wedge)")
    config, params, params_q, params_qf, xa = _build(args.model,
                                                     args.batch)
    mark("params ready")
    lo, hi = args.budgets

    def opts(budget, **kw):
        # EOT is suppressed in EVERY cell: the greedy loop early-exits
        # when all rows finish, and with random weights the timestamp
        # rules drive rows to EOT at trajectory-dependent steps — the
        # seconds(budget) curve goes concave and slopes stop being
        # per-step costs. Banning EOT pins every cell to exactly
        # `budget` steps.
        base = dict(max_new_tokens=budget, cross_kv_int8=True,
                    no_repeat_ngram_size=0,
                    suppress_tokens=(config.eot,))
        base.update(kw)
        if not base.get("suppress_tokens"):
            base["suppress_tokens"] = (config.eot,)   # rules_off too
        return DecodeOptions(**base)

    variants = {
        "base": dict(),
        "bucket448": dict(_slice=448),
        "bucket960": dict(_slice=960),
        # nibble-packed int4: halves the int8 KV stream again
        "int4_cross_kv": dict(cross_kv_int8=False, cross_kv_int4=True),
        "rules_off": dict(with_timestamps=False, suppress_blank=False,
                          suppress_tokens=()),
        "ngram3": dict(no_repeat_ngram_size=3),
        # per-step (B, V) threefry gumbel draw (kept even at T=0 so the
        # fallback ladder shares one program) — how much does it cost?
        "no_gumbel": dict(assume_greedy=True),
        # self-cache T_max ablation: allocate the cache at 32 new tokens
        # instead of `hi`; compared against base AT stop_at=lo (same step
        # count), the absolute gap ÷ lo is the per-step stream cost of
        # the extra (hi - 32) cache positions all 32 layers read
        "cache32": dict(_max_new=32),
        # layer-count ablation: blocks are scan-stacked on a leading
        # axis, so slicing them yields a structurally identical smaller
        # decoder. ms/step is ~affine in L; the extrapolated L→0
        # intercept is the per-STEP fixed cost (loop/dispatch/logit
        # head) that no per-layer stream ablation can see.
        "layers16": dict(_layers=16),
        "layers8": dict(_layers=8),
        # production weight-prep tree: q/k/v fused into one (d, 3d)
        # matmul per layer (quant.py:fuse_qkv_weights) — delta vs base
        # is the per-step kernel-count cost of the separate projections.
        # (For the scan-unroll A/B, run this tool twice with
        # WJAV_SCAN_UNROLL=1 vs =4 and compare the base controls —
        # the unroll global is read at trace time and does not key the
        # jit cache, so it cannot be an in-process variant.)
        "fused_qkv": dict(_tree="fused"),
    }
    variants = {n: kw for n, kw in variants.items()
                if kw.get("_layers", 0) < config.n_text_layer}

    rows: List[Dict] = []
    failed = set()

    def make_variant(p, kw):
        """One variant = ONE executable; the budget rides the traced
        stop_at bound, so every (variant, budget) cell shares it."""
        kw = dict(kw)
        t_slice = kw.pop("_slice", None)
        n_layers = kw.pop("_layers", None)
        max_new = kw.pop("_max_new", hi)
        if kw.pop("_tree", None) == "fused":
            p = params_qf
        xa_v = xa[:, :t_slice] if t_slice else xa
        cfg = config
        if n_layers:
            import dataclasses

            import jax as _jax
            cfg = dataclasses.replace(config, n_text_layer=n_layers)
            p = {"decoder": dict(p["decoder"])}
            p["decoder"]["blocks"] = _jax.tree.map(
                lambda a: a[:n_layers], p["decoder"]["blocks"])
        o = opts(max_new, **kw)

        def run(budget):
            res = decode_greedy(p, cfg, xa_v, o,
                                stop_at=min(budget, max_new))
            np.asarray(res.tokens)        # tunnel-proof materialization
        return run

    def make_run(p, kw, budget):
        v = make_variant(p, kw)
        return lambda: v(budget)

    def timed(run):
        t0 = time.time()
        run()
        return time.time() - t0

    def emit(name, budget, sec):
        row = {"variant": name, "budget": budget,
               "seconds": round(sec, 4),
               "ms_per_token_naive": round(1000 * sec / budget, 3)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # ---- phase 1: bf16 weights alone (can't coexist with int8 tree) ----
    slopes: Dict[str, float] = {}
    runs = None
    if not args.skip_bf16:
        try:
            runs = {b: make_run(params, {}, b) for b in (lo, hi)}
            for b, r in runs.items():
                r()                                 # compile + warm
            t = {b: float(np.median([timed(r)
                                     for _ in range(args.iters)]))
                 for b, r in runs.items()}
            for b in (lo, hi):
                emit("bf16_weights", b, t[b])
            slopes["bf16_weights"] = (1000.0 * (t[hi] - t[lo])
                                      / (hi - lo))
        except Exception as e:
            msg = str(e).splitlines()[0][:200]
            rows.append({"variant": "bf16_weights", "error": msg})
            print(json.dumps({"variant": "bf16_weights", "error": msg}),
                  flush=True)
    del params, runs                 # free the bf16 tree before phase 2
    import gc
    gc.collect()
    jax.clear_caches()   # drop phase-1 executables' on-chip footprint

    # ---- phase 2: small interleaved groups on the int8 tree ----
    # Each decode run peaks near the whole chip (int8 cross-KV ~7.9 GB
    # + cache + ~5-8 GB HLO temp at large-v2/B=64), and every live
    # executable keeps code+constants resident — holding ALL variants'
    # programs at once OOMs. So variants are interleaved in SMALL
    # groups, each with its own fresh base control (drift cancels
    # group-locally), and jax.clear_caches() runs between groups; the
    # persistent compilation cache makes the recompiles cheap.
    groups = [["bucket448", "bucket960"],
              ["int4_cross_kv", "rules_off"],
              ["ngram3", "no_gumbel", "__mid__"],
              ["layers16", "layers8"],
              ["cache32"],
              ["fused_qkv"]]
    group_base: Dict[int, float] = {}
    med: Dict[tuple, float] = {}
    slope_early = slope_late = None
    cache32_ms = None

    for gi, names in enumerate(groups):
        if args.group is not None and gi != args.group:
            continue
        gcells: Dict[tuple, object] = {}
        for b in (lo, hi):
            gcells[("base", b)] = make_run(params_q, {}, b)
        for name in names:
            if name == "__mid__":
                gcells[("base", args.mid_budget)] = make_run(
                    params_q, {}, args.mid_budget)
            elif name == "cache32":
                # single-budget cell: compared against base at the SAME
                # step count (lo), so the delta is pure cache-size cost
                gcells[(name, lo)] = make_run(params_q,
                                              variants[name], lo)
            elif name in variants:
                for b in (lo, hi):
                    gcells[(name, b)] = make_run(params_q,
                                                 variants[name], b)

        for key in list(gcells):
            try:
                mark(f"warmup {key}")
                gcells[key]()                       # compile + warm
            except Exception as e:
                msg = str(e).splitlines()[0][:200]
                rows.append({"variant": key[0], "budget": key[1],
                             "error": msg})
                print(json.dumps({"variant": key[0], "budget": key[1],
                                  "error": msg}), flush=True)
                failed.add(key)
                del gcells[key]

        samples: Dict[tuple, List[float]] = {k: [] for k in gcells}
        for _ in range(args.iters):                 # round-robin rounds
            for key, run in list(gcells.items()):
                try:
                    samples[key].append(timed(run))
                except Exception as e:
                    msg = str(e).splitlines()[0][:200]
                    rows.append({"variant": key[0], "budget": key[1],
                                 "error": msg})
                    print(json.dumps({"variant": key[0],
                                      "budget": key[1], "error": msg}),
                          flush=True)
                    del gcells[key], samples[key]

        gmed = {k: float(np.median(v)) for k, v in samples.items()
                if v}
        for (name, b), sec in gmed.items():
            emit(f"{name}@g{gi}", b, sec)
        if ("base", lo) in gmed and ("base", hi) in gmed:
            group_base[gi] = (1000.0 * (gmed[("base", hi)]
                                        - gmed[("base", lo)]) / (hi - lo))
            # self-cache growth (only the group holding the mid cell):
            # late slope (mid→hi) minus early slope (lo→mid), all three
            # cells same-group so drift cancels
            k_mid = ("base", args.mid_budget)
            if k_mid in gmed:
                slope_early = (1000.0 * (gmed[k_mid] - gmed[("base", lo)])
                               / (args.mid_budget - lo))
                slope_late = (1000.0 * (gmed[("base", hi)] - gmed[k_mid])
                              / (hi - args.mid_budget))
        if ("cache32", lo) in gmed and ("base", lo) in gmed:
            cache32_ms = (1000.0 * (gmed[("base", lo)]
                                    - gmed[("cache32", lo)]) / lo)
        for name in names:
            k_lo, k_hi = (name, lo), (name, hi)
            if k_lo in gmed and k_hi in gmed:
                # variant slope, shifted so its delta is vs the GROUP
                # base but comparable to the global base scale
                slopes[name] = (1000.0 * (gmed[k_hi] - gmed[k_lo])
                                / (hi - lo))
                slopes[f"base@g{gi}"] = group_base.get(gi)
        med.update(gmed)
        del gcells, samples
        gc.collect()
        jax.clear_caches()

    # global base slope = median of the per-group base controls
    base_vals = [v for v in group_base.values() if v is not None]
    if base_vals:
        slopes["base"] = float(np.median(base_vals))

    def gdelta(name):
        """variant minus its own group's base control."""
        for gi, names in enumerate(groups):
            if name in names and name in slopes and gi in group_base:
                return slopes[name] - group_base[gi]
        return None

    def _neg(v):
        return -v if v is not None else None

    def r2(v):
        return round(v, 2) if v is not None else None

    summary = {
        "model": args.model, "batch": args.batch,
        "groups": groups,
        "ms_per_step": {k: round(v, 2) for k, v in slopes.items()
                        if v is not None},
        "ms_per_step_base_early": r2(slope_early),
        "ms_per_step_base_late": r2(slope_late),
        "attribution_ms": {
            # every delta is variant minus its OWN group's base control
            # (same-minute pair — tunnel drift cancels)
            "cross_kv_1500_vs_448": r2(_neg(gdelta("bucket448"))),
            "cross_kv_1500_vs_960": r2(_neg(gdelta("bucket960"))),
            # int8 weight stream vs bf16 (phase-boundary: bound only)
            "int8_weight_saving": (
                r2(slopes["bf16_weights"] - slopes["base"])
                if "bf16_weights" in slopes and "base" in slopes
                else None),
            # int8→packed-int4 KV: halving the dominant stream again
            "int4_kv_saving": r2(_neg(gdelta("int4_cross_kv"))),
            "logit_rules": r2(_neg(gdelta("rules_off"))),
            "ngram_ban": r2(gdelta("ngram3")),
            # per-step (B, V) threefry gumbel draw
            "gumbel_rng": r2(_neg(gdelta("no_gumbel"))),
            # self-cache stream: cost of the (hi − 32) extra cache
            # positions every layer reads, from the cache32 cell
            "self_cache_tmax": r2(cache32_ms),
            # with the traced stop_at the budgets share one executable,
            # so early-vs-late slope is a pure drift check (should be ~0)
            "self_cache_growth": (r2(slope_late - slope_early)
                                  if slope_early is not None else None),
        },
    }
    # affine fit ms/step = a*L + b over the layer ablation: `a` is the
    # true per-layer cost, `b` the per-step fixed cost (loop overhead,
    # logit head, rule masks) invisible to stream ablations. All three
    # points come from the layer group's own cells/control (group 3).
    layer_gi = next((gi for gi, names in enumerate(groups)
                     if "layers8" in names), None)
    pts = []
    if layer_gi is not None and layer_gi in group_base:
        pts.append((config.n_text_layer, group_base[layer_gi]))
    for l, n in ((16, "layers16"), (8, "layers8")):
        if n in slopes:
            pts.append((l, slopes[n]))
    if len(pts) >= 2:
        a, b = np.polyfit([p[0] for p in pts], [p[1] for p in pts], 1)
        summary["layer_decomposition"] = {
            "ms_per_layer": round(float(a), 3),
            "ms_fixed_per_step": round(float(b), 2),
            "points": {str(l): round(s, 2) for l, s in pts}}

    print(json.dumps(summary), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"rows": rows, "summary": summary}, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
