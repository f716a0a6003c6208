"""Fused per-layer decode kernels: whole sub-blocks in ONE pallas launch.

Motivation (docs/ADR-002 round-4 roofline): at the greedy headline config
the decode step streams ~10 GB through HBM (floor ≈12.3 ms/step) but
measures ~41 ms — and the gap was shown by elimination to be
per-op scheduling/dispatch pressure, not bytes (fused QKV neutral,
column-cache landed, per-op pallas kernels lose to XLA's in-context
fusion). Each decoder layer is ~20 small XLA ops at q_len == 1; these
kernels collapse a layer to THREE launches:

  * self_block_stacked — layernorm + fused-QKV projection + column-mode
    causal attention over the self-KV cache (read-only, new-key logit
    concatenated) + out-projection + residual, emitting the new K/V
    columns for the step body's single stacked cache write.
  * cross_block_stacked — layernorm + q-projection + cross-attention
    over int8 K/V (flash-style, scales folded in registers) +
    out-projection + residual.
  * mlp_block_stacked — layernorm + GELU MLP + residual, tiled over the
    hidden (4d) axis so the int8 weight blocks fit VMEM.

All three read layer-stacked operands (weights (L, …), caches
(L, B, …)) selected by a scalar-prefetch layer index — the pattern
measured in decode_attention.py: per-layer slices arriving as scan
inputs get materialized by XLA first, while loop-invariant stacked
operands are DMA'd straight from the persistent HBM buffer.

Layout note: Mosaic requires a block's last two dims to be (8, 128)
-divisible or equal to the array's dims — so every operand blocked
along batch/layer carries a singleton middle axis ((B, 1, d) rows,
(L, 1, d) vectors) keeping the blocked dim out of the trailing two.

Requires the production decode representation: int8 decoder weights
(models/whisper/quant.py dicts), fused QKV, int8 cross-KV, column-cache
mode, q_len == 1, no beam folding. Enable with WJAV_PALLAS_FUSE=
self,cross,mlp (or "all"); A/B'd per sub-kernel in docs/ADR-002.

Replaces the role CTranslate2's fused C++/CUDA decoder ops play in the
reference (whisperjav/modules/faster_whisper_pro_asr.py:14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30  # masked logit; exp underflows to exactly 0.0 in f32


def _ln(x32, s, b, eps=1e-5):
    """f32 layernorm over the last axis; s/b are (1, d) f32 arrays."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * s + b


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation, max abs error
    1.5e-7 (f32-epsilon class). Mosaic has no erf/erfc lowering, so the
    exact-GELU path computes it explicitly; drift vs XLA's erf is at
    float epsilon (parity suite observes identical tokens)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return x * 0.5 * (1.0 + _erf(x * (2.0 ** -0.5)))


def _qdense(h32, wq, ws, b=None):
    """(1, in) f32 · int8 (in, out) → (1, out) f32 with per-output
    -channel dequant scales (1, out); bias optional (1, out)."""
    out = jnp.dot(h32, wq.astype(jnp.float32),
                  preferred_element_type=jnp.float32) * ws
    if b is not None:
        out = out + b
    return out


def self_block_stacked(x, ln_s, ln_b, wqkv, bqkv, wo, bo,
                       cache_k, cache_v, layer, pos, n_head: int,
                       interpret: bool = False):
    """Column-mode causal self-attention block for one decode step.

    x (B, d) × stacked params (L, …) × cache (L, B, T, d) →
    (x_out (B, d), k_new (B, d), v_new (B, d)); k/v_new are this
    layer's new cache columns (cache dtype), written by the caller with
    one stacked dynamic_update_slice (models/whisper/model.py column
    mode). Math matches _decoder_block(column_mode=True) exactly: the
    cached slot at ``pos`` is masked and the new key's logit is
    concatenated, so the logit set equals insert-then-attend.
    """
    b, d = x.shape
    t = cache_k.shape[2]
    hd = d // n_head
    scale = hd ** -0.5

    def kernel(l_ref, p_ref, x_ref, lns_ref, lnb_ref, wq_ref, ws_ref,
               bqkv_ref, wo_ref, wos_ref, bo_ref, ck_ref, cv_ref,
               xo_ref, kn_ref, vn_ref):
        p = p_ref[0]
        x32 = x_ref[0].astype(jnp.float32)                    # (1, d)
        h = _ln(x32, lns_ref[0].astype(jnp.float32),
                lnb_ref[0].astype(jnp.float32))
        qkv = _qdense(h, wq_ref[0], ws_ref[0].astype(jnp.float32),
                      bqkv_ref[0].astype(jnp.float32))        # (1, 3d)
        visible = (jax.lax.broadcasted_iota(jnp.int32, (1, t), 1) < p)
        outs = []
        for i in range(n_head):
            qh = qkv[:, i * hd:(i + 1) * hd] * scale          # (1, hd)
            kn_h = qkv[:, d + i * hd:d + (i + 1) * hd]
            vn_h = qkv[:, 2 * d + i * hd:2 * d + (i + 1) * hd]
            kc = ck_ref[0, 0, :, i * hd:(i + 1) * hd].astype(jnp.float32)
            vc = cv_ref[0, 0, :, i * hd:(i + 1) * hd].astype(jnp.float32)
            logits = jax.lax.dot_general(                     # (1, T)
                qh, kc, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            logits = jnp.where(visible, logits, _NEG)
            logit_n = jnp.sum(qh * kn_h, axis=-1, keepdims=True)
            m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True),
                            logit_n)
            ec = jnp.exp(logits - m)                          # (1, T)
            en = jnp.exp(logit_n - m)                         # (1, 1)
            denom = jnp.sum(ec, axis=-1, keepdims=True) + en
            out_h = (jnp.dot(ec, vc, preferred_element_type=jnp.float32)
                     + en * vn_h) / denom                     # (1, hd)
            outs.append(out_h)
        a = jnp.concatenate(outs, axis=-1)                    # (1, d)
        y = _qdense(a, wo_ref[0], wos_ref[0].astype(jnp.float32),
                    bo_ref[0].astype(jnp.float32))
        xo_ref[0] = (x32 + y).astype(xo_ref.dtype)
        kn_ref[0] = qkv[:, d:2 * d].astype(kn_ref.dtype)
        vn_ref[0] = qkv[:, 2 * d:].astype(vn_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i, lr, pr: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr, pr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr, pr: (lr[0], 0, 0)),
            pl.BlockSpec((1, d, 3 * d), lambda i, lr, pr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, 3 * d), lambda i, lr, pr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, 3 * d), lambda i, lr, pr: (lr[0], 0, 0)),
            pl.BlockSpec((1, d, d), lambda i, lr, pr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr, pr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr, pr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, lr, pr: (lr[0], i, 0, 0)),
            pl.BlockSpec((1, 1, t, d), lambda i, lr, pr: (lr[0], i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, d), lambda i, lr, pr: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr, pr: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr, pr: (i, 0, 0)),
        ],
    )
    cache_dt = cache_k.dtype
    xo, kn, vn = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, 1, d), x.dtype),
                   jax.ShapeDtypeStruct((b, 1, d), cache_dt),
                   jax.ShapeDtypeStruct((b, 1, d), cache_dt)],
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * 4 * d + 4 * b * t * d,
            bytes_accessed=4 * d * d + 4 * b * t * d,
            transcendentals=b * n_head * t),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      jnp.asarray(pos, jnp.int32).reshape(1),
      x[:, None], ln_s[:, None], ln_b[:, None],
      wqkv["q"], wqkv["s"], bqkv[:, None],
      wo["q"], wo["s"], bo[:, None], cache_k, cache_v)
    return xo[:, 0], kn[:, 0], vn[:, 0]


def cross_block_stacked(x, ln_s, ln_b, cwq, cbq, cwo, cbo,
                        ck, cv, k_scale, v_scale, layer, n_head: int,
                        interpret: bool = False):
    """Cross-attention block: ln + q-proj + int8 flash attention + out
    -proj + residual in one launch.

    x (B, d) × ck/cv (L, B, H·hd, T) int8 × scales (L, B, H) f32 →
    x_out (B, d). Scales fold in registers: k_scale into the per-head
    query (constant over T commutes with the dot), v_scale onto the
    per-head output.
    """
    b, d = x.shape
    t = ck.shape[-1]
    hd = d // n_head
    scale = hd ** -0.5

    def kernel(l_ref, x_ref, lns_ref, lnb_ref, wq_ref, wqs_ref, bq_ref,
               wo_ref, wos_ref, bo_ref, k_ref, v_ref, ks_ref, vs_ref,
               xo_ref):
        x32 = x_ref[0].astype(jnp.float32)
        h = _ln(x32, lns_ref[0].astype(jnp.float32),
                lnb_ref[0].astype(jnp.float32))
        q = _qdense(h, wq_ref[0], wqs_ref[0].astype(jnp.float32),
                    bq_ref[0].astype(jnp.float32))            # (1, d)
        outs = []
        for i in range(n_head):
            qh = q[:, i * hd:(i + 1) * hd] * (scale * ks_ref[0, 0, 0, i])
            kk = k_ref[0, 0, i * hd:(i + 1) * hd, :].astype(jnp.float32)
            logits = jnp.dot(qh, kk,                          # (1, T)
                             preferred_element_type=jnp.float32)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            vv = v_ref[0, 0, i * hd:(i + 1) * hd, :].astype(jnp.float32)
            out_h = jax.lax.dot_general(                      # (1, hd)
                w, vv, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs.append(out_h * vs_ref[0, 0, 0, i])
        a = jnp.concatenate(outs, axis=-1)
        y = _qdense(a, wo_ref[0], wos_ref[0].astype(jnp.float32),
                    bo_ref[0].astype(jnp.float32))
        xo_ref[0] = (x32 + y).astype(xo_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i, lr: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, d, d), lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, d, d), lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d, t), lambda i, lr: (lr[0], i, 0, 0)),
            pl.BlockSpec((1, 1, d, t), lambda i, lr: (lr[0], i, 0, 0)),
            pl.BlockSpec((1, 1, 1, n_head), lambda i, lr: (lr[0], i, 0, 0)),
            pl.BlockSpec((1, 1, 1, n_head), lambda i, lr: (lr[0], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, d), lambda i, lr: (i, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, d), x.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * d * t + 4 * b * d * d,
            bytes_accessed=2 * b * d * t + 4 * d * d,
            transcendentals=b * n_head * t),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x[:, None], ln_s[:, None], ln_b[:, None],
      cwq["q"], cwq["s"], cbq[:, None],
      cwo["q"], cwo["s"], cbo[:, None],
      ck, cv, k_scale[:, :, None], v_scale[:, :, None])
    return out[:, 0]


def mlp_block_stacked(x, ln_s, ln_b, w1, b1, w2, b2, layer,
                      interpret: bool = False):
    """GELU MLP block, tiled over the hidden (4d) axis.

    Grid is (B, 4) with the hidden axis split into d-wide tiles so each
    int8 weight block is (d, d); partial contributions accumulate in an
    f32 scratch and the residual lands on the last tile. w2's per
    -output-channel scale commutes with the hidden-axis sum, so it
    applies once after accumulation — identical math to the XLA path.
    """
    b, d = x.shape
    mlp = b1.shape[-1]
    assert mlp % d == 0, (mlp, d)
    n_tiles = mlp // d

    def kernel(l_ref, x_ref, lns_ref, lnb_ref, w1_ref, w1s_ref, b1_ref,
               w2_ref, w2s_ref, b2_ref, xo_ref, acc):
        j = pl.program_id(1)
        x32 = x_ref[0].astype(jnp.float32)
        h = _ln(x32, lns_ref[0].astype(jnp.float32),
                lnb_ref[0].astype(jnp.float32))
        part = _qdense(h, w1_ref[0], w1s_ref[0].astype(jnp.float32),
                       b1_ref[0].astype(jnp.float32))         # (1, d)
        part = _gelu_exact(part)
        contrib = jnp.dot(part, w2_ref[0].astype(jnp.float32),
                          preferred_element_type=jnp.float32)  # (1, d)

        @pl.when(j == 0)
        def _():
            acc[:] = contrib

        @pl.when(j > 0)
        def _():
            acc[:] = acc[:] + contrib

        @pl.when(j == n_tiles - 1)
        def _():
            y = (acc[:] * w2s_ref[0].astype(jnp.float32)
                 + b2_ref[0].astype(jnp.float32))
            xo_ref[0] = (x32 + y).astype(xo_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, d), lambda i, j, lr: (i, 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, d, d), lambda i, j, lr: (lr[0], 0, j)),
            pl.BlockSpec((1, 1, d), lambda i, j, lr: (lr[0], 0, j)),
            pl.BlockSpec((1, 1, d), lambda i, j, lr: (lr[0], 0, j)),
            pl.BlockSpec((1, d, d), lambda i, j, lr: (lr[0], j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j, lr: (lr[0], 0, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j, lr: (lr[0], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, d), lambda i, j, lr: (i, 0, 0)),
        scratch_shapes=[pltpu.VMEM((1, d), jnp.float32)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, d), x.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * d * mlp,
            bytes_accessed=2 * d * mlp + 2 * b * d,
            transcendentals=b * mlp),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1),
      x[:, None], ln_s[:, None], ln_b[:, None],
      w1["q"], w1["s"], b1[:, None], w2["q"], w2["s"], b2[:, None])
    return out[:, 0]
