"""Pallas TPU kernel: single-token cross-attention over int8 K/V.

This is THE decode hot spot: every generated token reads the full
cross-attention K/V (2 × layers × B × T × d bytes — ~8 GB/step for
large-v2 at batch 64 even in int8). The XLA einsum path materializes the
int8→bf16 conversion through HBM, tripling the stream (int8 read + bf16
write + bf16 read); this kernel streams the int8 tiles through VMEM and
dequantizes in registers:

    per head h:  q_h (1, hd) · K_h (hd, T) → softmax → · V_hᵀ → (1, hd)

Grid is (B,) with ALL heads of a batch row handled inside one program
(static unroll) — the round-1 version ran one program per (batch, head)
pair and its 1280-program launch overhead (~2 µs each) dominated the
0.3 ms of actual data movement. VMEM per program: 2 × H×hd×T int8
≈ 3.9 MB at T=1536 — fits with double buffering.

Quantization scales are folded OUTSIDE the kernel (q is pre-multiplied
by attention-scale × k_scale, the output post-multiplied by v_scale), so
the kernel body is scale-free. Layout matches
models.whisper.model.CrossKV: (B, H, head_dim, T).

Enable in the decode path with WJAV_PALLAS_DECODE=1 (A/B'd in
docs/ADR-002).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(h: int, hd: int, q_ref, k_ref, v_ref, o_ref):
    # q/o_ref (1, H, hd) f32 per-batch-row blocks (block dims equal the
    # trailing array dims, satisfying the (8, 128) divisibility rule);
    # k/v_ref (1, H*hd, T) int8 per-batch-row blocks
    for i in range(h):                                   # static unroll
        q = q_ref[0, i].reshape(1, hd)
        k = k_ref[0, i * hd:(i + 1) * hd, :].astype(jnp.float32)  # (hd,T)
        logits = jnp.dot(q, k, preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        w = e / jnp.sum(e, axis=-1, keepdims=True)       # (1, T)
        v = v_ref[0, i * hd:(i + 1) * hd, :].astype(jnp.float32)  # (hd,T)
        out = jax.lax.dot_general(
            w, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (1, hd)
        o_ref[0, i] = out[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention_stacked(q: jax.Array, k: jax.Array,
                                   v: jax.Array, layer: jax.Array,
                                   interpret: bool = False) -> jax.Array:
    """Like :func:`decode_cross_attention` but over the FULL layer-stacked
    K/V with the layer index as a scalar-prefetch argument.

    q (B, H, hd) f32 [scales folded] × K/V (L, B, H, hd, T) int8 +
    layer (scalar int32) → (B, H, hd) f32.

    Why: inside the decoder's ``lax.scan`` over layers, per-layer K/V
    slices arriving as scan inputs get MATERIALIZED by XLA before the
    kernel (measured 0.85 ms/layer vs 0.27 ms with loop-invariant
    operands — the slice copy re-adds the read+write the kernel exists
    to avoid). Keeping the stacked array loop-invariant and letting the
    BlockSpec index_map select ``layer`` makes the DMA read straight
    from the persistent HBM buffer.
    """
    l, b, h, hd = k.shape[:4]
    t = k.shape[-1]
    qf = q.astype(jnp.float32)
    kf = k.reshape(l, b, h * hd, t)
    vf = v.reshape(l, b, h * hd, t)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda i, l_ref: (i, 0, 0)),
            pl.BlockSpec((1, 1, h * hd, t),
                         lambda i, l_ref: (l_ref[0], i, 0, 0)),
            pl.BlockSpec((1, 1, h * hd, t),
                         lambda i, l_ref: (l_ref[0], i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, hd), lambda i, l_ref: (i, 0, 0)),
    )

    def kernel(l_ref, q_ref, k_ref, v_ref, o_ref):
        # same body as _kernel, with the extra leading layer dim on the
        # k/v blocks sliced at the ref level (no whole-block load)
        for i in range(h):
            qh = q_ref[0, i].reshape(1, hd)
            kk = k_ref[0, 0, i * hd:(i + 1) * hd, :].astype(jnp.float32)
            logits = jnp.dot(qh, kk, preferred_element_type=jnp.float32)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            vv = v_ref[0, 0, i * hd:(i + 1) * hd, :].astype(jnp.float32)
            out_h = jax.lax.dot_general(
                w, vv, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, i] = out_h[0]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * hd * t,
            bytes_accessed=2 * b * h * hd * t + 8 * b * h * hd,
            transcendentals=b * h * t),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), qf, kf, vf)
    return out


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_cross_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           interpret: bool = False) -> jax.Array:
    """q (B, H, hd) f32 [attention-scale and k_scale already folded in]
    × K/V (B, H, hd, T) int8 → (B, H, hd) f32 (pre v_scale)."""
    b, h, hd = q.shape
    t = k.shape[-1]
    qf = q.astype(jnp.float32)
    kf = k.reshape(b, h * hd, t)
    vf = v.reshape(b, h * hd, t)
    out = pl.pallas_call(
        functools.partial(_kernel, h, hd),
        out_shape=jax.ShapeDtypeStruct((b, h, hd), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h * hd, t), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h * hd, t), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, hd), lambda i: (i, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * hd * t,
            bytes_accessed=2 * b * h * hd * t + 8 * b * h * hd,
            transcendentals=b * h * t),
        interpret=interpret,
    )(qf, kf, vf)
    return out
