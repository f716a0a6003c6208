"""Pallas TPU kernel: fused bidirectional attention for the encoder.

The Whisper encoder attends over a fixed T=1500 frames with head_dim 64;
K and V for one (batch, head) fit comfortably in VMEM (~190 KB each in
bf16), so the kernel uses the simple-and-fast shape for this regime:
grid over (batch·heads, query blocks), K/V resident per grid row, the
full (block_q, T) logits tile materialized in VMEM — one fused
QKᵀ → softmax → ·V pipeline with no HBM round-trip for the attention
matrix. Sequence lengths that don't tile (1500) are padded to the block
multiple and padded KEY columns are masked to -inf inside the kernel.

Numerics match whisperjav_tpu.models.whisper.model.attention (same
q/k pre-scaling, f32 softmax). :func:`encoder_attention` is a drop-in
for the einsum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 t_valid: int):
    # q (1, bq, hd) · k/v (1, T_pad, hd) → o (1, bq, hd)
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32) * scale
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (bq, T_pad)
    t_pad = logits.shape[-1]
    if t_valid < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < t_valid, logits, -jnp.inf)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(w.astype(v_ref.dtype), v_ref[0],
                preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("t_valid", "block_q"))
def _flash(q, k, v, t_valid: int, block_q: int):
    bh, t_pad, hd = q.shape
    scale = hd ** -0.25
    grid = (bh, t_pad // block_q)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, t_valid=t_valid),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_pad, hd), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda i, j: (i, j, 0)),
    )(q, k, v)


def encoder_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      block_q: int = DEFAULT_BLOCK_Q) -> jax.Array:
    """Fused attention, (B, T, H, hd) layout, any T (padded internally)."""
    b, t, h, hd = q.shape
    bq = min(block_q, max(128, 1 << (t - 1).bit_length()))
    t_pad = ((t + bq - 1) // bq) * bq
    pad = t_pad - t

    def to_bh(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, t, hd)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x

    out = _flash(to_bh(q), to_bh(k), to_bh(v), t_valid=t, block_q=bq)
    out = out[:, :t].reshape(b, h, t, hd)
    return jnp.swapaxes(out, 1, 2)
