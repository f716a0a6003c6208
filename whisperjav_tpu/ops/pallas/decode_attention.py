"""Pallas TPU kernel: single-token cross-attention over int8 K/V.

This is THE decode hot spot: every generated token reads the full
cross-attention K/V (2 × layers × B × T × d bytes — ~6 GB/step for
large-v2 at batch 48 even in int8). The XLA path converts int8→bf16
through an intermediate buffer; this kernel streams the int8 tiles
through VMEM and dequantizes in registers, one (batch, head) block per
grid step:

    q (1, hd) · K (hd, T) → logits → softmax → · Vᵀ (T, hd) → out

Quantization scales are folded OUTSIDE the kernel (q is pre-multiplied
by k_scale, the output post-multiplied by v_scale), so the kernel body
is scale-free. Layout matches models.whisper.model.CrossKV:
(B, H, head_dim, T).

STATUS: experimental, not wired into the decode loop. Measured on v5e
(B=48, H=20, T=1536, int8): 3.2 ms/call vs 44 ms for the same einsum
compiled standalone — but inside the decoder's lax.scan XLA fuses far
better than standalone (whole 32-layer step ≈ 30 ms), so 32 per-layer
pallas dispatches would regress. The path to using this is ONE kernel
per step handling all layers' cross-attention reads, which requires
restructuring the layer scan; candidate for a later round.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)                    # (1, hd)
    k = k_ref[0].astype(jnp.float32)                    # (hd, T)
    logits = jnp.dot(q, k, preferred_element_type=jnp.float32)  # (1, T)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    v = v_ref[0].astype(jnp.float32)                    # (hd, T)
    out = jax.lax.dot_general(
        w, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)             # (1, hd)
    o_ref[0] = out.astype(o_ref.dtype)


@jax.jit
def decode_cross_attention(q: jax.Array, k: jax.Array,
                           v: jax.Array) -> jax.Array:
    """q (B, H, hd) [already k_scale-folded] × K/V (B, H, hd, T) int8/bf16
    → (B, H, hd) in q.dtype (pre v_scale)."""
    b, h, hd = q.shape
    t = k.shape[-1]
    qf = q.reshape(b * h, 1, hd)
    kf = k.reshape(b * h, hd, t)
    vf = v.reshape(b * h, hd, t)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, 1, hd), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, 1, hd), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hd, t), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, hd, t), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hd), lambda i: (i, 0, 0)),
    )(qf, kf, vf)
    return out.reshape(b, h, hd)
