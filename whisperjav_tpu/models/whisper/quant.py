"""Weight quantization for the decode-hot path.

Decoder weights are the second-largest per-token HBM stream after the
cross-attention K/V (~1.3 GB/step bf16 for large-v2). This module
symmetric-int8-quantizes the decoder block matmuls per output channel —
``dense()`` fuses the dequant into the matmul — and adds a quantized
LM-head copy for the logits projection (the bf16 token embedding stays
for lookups). The encoder is left untouched: it is compute-bound and
amortizes weight reads over 1500 positions.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# decoder block matmuls read EVERY step; cwk/cwv are excluded — they run
# once per segment in precompute_cross_kv
_DECODE_HOT = ("wq", "wk", "wv", "wo", "cwq", "cwo", "w1", "w2")


def _quantize(w: jax.Array) -> Dict[str, jax.Array]:
    """(…, in, out) → {"q": int8, "s": (…, 1, out) f32} symmetric."""
    w32 = jnp.asarray(w, jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return {"q": q, "s": s}


def fuse_qkv_weights(params: Dict[str, Any]) -> Dict[str, Any]:
    """Concatenate each decoder block's self-attention q/k/v projections
    into one stacked (L, d, 3d) matmul (``wqkv``/``bqkv``).

    One kernel per layer per decode step instead of three — the decode
    loop's matmuls are tiny (B×d×d), so launch/bookkeeping overhead is
    a real share of step time (docs/ADR-002 attribution). Mathematically
    identical to the separate projections: each output column's dot
    product is over the same K axis, and k's bias slot is zeros (the
    whisper k projection has no bias); XLA may re-block the wider
    reduction, so agreement is exact in tokens and float-epsilon in
    logits. Apply BEFORE
    :func:`quantize_decoder_weights` — per-output-channel scales make
    quantize(concat) == concat(quantize).
    """
    out = dict(params)
    dec = dict(params["decoder"])
    blocks = dict(dec["blocks"])
    wq, wk, wv = blocks.pop("wq"), blocks.pop("wk"), blocks.pop("wv")
    bq, bv = blocks.pop("bq"), blocks.pop("bv")
    blocks["wqkv"] = jnp.concatenate([jnp.asarray(wq), jnp.asarray(wk),
                                      jnp.asarray(wv)], axis=-1)
    zero_bk = jnp.zeros_like(jnp.asarray(bq))
    blocks["bqkv"] = jnp.concatenate([jnp.asarray(bq), zero_bk,
                                      jnp.asarray(bv)], axis=-1)
    dec["blocks"] = blocks
    out["decoder"] = dec
    return out


def quantize_decoder_weights(params: Dict[str, Any]) -> Dict[str, Any]:
    """Return a new param tree with int8 decoder matmuls + lm_head_q."""
    out = dict(params)
    dec = dict(params["decoder"])
    blocks = dict(dec["blocks"])
    hot = (("wqkv",) + tuple(n for n in _DECODE_HOT
                             if n not in ("wq", "wk", "wv"))
           if "wqkv" in blocks else _DECODE_HOT)
    for name in hot:
        blocks[name] = _quantize(blocks[name])
    dec["blocks"] = blocks
    dec["lm_head_q"] = _quantize(jnp.asarray(dec["tok_emb"]).T)
    out["decoder"] = dec
    return out
