"""Whisper encoder-decoder in pure functional JAX.

Replaces the reference's CTranslate2/torch inference engines
(reference: whisperjav/modules/faster_whisper_pro_asr.py:31,
whisperjav/modules/whisper_pro_asr.py:29) with a TPU-first design:

- parameters are a plain pytree with **per-layer leaves stacked on a
  leading axis**, so all transformer blocks run under one ``lax.scan``
  (one traced block regardless of depth — fast compiles for 32-layer
  encoders, friendly to pjit sharding rules);
- matmuls accumulate in float32 via ``preferred_element_type`` while
  weights/activations default to bfloat16 on TPU;
- decoding uses a fixed-shape KV cache updated functionally inside the
  scan (no dynamic shapes anywhere), with cross-attention K/V precomputed
  once per audio segment.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.models.whisper.config import WhisperConfig

# opt-in pallas decode cross-attention (docs/ADR-002; read once at
# import so the flag is trace-time static)
_PALLAS_DECODE = os.environ.get("WJAV_PALLAS_DECODE", "0") == "1"

# opt-in carry-cache decode: thread the FULL stacked self-KV cache
# through the layer scan as a carry (in-place aliased) instead of
# xs/ys (which stacks a full cache copy as scan output every step) —
# docs/ADR-002 attribution probe suggests the cache shuffle is a large
# share of the unattributed ~26 ms/step
_CARRY_CACHE = os.environ.get("WJAV_CARRY_CACHE", "0") == "1"

# decoder layer-scan unroll factor (A/B knob, docs/ADR-002): each decode
# step runs a 32-iteration layer scan of small ops; unrolling lets XLA
# schedule/fuse across layer boundaries and amortize per-iteration
# bookkeeping. 1 = plain scan. Read once at import (trace-time static).
_SCAN_UNROLL = max(1, int(os.environ.get("WJAV_SCAN_UNROLL", "1")))

# column-cache decode (default ON since the round-3 A/B: 302.0x vs
# 248.4x same-condition large-v2/B=64 — docs/ADR-002; WJAV_COLUMN_CACHE=0
# restores the restack path for A/B): at q_len == 1 the layer scan emits
# ONLY each layer's new K/V column as ys; the step body writes all
# layers' columns with one dynamic_update_slice into the while-carried
# (L, B, T, d) cache. The legacy ys path instead stacks each layer's
# FULL updated slab as scan output — a read+write of the entire
# self-cache every step. Attention math is unchanged: the new key's
# logit is computed separately and concatenated (the cached slot at
# `pos` is masked), so probabilities are identical.
_COLUMN_CACHE = os.environ.get("WJAV_COLUMN_CACHE", "1") != "0"


def _parse_fuse(v: str) -> frozenset:
    v = v.strip().lower()
    if v in ("", "0"):
        return frozenset()
    if v in ("1", "all"):
        return frozenset({"self", "cross", "mlp"})
    return frozenset(p.strip() for p in v.split(",") if p.strip())


# fused per-layer pallas decode kernels (ops/pallas/fused_decode.py):
# collapse each decoder layer's ~20 small XLA ops at q_len == 1 into up
# to three launches (self-attention block / cross-attention block /
# MLP block) — the round-4 lever against the measured ~0.9 ms/layer
# scheduling gap (docs/ADR-002 roofline). Comma subset for attribution
# A/Bs: WJAV_PALLAS_FUSE=cross | self,mlp | all. Requires the
# production representation (column-cache, fused-QKV int8 weights, int8
# cross-KV, greedy/no beam folding); silently falls back otherwise.
_PALLAS_FUSE = _parse_fuse(os.environ.get("WJAV_PALLAS_FUSE", ""))

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def dense(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """Linear layer; ``w`` is either an array (in, out) or a quantized
    dict {"q": int8 (in, out), "s": f32 (1, out)} — the int8→compute-dtype
    convert and the scale multiply fuse into the matmul, halving the
    weight HBM stream (see models/whisper/quant.py)."""
    if isinstance(w, dict):
        out = jnp.dot(x, w["q"].astype(x.dtype),
                      preferred_element_type=jnp.float32)
        out = out * w["s"].astype(jnp.float32)
    else:
        out = jnp.dot(x, w.astype(x.dtype),
                      preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _split_heads(x: jax.Array, n_head: int) -> jax.Array:
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              bias: Optional[jax.Array] = None) -> jax.Array:
    """Multi-head attention core. q,k,v: (B, T, H, hd); bias: (1|B,1,Tq,Tk)."""
    hd = q.shape[-1]
    scale = hd ** -0.25
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions (host-side constant)."""
    assert channels % 2 == 0
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# parameter init
# ---------------------------------------------------------------------------

def _init_block_stack(key, n_layer, d, cross: bool, dtype) -> Params:
    ks = jax.random.split(key, 16)
    s = d ** -0.5
    mlp = 4 * d

    def w(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    p = {
        "ln1_s": jnp.ones((n_layer, d), dtype), "ln1_b": jnp.zeros((n_layer, d), dtype),
        "wq": w(ks[0], (n_layer, d, d)), "bq": jnp.zeros((n_layer, d), dtype),
        "wk": w(ks[1], (n_layer, d, d)),
        "wv": w(ks[2], (n_layer, d, d)), "bv": jnp.zeros((n_layer, d), dtype),
        "wo": w(ks[3], (n_layer, d, d)), "bo": jnp.zeros((n_layer, d), dtype),
        "ln2_s": jnp.ones((n_layer, d), dtype), "ln2_b": jnp.zeros((n_layer, d), dtype),
        "w1": w(ks[4], (n_layer, d, mlp)), "b1": jnp.zeros((n_layer, mlp), dtype),
        "w2": w(ks[5], (n_layer, mlp, d)), "b2": jnp.zeros((n_layer, d), dtype),
    }
    if cross:
        p.update({
            "lnx_s": jnp.ones((n_layer, d), dtype), "lnx_b": jnp.zeros((n_layer, d), dtype),
            "cwq": w(ks[6], (n_layer, d, d)), "cbq": jnp.zeros((n_layer, d), dtype),
            "cwk": w(ks[7], (n_layer, d, d)),
            "cwv": w(ks[8], (n_layer, d, d)), "cbv": jnp.zeros((n_layer, d), dtype),
            "cwo": w(ks[9], (n_layer, d, d)), "cbo": jnp.zeros((n_layer, d), dtype),
        })
    return p


def init_params(config: WhisperConfig, key: jax.Array,
                dtype=jnp.float32) -> Params:
    ke, kd, k1, k2, k3 = jax.random.split(key, 5)
    d = config.n_audio_state
    s = d ** -0.5
    return {
        "encoder": {
            "conv1_w": (jax.random.normal(k1, (d, config.n_mels, 3)) * s).astype(dtype),
            "conv1_b": jnp.zeros((d,), dtype),
            "conv2_w": (jax.random.normal(k2, (d, d, 3)) * s).astype(dtype),
            "conv2_b": jnp.zeros((d,), dtype),
            "pos": jnp.asarray(sinusoid_positions(config.n_audio_ctx, d), dtype),
            "blocks": _init_block_stack(ke, config.n_audio_layer, d, False, dtype),
            "ln_s": jnp.ones((d,), dtype), "ln_b": jnp.zeros((d,), dtype),
        },
        "decoder": {
            "tok_emb": (jax.random.normal(k3, (config.n_vocab, d)) * s).astype(dtype),
            "pos_emb": jnp.zeros((config.n_text_ctx, d), dtype),
            "blocks": _init_block_stack(kd, config.n_text_layer, d, True, dtype),
            "ln_s": jnp.ones((d,), dtype), "ln_b": jnp.zeros((d,), dtype),
        },
    }


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    # x (B, C, T), w (O, I, K) — torch layout kept for easy checkpoint import
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return (out + b.astype(jnp.float32)[None, :, None]).astype(x.dtype)


def _use_pallas_attention() -> bool:
    """Opt-in (WJAV_USE_PALLAS=1): the pallas fused-attention kernel beats
    the STANDALONE einsum path ~10x, but inside the full encoder program
    XLA's own fusion wins (917 ms vs 1241 ms for large-v2 B=48 on v5e),
    so the default stays XLA. The kernel remains for ablation and as the
    base for a future fully-fused encoder block."""
    import os
    if not os.environ.get("WJAV_USE_PALLAS"):
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except RuntimeError:
        return False


def _encoder_block(x: jax.Array, p: Params, n_head: int) -> jax.Array:
    h = layer_norm(x, p["ln1_s"], p["ln1_b"])
    q = _split_heads(dense(h, p["wq"], p["bq"]), n_head)
    k = _split_heads(dense(h, p["wk"]), n_head)
    v = _split_heads(dense(h, p["wv"], p["bv"]), n_head)
    if _use_pallas_attention():
        from whisperjav_tpu.ops.pallas.attention import encoder_attention
        a = encoder_attention(q, k, v)
    else:
        a = attention(q, k, v)
    b_, t, _, _ = a.shape
    x = x + dense(a.reshape(b_, t, -1), p["wo"], p["bo"])
    h = layer_norm(x, p["ln2_s"], p["ln2_b"])
    x = x + dense(jax.nn.gelu(dense(h, p["w1"], p["b1"]), approximate=False),
                  p["w2"], p["b2"])
    return x


def encode(params: Params, config: WhisperConfig, mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, 3000) → encoder states (B, 1500, d)."""
    enc = params["encoder"]
    x = jax.nn.gelu(_conv1d(mel, enc["conv1_w"], enc["conv1_b"], 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2_w"], enc["conv2_b"], 2),
                    approximate=False)
    x = jnp.swapaxes(x, 1, 2)  # (B, T, d)
    x = x + enc["pos"].astype(x.dtype)

    def body(h, layer_p):
        return _encoder_block(h, layer_p, config.n_audio_head), None

    x, _ = jax.lax.scan(body, x, enc["blocks"])
    return layer_norm(x, enc["ln_s"], enc["ln_b"])


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    """Fixed-shape self-attention cache: (n_layer, B, T_max, d_model) each.

    Heads stay MERGED in storage: a trailing dim of d_model (multiple of
    128) maps to TPU tiles without padding, whereas (…, H, head_dim=64)
    pads 64→128 lanes — a 2× memory expansion XLA then shuttles around
    with remat copies. Heads are split transiently inside the attention
    einsum instead.
    """
    k: jax.Array
    v: jax.Array

    @staticmethod
    def zeros(config: WhisperConfig, batch: int, max_len: int, dtype) -> "KVCache":
        shape = (config.n_text_layer, batch, max_len, config.n_text_state)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


class CrossKV(NamedTuple):
    """Per-segment cross-attention K/V: (n_layer, B, H, head_dim, T_audio).

    The decode loop reads these 2×L×B×T×d bytes EVERY step — the single
    largest HBM stream in decoding. With head_dim (64) on the sublane axis
    and T on the lane axis the tiles are dense; the naive (…, T, H, 64)
    view pads 64→128 lanes and doubles that stream.
    """
    k: jax.Array
    v: jax.Array
    # per-(layer,batch,head) dequantization scales, (L, B, H, 1, 1) f32;
    # all-ones when k/v are kept in the compute dtype
    k_scale: jax.Array
    v_scale: jax.Array


def precompute_cross_kv(params: Params, config: WhisperConfig,
                        xa: jax.Array, int8: bool = False,
                        int4: bool = False) -> CrossKV:
    """Project encoder states once; reused by every decode step.

    ``int8=True`` symmetrically quantizes K/V per (layer, batch, head),
    halving the dominant per-token HBM stream; the int8→bf16 convert and
    scale multiply fuse into the attention matmuls. ``int4=True``
    (wins over int8) packs two ±7-level nibbles per uint8 byte along T —
    quartering the stream; coarser grid, opt-in
    (DecodeOptions.cross_kv_int4). Nibble-packed uint8 storage is used
    instead of XLA's native s4: s4 arrays crossing the eager→jit
    boundary wedge the remote-TPU dispatch path ("Recursively calling
    jit"), and the manual shift/mask unpack is explicit VPU work XLA
    can schedule (docs/ADR-002 §Rejected for the s4 measurement).
    """
    blocks = params["decoder"]["blocks"]
    h = config.n_text_head

    def body(_, layer_p):
        # (B, T, D) → (B, H, hd, T), the decode-hot layout
        k = _split_heads(dense(xa, layer_p["cwk"]), h).transpose(0, 2, 3, 1)
        v = _split_heads(dense(xa, layer_p["cwv"], layer_p["cbv"]),
                         h).transpose(0, 2, 3, 1)
        if int8 or int4:
            qmax = 7.0 if int4 else 127.0
            ks = (jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(2, 3),
                          keepdims=True) / qmax + 1e-9)
            vs = (jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(2, 3),
                          keepdims=True) / qmax + 1e-9)
            k = jnp.clip(jnp.round(k.astype(jnp.float32) / ks),
                         -qmax, qmax)
            v = jnp.clip(jnp.round(v.astype(jnp.float32) / vs),
                         -qmax, qmax)
            if int4:
                k = _pack_nibbles(k)
                v = _pack_nibbles(v)
            else:
                k = k.astype(jnp.int8)
                v = v.astype(jnp.int8)
        else:
            ks = jnp.ones(k.shape[:2] + (1, 1), jnp.float32)
            vs = ks
        return None, (k, v, ks, vs)

    _, (ks_, vs_, ksc, vsc) = jax.lax.scan(body, None, blocks)
    return CrossKV(ks_, vs_, ksc, vsc)


def _pack_nibbles(x: jax.Array) -> jax.Array:
    """Pack ±7-level values into two s4 nibbles per uint8 along the last
    (T) axis: byte i holds positions 2i (low nibble) and 2i+1 (high)."""
    if x.shape[-1] % 2:
        raise ValueError(
            f"int4 cross-KV needs an even T axis, got {x.shape[-1]} — "
            "cross-KV buckets (448/960/1500) are all even")
    xi = x.astype(jnp.int32)
    lo = xi[..., 0::2] & 0xF
    hi = xi[..., 1::2] & 0xF
    return ((hi << 4) | lo).astype(jnp.uint8)


def _unpack_nibbles(p: jax.Array) -> jax.Array:
    """uint8 nibble-pairs → int8 values, inverse of _pack_nibbles.

    Arithmetic right shifts on the bitcast int8 view sign-extend both
    nibbles; the trailing (T/2, 2)→(T,) reshape restores position order.
    NOTE: inside a matmul this interleave reshape defeats operand
    fusion (XLA materializes the unpacked array; measured 193 vs
    43 ms/step at large-v2/B=64) — the attention path uses the
    even/odd-split form in ``_packed_cross_attention`` instead; this
    helper is for tests and host-side unpacking.
    """
    pi = jax.lax.bitcast_convert_type(p, jnp.int8)
    lo = jnp.right_shift(jnp.left_shift(pi, 4), 4)
    hi = jnp.right_shift(pi, 4)
    return jnp.stack([lo, hi], axis=-1).reshape(
        *p.shape[:-1], p.shape[-1] * 2)


def _nib_lo(p: jax.Array) -> jax.Array:
    pi = jax.lax.bitcast_convert_type(p, jnp.int8)
    return jnp.right_shift(jnp.left_shift(pi, 4), 4)


def _nib_hi(p: jax.Array) -> jax.Array:
    return jnp.right_shift(jax.lax.bitcast_convert_type(p, jnp.int8), 4)


def _packed_cross_attention(q, ck, cv, k_scale, v_scale):
    """Cross-attention over nibble-packed int4 K/V without interleaving.

    Softmax over T is permutation-invariant and the V contraction sums
    over T, so even positions (low nibbles) and odd positions (high
    nibbles) can be attended as two half-length einsums whose operands
    are pure shift/mask functions of the packed bytes — fusable into
    the matmul read, never materializing the unpacked stream.
    """
    hd = q.shape[-1]
    scale = hd ** -0.25
    qf = q * (scale * scale)
    lg = [jnp.einsum("bqhd,bhdt->bhqt", qf, nib(ck).astype(q.dtype),
                     preferred_element_type=jnp.float32) * k_scale
          for nib in (_nib_lo, _nib_hi)]
    logits = jnp.concatenate(lg, axis=-1)          # (B,H,Tq, T) permuted
    weights = jax.nn.softmax(logits.astype(jnp.float32),
                             axis=-1).astype(q.dtype)
    t2 = ck.shape[-1]
    out = (jnp.einsum("bhqt,bhdt->bqhd", weights[..., :t2],
                      _nib_lo(cv).astype(q.dtype),
                      preferred_element_type=jnp.float32)
           + jnp.einsum("bhqt,bhdt->bqhd", weights[..., t2:],
                        _nib_hi(cv).astype(q.dtype),
                        preferred_element_type=jnp.float32))
    out = out * jnp.transpose(v_scale, (0, 2, 1, 3))   # (B,1,H,1)
    return out.astype(q.dtype)


def cross_attention(q: jax.Array, ck: jax.Array, cv: jax.Array,
                    k_scale: jax.Array, v_scale: jax.Array) -> jax.Array:
    """q (B, Tq, H, hd) × cross K/V (B, H, hd, T) → (B, Tq, H, hd).

    K/V may be int8 with per-(batch,head) scales (B, H, 1, 1), or
    nibble-packed int4 in uint8 storage (T axis halved; attended via
    the fusion-preserving even/odd split, see _packed_cross_attention).

    Beam folding: when q has g× more batch rows than K/V (beam search —
    all k beams of a row attend the SAME audio), the g beams fold into
    the query-time axis (cross-attention has no causal mask, so each
    query position is independent): q (B·g, Tq) → (B, g·Tq). This lets
    decode_beam keep ONE cross-KV copy per row instead of per beam —
    the cross stream is the dominant decode HBM read, so beam-k decoding
    streams 1/k of the bytes the naive repeat layout would."""
    if q.shape[0] != ck.shape[0]:
        g, rem = divmod(q.shape[0], ck.shape[0])
        if rem:
            raise ValueError(
                f"query batch {q.shape[0]} not a multiple of "
                f"cross-KV batch {ck.shape[0]}")
        tq = q.shape[1]
        folded = cross_attention(
            q.reshape(ck.shape[0], g * tq, *q.shape[2:]),
            ck, cv, k_scale, v_scale)
        return folded.reshape(q.shape[0], tq, *folded.shape[2:])
    if ck.dtype == jnp.uint8:
        return _packed_cross_attention(q, ck, cv, k_scale, v_scale)
    hd = q.shape[-1]
    scale = hd ** -0.25
    quant = (jnp.int8, jnp.int4)
    logits = jnp.einsum("bqhd,bhdt->bhqt", q * (scale * scale),
                        ck.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * k_scale if ck.dtype in quant else logits
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqt,bhdt->bqhd", weights, cv.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    if cv.dtype in quant:
        out = out * jnp.transpose(v_scale, (0, 2, 1, 3))  # (B,1,H,1)
    return out.astype(q.dtype)


def _decoder_block(x, layer_p, cross_k, cross_v, ck_scale, cv_scale,
                   cache_k, cache_v, pos, n_head, self_bias,
                   cross_stacked=None, carry_cache=None,
                   column_mode=False):
    """One decoder block at positions [pos, pos+q). Returns x and new cache.

    Caches are stored heads-merged (B, T, d); heads are split transiently
    for the attention einsums (see KVCache layout note).
    ``carry_cache=(ck_full, cv_full, layer_idx)``: the full stacked
    (L, B, T, d) caches carried through the layer scan — updates go
    straight into the carried buffers (in-place aliased by XLA) and the
    per-layer slab is sliced for attention; returns (x, ck_full,
    cv_full) instead of per-layer slabs.
    """
    b, q_len, d = x.shape
    # --- causal self-attention over the cache ---
    h = layer_norm(x, layer_p["ln1_s"], layer_p["ln1_b"])
    if "wqkv" in layer_p:
        # fused q/k/v projection (quant.py:fuse_qkv_weights): one
        # (d, 3d) matmul instead of three kernels per layer per step.
        # Same math per output column (k's bias slot is zeros);
        # rounding may drift at float epsilon if XLA re-blocks the
        # wider reduction.
        qkv = dense(h, layer_p["wqkv"], layer_p["bqkv"])
        q_new, k_new, v_new = (qkv[..., :d], qkv[..., d:2 * d],
                               qkv[..., 2 * d:])
        q = _split_heads(q_new, n_head)
    else:
        q = _split_heads(dense(h, layer_p["wq"], layer_p["bq"]), n_head)
        k_new = dense(h, layer_p["wk"])
        v_new = dense(h, layer_p["wv"], layer_p["bv"])
    if column_mode:
        # read-only cache attention + a separately-computed logit for
        # the new key (its cache slot is masked by self_bias: j < pos).
        # Mathematically identical to insert-then-attend — same logit
        # set, same softmax — without rewriting the cache slab here.
        hd = d // n_head
        scale = hd ** -0.25
        kc = _split_heads(cache_k.astype(q.dtype), n_head)
        vc = _split_heads(cache_v.astype(q.dtype), n_head)
        kn = _split_heads(k_new, n_head)          # (B, 1, H, hd)
        vn = _split_heads(v_new, n_head)
        logits_c = jnp.einsum("bqhd,bkhd->bhqk", q * scale, kc * scale,
                              preferred_element_type=jnp.float32)
        logits_c = logits_c + self_bias           # mask j >= pos
        logit_n = jnp.einsum("bqhd,bqhd->bhq", q * scale, kn * scale,
                             preferred_element_type=jnp.float32)[..., None]
        logits = jnp.concatenate([logits_c, logit_n], axis=-1)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        w_c = w[..., :-1].astype(q.dtype)
        w_n = w[..., -1:].astype(q.dtype)         # (B, H, 1, 1)
        a = jnp.einsum("bhqk,bkhd->bqhd", w_c, vc,
                       preferred_element_type=jnp.float32).astype(q.dtype)
        a = a + jnp.swapaxes(w_n, 1, 2) * vn      # (B,1,H,1)·(B,1,H,hd)
        x = x + dense(a.reshape(b, q_len, d), layer_p["wo"], layer_p["bo"])
    elif carry_cache is not None:
        ck_full, cv_full, l_idx = carry_cache
        ck_full = jax.lax.dynamic_update_slice(
            ck_full, k_new[None].astype(ck_full.dtype), (l_idx, 0, pos, 0))
        cv_full = jax.lax.dynamic_update_slice(
            cv_full, v_new[None].astype(cv_full.dtype), (l_idx, 0, pos, 0))
        cache_k = jax.lax.dynamic_index_in_dim(ck_full, l_idx, 0,
                                               keepdims=False)
        cache_v = jax.lax.dynamic_index_in_dim(cv_full, l_idx, 0,
                                               keepdims=False)
    else:
        cache_k = jax.lax.dynamic_update_slice(
            cache_k, k_new.astype(cache_k.dtype), (0, pos, 0))
        cache_v = jax.lax.dynamic_update_slice(
            cache_v, v_new.astype(cache_v.dtype), (0, pos, 0))
    if not column_mode:
        a = attention(q, _split_heads(cache_k.astype(q.dtype), n_head),
                      _split_heads(cache_v.astype(q.dtype), n_head),
                      self_bias)
        x = x + dense(a.reshape(b, q_len, d), layer_p["wo"], layer_p["bo"])
    # --- cross-attention (K/V pre-laid-out as (B, H, hd, T)) ---
    h = layer_norm(x, layer_p["lnx_s"], layer_p["lnx_b"])
    cq = _split_heads(dense(h, layer_p["cwq"], layer_p["cbq"]), n_head)
    if cross_stacked is not None:
        # pallas decode path (WJAV_PALLAS_DECODE=1): the kernel reads its
        # layer slice straight from the loop-invariant stacked int8 K/V
        # (a per-layer scan input would be materialized by XLA first —
        # re-adding the stream the kernel eliminates; docs/ADR-002)
        from whisperjav_tpu.ops.pallas.decode_attention import (
            decode_cross_attention_stacked,
        )
        full_k, full_v, l_idx = cross_stacked
        hd = cq.shape[-1]
        scale = hd ** -0.5
        qf = (cq[:, 0].astype(jnp.float32) * scale
              * ck_scale[:, :, 0, 0][..., None])          # (B, H, hd)
        a = decode_cross_attention_stacked(qf, full_k, full_v, l_idx)
        a = (a * cv_scale[:, :, 0, 0][..., None])[:, None].astype(cq.dtype)
    else:
        a = cross_attention(cq, cross_k, cross_v, ck_scale, cv_scale)
    x = x + dense(a.reshape(b, q_len, d), layer_p["cwo"], layer_p["cbo"])
    # --- mlp ---
    h = layer_norm(x, layer_p["ln2_s"], layer_p["ln2_b"])
    x = x + dense(jax.nn.gelu(dense(h, layer_p["w1"], layer_p["b1"]),
                              approximate=False),
                  layer_p["w2"], layer_p["b2"])
    if column_mode:
        return x, k_new, v_new                    # (B, 1, d) columns
    if carry_cache is not None:
        return x, ck_full, cv_full
    return x, cache_k, cache_v


def decode_hidden(
    params: Params,
    config: WhisperConfig,
    tokens: jax.Array,       # (B, q_len) token ids at positions [pos, pos+q)
    pos,                     # scalar int: first position of this chunk
    cache: KVCache,          # (L, B, T_max, H, hd)
    cross: CrossKV,
) -> Tuple[jax.Array, KVCache]:
    """Decoder blocks + final LN, WITHOUT the lm head projection.

    Returns (hidden (B, q_len, d), updated cache). Used by decode_step
    (which adds the vocab projection) and by heads that consume decoder
    states directly (models/vad/whisperseg.py frame head).
    """
    dec = params["decoder"]
    b, q_len = tokens.shape
    t_max = cache.k.shape[2]
    dtype = dec["tok_emb"].dtype

    x = dec["tok_emb"][tokens].astype(dtype)
    pos_emb = jax.lax.dynamic_slice(
        dec["pos_emb"], (pos, 0), (q_len, dec["pos_emb"].shape[1]))
    x = x + pos_emb.astype(dtype)

    # bias (1, 1, q_len, T_max): key j visible to query i iff j <= pos + i
    q_idx = pos + jax.lax.broadcasted_iota(jnp.int32, (q_len, t_max), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, t_max), 1)
    self_bias = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)[None, None]

    use_pallas = (_PALLAS_DECODE and q_len == 1
                  and cross.k.dtype == jnp.int8
                  # the pallas kernel has no beam-folding path: it needs
                  # query rows == cross-KV rows (decode_beam shares one
                  # cross-KV copy across k beams — see cross_attention)
                  and cross.k.shape[1] == b)
    blocks = dec["blocks"]
    use_fused = (_PALLAS_FUSE and q_len == 1 and _COLUMN_CACHE
                 and not use_pallas
                 and cross.k.dtype == jnp.int8
                 and cross.k.shape[1] == b
                 and all(isinstance(blocks.get(n), dict)
                         for n in ("wqkv", "wo", "cwq", "cwo",
                                   "w1", "w2")))
    if use_fused:
        from whisperjav_tpu.ops.pallas import fused_decode as _fd
        interp = jax.default_backend() == "cpu"
        n_layers = cross.k.shape[0]
        nh = config.n_text_head
        d_m = config.n_text_state
        # kernel-native flat layouts of the stacked cross K/V + scales;
        # these reshapes are layout no-ops on the persistent buffers
        ckf = cross.k.reshape(n_layers, b, -1, cross.k.shape[-1])
        cvf = cross.v.reshape(n_layers, b, -1, cross.v.shape[-1])
        ksf = cross.k_scale.reshape(n_layers, b, nh)
        vsf = cross.v_scale.reshape(n_layers, b, nh)
        col_bias = jnp.where(k_idx[:1] < pos, 0.0, -jnp.inf)[None, None]

        def body(h2, xs):
            # non-fused sub-blocks consume the per-layer xs slices
            # (layer_p / ck / cv / sk / sv); fused ones read the
            # loop-invariant stacked arrays via the kernels' layer
            # index_map. Unused xs leaves are dead-code-eliminated.
            layer_p, l_idx, ck, cv, cks, cvs, sk, sv = xs
            if "self" in _PALLAS_FUSE:
                h2, kc2, vc2 = _fd.self_block_stacked(
                    h2, blocks["ln1_s"], blocks["ln1_b"],
                    blocks["wqkv"], blocks["bqkv"],
                    blocks["wo"], blocks["bo"],
                    cache.k, cache.v, l_idx, pos, nh, interpret=interp)
            else:
                # XLA column-mode self-attention (same math as
                # _decoder_block(column_mode=True) at q_len == 1)
                x3 = h2[:, None]
                hh = layer_norm(x3, layer_p["ln1_s"], layer_p["ln1_b"])
                qkv = dense(hh, layer_p["wqkv"], layer_p["bqkv"])
                q3 = _split_heads(qkv[..., :d_m], nh)
                k_new = qkv[..., d_m:2 * d_m]
                v_new = qkv[..., 2 * d_m:]
                hd_ = d_m // nh
                sc = hd_ ** -0.25
                kc_ = _split_heads(sk.astype(q3.dtype), nh)
                vc_ = _split_heads(sv.astype(q3.dtype), nh)
                kn = _split_heads(k_new, nh)
                vn = _split_heads(v_new, nh)
                lg_c = jnp.einsum("bqhd,bkhd->bhqk", q3 * sc, kc_ * sc,
                                  preferred_element_type=jnp.float32)
                lg_c = lg_c + col_bias
                lg_n = jnp.einsum("bqhd,bqhd->bhq", q3 * sc, kn * sc,
                                  preferred_element_type=jnp.float32
                                  )[..., None]
                w = jax.nn.softmax(
                    jnp.concatenate([lg_c, lg_n], axis=-1).astype(
                        jnp.float32), axis=-1)
                a3 = jnp.einsum("bhqk,bkhd->bqhd",
                                w[..., :-1].astype(q3.dtype), vc_,
                                preferred_element_type=jnp.float32
                                ).astype(q3.dtype)
                a3 = a3 + jnp.swapaxes(w[..., -1:].astype(q3.dtype),
                                       1, 2) * vn
                x3 = x3 + dense(a3.reshape(b, 1, d_m),
                                layer_p["wo"], layer_p["bo"])
                h2 = x3[:, 0]
                kc2 = k_new[:, 0].astype(cache.k.dtype)
                vc2 = v_new[:, 0].astype(cache.v.dtype)
            if "cross" in _PALLAS_FUSE:
                h2 = _fd.cross_block_stacked(
                    h2, blocks["lnx_s"], blocks["lnx_b"],
                    blocks["cwq"], blocks["cbq"],
                    blocks["cwo"], blocks["cbo"],
                    ckf, cvf, ksf, vsf, l_idx, nh, interpret=interp)
            else:
                x3 = h2[:, None]
                hh = layer_norm(x3, layer_p["lnx_s"], layer_p["lnx_b"])
                cq = _split_heads(dense(hh, layer_p["cwq"],
                                        layer_p["cbq"]), nh)
                a3 = cross_attention(cq, ck, cv, cks, cvs)
                x3 = x3 + dense(a3.reshape(b, 1, d_m),
                                layer_p["cwo"], layer_p["cbo"])
                h2 = x3[:, 0]
            if "mlp" in _PALLAS_FUSE:
                h2 = _fd.mlp_block_stacked(
                    h2, blocks["ln2_s"], blocks["ln2_b"],
                    blocks["w1"], blocks["b1"],
                    blocks["w2"], blocks["b2"], l_idx, interpret=interp)
            else:
                x3 = h2[:, None]
                hh = layer_norm(x3, layer_p["ln2_s"], layer_p["ln2_b"])
                x3 = x3 + dense(
                    jax.nn.gelu(dense(hh, layer_p["w1"], layer_p["b1"]),
                                approximate=False),
                    layer_p["w2"], layer_p["b2"])
                h2 = x3[:, 0]
            return h2, (kc2, vc2)

        h2, (k_cols, v_cols) = jax.lax.scan(
            body, x[:, 0],
            (blocks, jnp.arange(n_layers), cross.k, cross.v,
             cross.k_scale, cross.v_scale, cache.k, cache.v),
            unroll=_SCAN_UNROLL)
        x = h2[:, None]
        new_k = jax.lax.dynamic_update_slice(
            cache.k, k_cols[:, :, None].astype(cache.k.dtype),
            (0, 0, pos, 0))
        new_v = jax.lax.dynamic_update_slice(
            cache.v, v_cols[:, :, None].astype(cache.v.dtype),
            (0, 0, pos, 0))
    elif use_pallas:
        # K/V stay loop-invariant (closed over); only the layer index
        # is scanned, so the pallas kernel's BlockSpec selects the layer
        # without XLA materializing a per-layer copy
        n_layers = cross.k.shape[0]

        def body(h, xs):
            layer_p, l_idx, cks, cvs, sk, sv = xs
            h, nk, nv = _decoder_block(
                h, layer_p, None, None, cks, cvs, sk, sv,
                pos, config.n_text_head, self_bias,
                cross_stacked=(cross.k, cross.v, l_idx))
            return h, (nk, nv)

        x, (new_k, new_v) = jax.lax.scan(
            body, x, (dec["blocks"], jnp.arange(n_layers),
                      cross.k_scale, cross.v_scale, cache.k, cache.v),
            unroll=_SCAN_UNROLL)
    elif _COLUMN_CACHE and q_len == 1:
        # column mode: scan ys are only the new K/V columns; ONE stacked
        # dynamic_update_slice writes every layer's column into the
        # while-carried cache. Replaces the default path's full-cache
        # restack (read+write of the whole self-cache per step) with a
        # (L, B, 1, d) write.
        col_bias = jnp.where(k_idx[:1] < pos, 0.0, -jnp.inf)[None, None]

        def body(h, xs):
            layer_p, ck, cv, cks, cvs, sk, sv = xs
            h, kc, vc = _decoder_block(h, layer_p, ck, cv, cks, cvs,
                                       sk, sv, pos, config.n_text_head,
                                       col_bias, column_mode=True)
            return h, (kc, vc)

        x, (k_cols, v_cols) = jax.lax.scan(
            body, x, (dec["blocks"], cross.k, cross.v, cross.k_scale,
                      cross.v_scale, cache.k, cache.v),
            unroll=_SCAN_UNROLL)
        new_k = jax.lax.dynamic_update_slice(
            cache.k, k_cols.astype(cache.k.dtype), (0, 0, pos, 0))
        new_v = jax.lax.dynamic_update_slice(
            cache.v, v_cols.astype(cache.v.dtype), (0, 0, pos, 0))
    elif _CARRY_CACHE:
        # self-KV cache rides the scan CARRY (in-place aliased) instead
        # of xs/ys — the ys path stacks a full cache copy as scan output
        # every decode step (~GBs/step of pure shuffle; docs/ADR-002)
        n_layers = cache.k.shape[0]

        def body(carry, xs):
            h, ck_full, cv_full = carry
            layer_p, l_idx, ck, cv, cks, cvs = xs
            h, ck_full, cv_full = _decoder_block(
                h, layer_p, ck, cv, cks, cvs, None, None,
                pos, config.n_text_head, self_bias,
                carry_cache=(ck_full, cv_full, l_idx))
            return (h, ck_full, cv_full), None

        (x, new_k, new_v), _ = jax.lax.scan(
            body, (x, cache.k, cache.v),
            (dec["blocks"], jnp.arange(n_layers), cross.k, cross.v,
             cross.k_scale, cross.v_scale), unroll=_SCAN_UNROLL)
    else:
        def body(h, xs):
            layer_p, ck, cv, cks, cvs, sk, sv = xs
            h, nk, nv = _decoder_block(h, layer_p, ck, cv, cks, cvs,
                                       sk, sv, pos, config.n_text_head,
                                       self_bias)
            return h, (nk, nv)

        x, (new_k, new_v) = jax.lax.scan(
            body, x, (dec["blocks"], cross.k, cross.v, cross.k_scale,
                      cross.v_scale, cache.k, cache.v),
            unroll=_SCAN_UNROLL)
    x = layer_norm(x, dec["ln_s"], dec["ln_b"])
    return x, KVCache(new_k, new_v)


def decode_step(
    params: Params,
    config: WhisperConfig,
    tokens: jax.Array,
    pos,
    cache: KVCache,
    cross: CrossKV,
) -> Tuple[jax.Array, KVCache]:
    """Run the decoder on a chunk (prefill or single step).

    Returns (logits (B, q_len, vocab) float32, updated cache).
    """
    dec = params["decoder"]
    x, cache = decode_hidden(params, config, tokens, pos, cache, cross)
    if "lm_head_q" in dec:          # int8 weight path (quant.py); f32 out
        lm = dec["lm_head_q"]
        logits = jnp.dot(x, lm["q"].astype(x.dtype),
                         preferred_element_type=jnp.float32
                         ) * lm["s"].astype(jnp.float32)
    else:
        logits = jnp.dot(x, dec["tok_emb"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    return logits, cache


def decode_train(params: Params, config: WhisperConfig,
                 tokens: jax.Array, xa: jax.Array) -> jax.Array:
    """Teacher-forced full-sequence decoder (training / parity tests).

    tokens (B, S), xa (B, T_a, d) → logits (B, S, vocab) float32.
    """
    cross = precompute_cross_kv(params, config, xa)
    cache = KVCache.zeros(config, tokens.shape[0], tokens.shape[1],
                          params["decoder"]["tok_emb"].dtype)
    logits, _ = decode_step(params, config, tokens, 0, cache, cross)
    return logits


def forward(params: Params, config: WhisperConfig,
            mel: jax.Array, tokens: jax.Array) -> jax.Array:
    """Full teacher-forced forward: mel + tokens → logits."""
    xa = encode(params, config, mel)
    return decode_train(params, config, tokens, xa)
