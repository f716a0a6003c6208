"""Qwen3-ASR-class model: audio encoder + decoder-only LM in pure JAX.

TPU-native counterpart of the reference's Qwen3-ASR integration
(reference: whisperjav/modules/qwen_asr.py:154-1752 wraps the qwen-asr
package / HF transformers; ADR-003 documents the 0.6B/1.7B family).
Architecture implemented fresh in the modern decoder-LM idiom:

- audio tower: mel (128 bins) → two stride-2 convs (→40 ms frames) →
  pre-LN transformer stack → linear adapter into the LM width;
- language model: RMSNorm, rotary position embeddings, grouped-query
  attention (n_kv_heads < n_heads), SwiGLU MLP — scan-stacked layers
  like the Whisper core, fixed-shape KV cache;
- decoding: audio embeddings form the prompt prefix; greedy/sampled
  generation with repetition penalty and a dynamic
  max-tokens-per-audio-second budget (reference: qwen_asr.py:414).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict


@dataclass(frozen=True)
class QwenASRConfig:
    name: str = "qwen3-asr-test"
    # language model
    vocab_size: int = 4096
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 8
    n_kv_heads: int = 4
    d_ff: int = 1024
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    # audio tower
    n_mels: int = 128
    d_audio: int = 256
    audio_layers: int = 4
    audio_heads: int = 8
    # special ids
    eos_id: int = 2
    bos_id: int = 1
    # limits (reference: qwen_asr.py:215-216)
    max_audio_s_aligned: float = 180.0
    max_audio_s: float = 1200.0
    max_tokens_per_audio_second: float = 12.0
    min_token_budget: int = 48

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


# 1.7B-class configuration (approximate published architecture scale)
QWEN_SIZES = {
    "qwen3-asr-0.6b": QwenASRConfig(
        name="qwen3-asr-0.6b", vocab_size=151_936, d_model=1024,
        n_layers=24, n_heads=16, n_kv_heads=8, d_ff=3072,
        d_audio=768, audio_layers=12, audio_heads=12),
    "qwen3-asr-1.7b": QwenASRConfig(
        name="qwen3-asr-1.7b", vocab_size=151_936, d_model=2048,
        n_layers=28, n_heads=16, n_kv_heads=8, d_ff=6144,
        d_audio=1024, audio_layers=18, audio_heads=16),
    "qwen3-asr-test": QwenASRConfig(),
}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32)).astype(x.dtype)


def rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x (B, T, H, hd); positions (T,) or (B, T)."""
    hd = x.shape[-1]
    half = hd // 2
    freqs = theta ** (-jnp.arange(half, dtype=jnp.float32) / half)
    if positions.ndim == 1:
        ang = positions[:, None].astype(jnp.float32) * freqs[None, :]
        ang = ang[None, :, None, :]      # (1, T, 1, half)
    else:
        ang = positions[..., None].astype(jnp.float32) * freqs
        ang = ang[:, :, None, :]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


def _dense(x, w):
    return jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_lm_blocks(key, cfg: QwenASRConfig, dtype):
    L, d, hd = cfg.n_layers, cfg.d_model, cfg.head_dim
    kvd = cfg.n_kv_heads * hd
    ks = jax.random.split(key, 8)
    s = d ** -0.5

    def w(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    return {
        "ln1": jnp.ones((L, d), dtype),
        "wq": w(ks[0], (L, d, d)),
        "wk": w(ks[1], (L, d, kvd)),
        "wv": w(ks[2], (L, d, kvd)),
        "wo": w(ks[3], (L, d, d)),
        "ln2": jnp.ones((L, d), dtype),
        "w_gate": w(ks[4], (L, d, cfg.d_ff)),
        "w_up": w(ks[5], (L, d, cfg.d_ff)),
        "w_down": w(ks[6], (L, cfg.d_ff, d)),
    }


def _init_audio_tower(key, cfg: QwenASRConfig, dtype):
    ka, kb, kc, kd_ = jax.random.split(key, 4)
    da = cfg.d_audio
    s = da ** -0.5
    L = cfg.audio_layers

    def w(k, shape, scale=None):
        return (jax.random.normal(k, shape) * (scale or s)).astype(dtype)

    ks = jax.random.split(kc, 6)
    return {
        "conv1_w": w(ka, (da, cfg.n_mels, 3), 0.05),
        "conv1_b": jnp.zeros((da,), dtype),
        "conv2_w": w(kb, (da, da, 3), 0.05),
        "conv2_b": jnp.zeros((da,), dtype),
        "blocks": {
            "ln1": jnp.ones((L, da), dtype),
            "wq": w(ks[0], (L, da, da)), "wk": w(ks[1], (L, da, da)),
            "wv": w(ks[2], (L, da, da)), "wo": w(ks[3], (L, da, da)),
            "ln2": jnp.ones((L, da), dtype),
            "w1": w(ks[4], (L, da, 4 * da)),
            "w2": w(ks[5], (L, 4 * da, da)),
        },
        "ln_post": jnp.ones((da,), dtype),
        "adapter_w": w(kd_, (da, cfg.d_model)),
        "adapter_b": jnp.zeros((cfg.d_model,), dtype),
    }


def init_params(cfg: QwenASRConfig, key: jax.Array,
                dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d = cfg.d_model
    return {
        "audio": _init_audio_tower(k1, cfg, dtype),
        "tok_emb": (jax.random.normal(k2, (cfg.vocab_size, d))
                    * d ** -0.5).astype(dtype),
        "blocks": _init_lm_blocks(k3, cfg, dtype),
        "ln_f": jnp.ones((d,), dtype),
        "lm_head": (jax.random.normal(k4, (d, cfg.vocab_size))
                    * d ** -0.5).astype(dtype),
    }


# ---------------------------------------------------------------------------
# audio tower
# ---------------------------------------------------------------------------

def _audio_block(x, p, n_heads, rope_theta):
    b, t, d = x.shape
    h = rms_norm(x, p["ln1"], 1e-6)
    pos = jnp.arange(t)
    q = rope(_dense(h, p["wq"]).reshape(b, t, n_heads, -1), pos, rope_theta)
    k = rope(_dense(h, p["wk"]).reshape(b, t, n_heads, -1), pos, rope_theta)
    v = _dense(h, p["wv"]).reshape(b, t, n_heads, -1)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    a = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + _dense(o.reshape(b, t, d), p["wo"])
    h = rms_norm(x, p["ln2"], 1e-6)
    x = x + _dense(jax.nn.gelu(_dense(h, p["w1"]), approximate=False),
                   p["w2"])
    return x


def encode_audio(params: Params, cfg: QwenASRConfig,
                 mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, T_mel) → audio embeddings (B, T_mel/4, d_model)."""
    a = params["audio"]

    def conv(x, w, b, stride):
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(stride,),
            padding=((1, 1),), dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
        return (out + b.astype(jnp.float32)[None, :, None]).astype(x.dtype)

    x = jax.nn.gelu(conv(mel, a["conv1_w"], a["conv1_b"], 2),
                    approximate=False)
    x = jax.nn.gelu(conv(x, a["conv2_w"], a["conv2_b"], 2),
                    approximate=False)
    x = jnp.swapaxes(x, 1, 2)

    def body(h, layer_p):
        return _audio_block(h, layer_p, cfg.audio_heads, cfg.rope_theta), None

    x, _ = jax.lax.scan(body, x, a["blocks"])
    x = rms_norm(x, a["ln_post"], 1e-6)
    return _dense(x, a["adapter_w"]) + a["adapter_b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# language model with KV cache
# ---------------------------------------------------------------------------

class LMCache(NamedTuple):
    """KV cache with heads MERGED in storage — (L, B, T_max, n_kv*hd) —
    so the trailing dim tiles onto the TPU layout without lane padding
    (same rationale as whisper.model.KVCache)."""
    k: jax.Array
    v: jax.Array

    @staticmethod
    def zeros(cfg: QwenASRConfig, b: int, t_max: int, dtype) -> "LMCache":
        shape = (cfg.n_layers, b, t_max, cfg.n_kv_heads * cfg.head_dim)
        return LMCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _lm_block(x, p, cache_k, cache_v, pos, cfg: QwenASRConfig, bias):
    b, q_len, d = x.shape
    nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    h = rms_norm(x, p["ln1"], cfg.rms_eps)
    positions = pos + jnp.arange(q_len)
    q = rope(_dense(h, p["wq"]).reshape(b, q_len, nh, hd), positions,
             cfg.rope_theta)
    k = rope(_dense(h, p["wk"]).reshape(b, q_len, nkv, hd), positions,
             cfg.rope_theta)
    v = _dense(h, p["wv"])
    cache_k = jax.lax.dynamic_update_slice(
        cache_k, k.reshape(b, q_len, nkv * hd).astype(cache_k.dtype),
        (0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, v.astype(cache_v.dtype), (0, pos, 0))
    t_max = cache_k.shape[1]
    # GQA: split heads transiently, repeat kv heads
    rep = nh // nkv
    kk = jnp.repeat(cache_k.astype(q.dtype).reshape(b, t_max, nkv, hd),
                    rep, axis=2)
    vv = jnp.repeat(cache_v.astype(q.dtype).reshape(b, t_max, nkv, hd),
                    rep, axis=2)
    scale = hd ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, kk,
                        preferred_element_type=jnp.float32) + bias
    a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, vv,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + _dense(o.reshape(b, q_len, d), p["wo"])
    h = rms_norm(x, p["ln2"], cfg.rms_eps)
    gate = jax.nn.silu(_dense(h, p["w_gate"]))
    x = x + _dense(gate * _dense(h, p["w_up"]), p["w_down"])
    return x, cache_k, cache_v


def lm_step(params: Params, cfg: QwenASRConfig, x_emb: jax.Array,
            pos, cache: LMCache) -> Tuple[jax.Array, LMCache]:
    """Embedded inputs (B, q_len, d) at [pos, pos+q) → logits + cache."""
    b, q_len, _ = x_emb.shape
    t_max = cache.k.shape[2]
    q_idx = pos + jax.lax.broadcasted_iota(jnp.int32, (q_len, t_max), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, t_max), 1)
    bias = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)[None, None]

    def body(h, xs):
        layer_p, ck, cv = xs
        h, nk, nv = _lm_block(h, layer_p, ck, cv, pos, cfg, bias)
        return h, (nk, nv)

    x, (nk, nv) = jax.lax.scan(body, x_emb,
                               (params["blocks"], cache.k, cache.v))
    x = rms_norm(x, params["ln_f"], cfg.rms_eps)
    logits = jnp.dot(x, params["lm_head"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
    return logits, LMCache(nk, nv)


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

class QwenGenResult(NamedTuple):
    tokens: jax.Array     # (B, max_new), eos-padded
    length: jax.Array
    avg_logprob: jax.Array


@functools.partial(jax.jit, static_argnames=("cfg", "max_new", "audio_len",
                                             "repetition_penalty"))
def generate(params: Params, cfg: QwenASRConfig, mel: jax.Array,
             max_new: int, audio_len: int,
             repetition_penalty: float = 1.1,
             temperature: float = 0.0,
             rng: Optional[jax.Array] = None) -> QwenGenResult:
    """Transcribe mel windows: audio prefix + BOS → greedy generation.

    audio_len: number of audio embedding positions (static; mel frames/4).
    """
    b = mel.shape[0]
    audio_emb = encode_audio(params, cfg, mel)[:, :audio_len]
    t_max = audio_len + 1 + max_new
    dtype = params["tok_emb"].dtype
    cache = LMCache.zeros(cfg, b, t_max, dtype)

    bos = jnp.full((b, 1), cfg.bos_id, jnp.int32)
    prefix = jnp.concatenate(
        [audio_emb, params["tok_emb"][bos].astype(audio_emb.dtype)], axis=1)
    logits, cache = lm_step(params, cfg, prefix, 0, cache)
    cur = logits[:, -1]

    if rng is None:
        rng = jax.random.PRNGKey(0)

    class S(NamedTuple):
        step: jax.Array
        tokens: jax.Array
        cache: LMCache
        cur: jax.Array
        sum_lp: jax.Array
        length: jax.Array
        finished: jax.Array
        rng: jax.Array

    state = S(jnp.int32(0), jnp.full((b, max_new), cfg.eos_id, jnp.int32),
              cache, cur, jnp.zeros((b,), jnp.float32),
              jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.bool_), rng)

    def cond(s):
        return (s.step < max_new) & ~jnp.all(s.finished)

    def body(s):
        logits = s.cur
        if repetition_penalty != 1.0:
            seen = jnp.zeros((b, cfg.vocab_size), jnp.bool_).at[
                jnp.arange(b)[:, None], s.tokens].set(True)
            seen = seen.at[:, cfg.eos_id].set(False)
            pen = jnp.where(logits > 0, logits / repetition_penalty,
                            logits * repetition_penalty)
            logits = jnp.where(seen, pen, logits)
        rng, sub = jax.random.split(s.rng)
        gumbel = jax.random.gumbel(sub, logits.shape, jnp.float32)
        tok = jnp.argmax(logits + temperature * gumbel, axis=-1)
        tok = jnp.where(s.finished, cfg.eos_id, tok).astype(jnp.int32)
        lp = jax.nn.log_softmax(logits, axis=-1)
        tok_lp = jnp.take_along_axis(lp, tok[:, None], -1)[:, 0]
        is_eos = tok == cfg.eos_id
        sum_lp = s.sum_lp + jnp.where(s.finished, 0.0, tok_lp)
        length = s.length + jnp.where(s.finished | is_eos, 0, 1)
        tokens = jax.lax.dynamic_update_slice(s.tokens, tok[:, None],
                                              (0, s.step))
        pos = audio_len + 1 + s.step
        emb = params["tok_emb"][tok[:, None]].astype(dtype)
        nxt, cache = lm_step(params, cfg, emb, pos, s.cache)
        return S(s.step + 1, tokens, cache, nxt[:, 0], sum_lp, length,
                 s.finished | is_eos, rng)

    f = jax.lax.while_loop(cond, body, state)
    avg_lp = f.sum_lp / (f.length.astype(jnp.float32) + 1.0)
    return QwenGenResult(f.tokens, f.length, avg_lp)


def token_budget(cfg: QwenASRConfig, audio_seconds: float) -> int:
    """Dynamic max-token budget with floor (reference: qwen_asr.py:414,
    236-238)."""
    return max(cfg.min_token_budget,
               int(audio_seconds * cfg.max_tokens_per_audio_second))
