"""Qwen3-ASR model: AuT audio encoder + Qwen3 decoder LM in pure JAX.

TPU-native counterpart of the reference's Qwen3-ASR integration
(reference: whisperjav/modules/qwen_asr.py:154-1752 wraps the qwen-asr
package / HF transformers; ADR-003 documents the family). The
architecture matches the published checkpoints so HF weights port via
:mod:`whisperjav_tpu.models.qwen.convert`:

- **audio tower (AuT)**: 128-mel chunks of ``2*n_window`` (200) frames →
  three 3×3 stride-2 Conv2d over (freq, time) → linear ``conv_out`` into
  the tower width (25 tokens per 2 s chunk, positions reset per chunk) →
  pre-LN transformer with **block-windowed bidirectional attention**
  (windows of ``n_window_infer/(2·n_window)`` chunks = 50 tokens) →
  ``ln_post`` → ``proj1``/gelu/``proj2`` adapter into the LM width —
  the Qwen3-Omni AuT encoder semantics (oracle:
  transformers Qwen3OmniMoeAudioEncoder, tests/test_qwen_parity.py);
- **language model**: Qwen3 — RMSNorm, rotary embeddings, grouped-query
  attention with per-head **q/k RMSNorm** and an explicit ``head_dim``
  decoupled from ``d_model/n_heads``, SwiGLU MLP — scan-stacked layers
  like the Whisper core, fixed-shape KV cache;
- decoding: audio embeddings form the prompt prefix; greedy/sampled
  generation with repetition penalty and a dynamic
  max-tokens-per-audio-second budget (reference: qwen_asr.py:414).

Fixed-shape contract: mel time length must be a multiple of
``2 * n_window_infer`` mel frames (= 400, i.e. 4 s) so attention windows
tile exactly; callers pad audio up (see ``mel_frames_for``).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# LM layer-scan unroll factor (same A/B knob as the whisper decoder,
# models/whisper/model.py:_SCAN_UNROLL; trace-time static)
_SCAN_UNROLL = max(1, int(os.environ.get("WJAV_SCAN_UNROLL", "1")))
# column-cache generate step (whisper's ADR-002 lever ported to the LM
# scan); WJAV_QWEN_COLUMN_CACHE=0 restores the full-cache restack path
_COLUMN_CACHE = os.environ.get("WJAV_QWEN_COLUMN_CACHE", "1") != "0"

Params = Dict


@dataclass(frozen=True)
class QwenASRConfig:
    name: str = "qwen3-asr-test"
    # language model (Qwen3)
    vocab_size: int = 4096
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 8
    n_kv_heads: int = 4
    d_ff: int = 1024
    lm_head_dim: int = 0          # 0 → d_model // n_heads
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    # audio tower (AuT)
    n_mels: int = 128
    d_audio: int = 256
    audio_layers: int = 4
    audio_heads: int = 8
    audio_ffn: int = 1024
    audio_downsample_hidden: int = 32
    n_window: int = 100           # mel frames per chunk = 2*n_window
    n_window_infer: int = 400     # mel frames per attention window
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
        return self.lm_head_dim or self.d_model // self.n_heads

    @property
    def chunk_frames(self) -> int:
        """Mel frames per AuT chunk (2 s @ 10 ms hop)."""
        return 2 * self.n_window

    @property
    def chunk_tokens(self) -> int:
        """Audio tokens per chunk after the ×8 conv downsampling."""
        t = self.chunk_frames
        for _ in range(3):
            t = (t + 1) // 2
        return t

    @property
    def window_tokens(self) -> int:
        """Tokens per attention window (block-diagonal)."""
        return self.chunk_tokens * (self.n_window_infer // self.chunk_frames)

    @property
    def mel_multiple(self) -> int:
        """Mel length must be a multiple of this (window tiling)."""
        return self.chunk_frames * (self.n_window_infer // self.chunk_frames)

    def audio_tokens_for(self, n_mel_frames: int) -> int:
        assert n_mel_frames % self.mel_multiple == 0, (
            f"mel length {n_mel_frames} not a multiple of "
            f"{self.mel_multiple}")
        return (n_mel_frames // self.chunk_frames) * self.chunk_tokens


# Published architecture shapes (Qwen3-ASR-1.7B = Qwen3-1.7B LM + AuT;
# the 0.6B row is the ForcedAligner-class LM scale). n_window=50
# (100-frame chunks → 13 tokens) is the chunking the HF reference module
# executes self-consistently (see tests/test_qwen_parity.py note);
# convert.config_from_hf overrides all of this from a real checkpoint.
QWEN_SIZES = {
    "qwen3-asr-0.6b": QwenASRConfig(
        name="qwen3-asr-0.6b", vocab_size=151_936, d_model=1024,
        n_layers=28, n_heads=16, n_kv_heads=8, d_ff=3072, lm_head_dim=128,
        d_audio=1280, audio_layers=32, audio_heads=20, audio_ffn=5120,
        audio_downsample_hidden=480, n_window=50),
    "qwen3-asr-1.7b": QwenASRConfig(
        name="qwen3-asr-1.7b", vocab_size=151_936, d_model=2048,
        n_layers=28, n_heads=16, n_kv_heads=8, d_ff=6144, lm_head_dim=128,
        d_audio=1280, audio_layers=32, audio_heads=20, audio_ffn=5120,
        audio_downsample_hidden=480, n_window=50),
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


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """x (B, T, H, hd); positions (T,) or (B, T). GPT-NeoX half-split."""
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


def _dense(x, w, b: Optional[jax.Array] = None):
    if isinstance(w, dict):
        # int8 weights (quantize_lm_weights): dequant fuses into the
        # matmul via the per-output-channel scale
        out = jnp.dot(x, w["q"].astype(x.dtype),
                      preferred_element_type=jnp.float32
                      ) * w["s"].astype(jnp.float32)
    else:
        out = jnp.dot(x, w.astype(x.dtype),
                      preferred_element_type=jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def sinusoid_positions(length: int, channels: int) -> np.ndarray:
    """Whisper-style sinusoids (the AuT positional embedding formula)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)],
                          axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_lm_blocks(key, cfg: QwenASRConfig, dtype):
    L, d, hd = cfg.n_layers, cfg.d_model, cfg.head_dim
    qd = cfg.n_heads * hd
    kvd = cfg.n_kv_heads * hd
    ks = jax.random.split(key, 8)
    s = d ** -0.5

    def w(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    return {
        "ln1": jnp.ones((L, d), dtype),
        "wq": w(ks[0], (L, d, qd)),
        "wk": w(ks[1], (L, d, kvd)),
        "wv": w(ks[2], (L, d, kvd)),
        "wo": w(ks[3], (L, qd, d)),
        "q_norm": jnp.ones((L, hd), dtype),
        "k_norm": jnp.ones((L, hd), dtype),
        "ln2": jnp.ones((L, d), dtype),
        "w_gate": w(ks[4], (L, d, cfg.d_ff)),
        "w_up": w(ks[5], (L, d, cfg.d_ff)),
        "w_down": w(ks[6], (L, cfg.d_ff, d)),
    }


def _init_audio_tower(key, cfg: QwenASRConfig, dtype):
    da, h = cfg.d_audio, cfg.audio_downsample_hidden
    L = cfg.audio_layers
    s = da ** -0.5
    freq_out = cfg.n_mels
    for _ in range(3):
        freq_out = (freq_out + 1) // 2
    ks = jax.random.split(key, 16)

    def w(k, shape, scale=None):
        return (jax.random.normal(k, shape) * (scale or s)).astype(dtype)

    return {
        # conv2d: torch OIHW layout (out, in, kh, kw)
        "conv2d1_w": w(ks[0], (h, 1, 3, 3), 0.1),
        "conv2d1_b": jnp.zeros((h,), dtype),
        "conv2d2_w": w(ks[1], (h, h, 3, 3), 0.1),
        "conv2d2_b": jnp.zeros((h,), dtype),
        "conv2d3_w": w(ks[2], (h, h, 3, 3), 0.1),
        "conv2d3_b": jnp.zeros((h,), dtype),
        "conv_out_w": w(ks[3], (h * freq_out, da)),   # (in, out), no bias
        "blocks": {
            "ln1_s": jnp.ones((L, da), dtype), "ln1_b": jnp.zeros((L, da), dtype),
            "wq": w(ks[4], (L, da, da)), "bq": jnp.zeros((L, da), dtype),
            "wk": w(ks[5], (L, da, da)), "bk": jnp.zeros((L, da), dtype),
            "wv": w(ks[6], (L, da, da)), "bv": jnp.zeros((L, da), dtype),
            "wo": w(ks[7], (L, da, da)), "bo": jnp.zeros((L, da), dtype),
            "ln2_s": jnp.ones((L, da), dtype), "ln2_b": jnp.zeros((L, da), dtype),
            "w1": w(ks[8], (L, da, cfg.audio_ffn)),
            "b1": jnp.zeros((L, cfg.audio_ffn), dtype),
            "w2": w(ks[9], (L, cfg.audio_ffn, da)),
            "b2": jnp.zeros((L, da), dtype),
        },
        "ln_post_s": jnp.ones((da,), dtype), "ln_post_b": jnp.zeros((da,), dtype),
        "proj1_w": w(ks[10], (da, da)), "proj1_b": jnp.zeros((da,), dtype),
        "proj2_w": w(ks[11], (da, cfg.d_model)),
        "proj2_b": jnp.zeros((cfg.d_model,), dtype),
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
# audio tower (AuT)
# ---------------------------------------------------------------------------

def _audio_block(x, p, n_heads):
    """x (N, W, d): bidirectional attention within each window row."""
    n, wlen, d = x.shape
    h = layer_norm(x, p["ln1_s"], p["ln1_b"])
    q = _dense(h, p["wq"], p["bq"]).reshape(n, wlen, n_heads, -1)
    k = _dense(h, p["wk"], p["bk"]).reshape(n, wlen, n_heads, -1)
    v = _dense(h, p["wv"], p["bv"]).reshape(n, wlen, n_heads, -1)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + _dense(o.reshape(n, wlen, d), p["wo"], p["bo"])
    h = layer_norm(x, p["ln2_s"], p["ln2_b"])
    x = x + _dense(jax.nn.gelu(_dense(h, p["w1"], p["b1"]),
                               approximate=False), p["w2"], p["b2"])
    return x


def encode_audio(params: Params, cfg: QwenASRConfig,
                 mel: jax.Array) -> jax.Array:
    """mel (B, n_mels, T) → audio embeddings (B, tokens, d_model).

    T must be a multiple of ``cfg.mel_multiple`` (400 = 4 s by default);
    tokens = (T / chunk_frames) * chunk_tokens (12.5 Hz).
    """
    a = params["audio"]
    b, m, t = mel.shape
    cf, ct = cfg.chunk_frames, cfg.chunk_tokens
    n_chunk = t // cf

    # (B, M, T) → per-chunk images (B*n_chunk, 1, M, cf)
    x = mel.reshape(b, m, n_chunk, cf).transpose(0, 2, 1, 3)
    x = x.reshape(b * n_chunk, 1, m, cf)

    def conv2d(x, w, bias):
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(2, 2),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32)
        return (out + bias.astype(jnp.float32)[None, :, None, None]
                ).astype(x.dtype)

    x = jax.nn.gelu(conv2d(x, a["conv2d1_w"], a["conv2d1_b"]),
                    approximate=False)
    x = jax.nn.gelu(conv2d(x, a["conv2d2_w"], a["conv2d2_b"]),
                    approximate=False)
    x = jax.nn.gelu(conv2d(x, a["conv2d3_w"], a["conv2d3_b"]),
                    approximate=False)
    # (BN, C, F', ct) → (BN, ct, C*F') matching torch's permute+view
    bn, c, fq, tt = x.shape
    x = x.transpose(0, 3, 1, 2).reshape(bn, tt, c * fq)
    x = _dense(x, a["conv_out_w"])                        # (BN, ct, da)

    # per-chunk positions (reset every chunk — AuT semantics)
    pos = jnp.asarray(sinusoid_positions(ct, cfg.d_audio), x.dtype)
    x = x + pos[None]

    # window rows: (B * n_windows, window_tokens, da)
    wt = cfg.window_tokens
    x = x.reshape(b, n_chunk * ct, cfg.d_audio)
    n_win = (n_chunk * ct) // wt
    x = x.reshape(b * n_win, wt, cfg.d_audio)

    def body(h, layer_p):
        return _audio_block(h, layer_p, cfg.audio_heads), None

    x, _ = jax.lax.scan(body, x, a["blocks"])
    x = layer_norm(x, a["ln_post_s"], a["ln_post_b"])
    x = _dense(x, a["proj1_w"], a["proj1_b"])
    x = jax.nn.gelu(x, approximate=False)
    x = _dense(x, a["proj2_w"], a["proj2_b"])
    return x.reshape(b, n_chunk * ct, cfg.d_model)


def mel_frames_for(cfg: QwenASRConfig, n_mel_frames: int) -> int:
    """Round a mel length UP to the fixed-shape multiple."""
    mult = cfg.mel_multiple
    return ((n_mel_frames + mult - 1) // mult) * mult


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


def _lm_block(x, p, cache_k, cache_v, pos, cfg: QwenASRConfig, bias,
              column_mode: bool = False):
    b, q_len, d = x.shape
    nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    h = rms_norm(x, p["ln1"], cfg.rms_eps)
    positions = pos + jnp.arange(q_len)
    if "wqkv" in p:
        # fused projection (fuse_lm_qkv): one matmul per layer per step
        # instead of three — same math per output column (Qwen3 has
        # no qkv biases); float-epsilon rounding drift possible
        qd, kvd = nh * hd, nkv * hd
        qkv = _dense(h, p["wqkv"])
        q = qkv[..., :qd].reshape(b, q_len, nh, hd)
        k = qkv[..., qd:qd + kvd].reshape(b, q_len, nkv, hd)
        v = qkv[..., qd + kvd:]
    else:
        q = _dense(h, p["wq"]).reshape(b, q_len, nh, hd)
        k = _dense(h, p["wk"]).reshape(b, q_len, nkv, hd)
        v = _dense(h, p["wv"])
    # Qwen3 per-head q/k RMSNorm, then rotary
    q = rope(rms_norm(q, p["q_norm"], cfg.rms_eps), positions, cfg.rope_theta)
    k = rope(rms_norm(k, p["k_norm"], cfg.rms_eps), positions, cfg.rope_theta)
    scale = hd ** -0.5
    rep = nh // nkv
    t_max = cache_k.shape[1]
    if column_mode:
        # q_len == 1 generate step (whisper model.py column-cache port —
        # docs/ADR-002): the layer scan emits ONLY this layer's new K/V
        # column; lm_step writes all layers with ONE stacked
        # dynamic_update_slice into the while-carried cache, instead of
        # restacking the full (L, B, T, kv_d) cache through scan ys every
        # step (read+write of the whole cache as pure shuffle).
        # Attention = old cache (bias masks k >= pos) + the new column
        # appended on the key axis. GQA runs as a grouped einsum —
        # no materialized jnp.repeat copy of the cache.
        qg = (q * scale).reshape(b, q_len, nkv, rep, hd)
        kk = cache_k.astype(q.dtype).reshape(b, t_max, nkv, hd)
        vv = cache_v.astype(q.dtype).reshape(b, t_max, nkv, hd)
        k_new = k.reshape(b, 1, nkv, hd)
        v_new = v.reshape(b, 1, nkv, hd)
        lg_c = jnp.einsum("bqgrd,bkgd->bgrqk", qg, kk,
                          preferred_element_type=jnp.float32) + bias
        lg_n = jnp.einsum("bqgrd,bkgd->bgrqk", qg, k_new,
                          preferred_element_type=jnp.float32)
        lg = jnp.concatenate([lg_c, lg_n], axis=-1)
        a = jax.nn.softmax(lg.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = (jnp.einsum("bgrqk,bkgd->bqgrd", a[..., :t_max], vv,
                        preferred_element_type=jnp.float32)
             + jnp.einsum("bgrqk,bkgd->bqgrd", a[..., t_max:], v_new,
                          preferred_element_type=jnp.float32)
             ).astype(x.dtype)
        x = x + _dense(o.reshape(b, q_len, nh * hd), p["wo"])
        h = rms_norm(x, p["ln2"], cfg.rms_eps)
        gate = jax.nn.silu(_dense(h, p["w_gate"]))
        x = x + _dense(gate * _dense(h, p["w_up"]), p["w_down"])
        return (x, k.reshape(b, 1, nkv * hd).astype(cache_k.dtype),
                v.reshape(b, 1, nkv * hd).astype(cache_v.dtype))
    cache_k = jax.lax.dynamic_update_slice(
        cache_k, k.reshape(b, q_len, nkv * hd).astype(cache_k.dtype),
        (0, pos, 0))
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, v.astype(cache_v.dtype), (0, pos, 0))
    # GQA: split heads transiently, repeat kv heads
    kk = jnp.repeat(cache_k.astype(q.dtype).reshape(b, t_max, nkv, hd),
                    rep, axis=2)
    vv = jnp.repeat(cache_v.astype(q.dtype).reshape(b, t_max, nkv, hd),
                    rep, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, kk,
                        preferred_element_type=jnp.float32) + bias
    a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, vv,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + _dense(o.reshape(b, q_len, nh * hd), p["wo"])
    h = rms_norm(x, p["ln2"], cfg.rms_eps)
    gate = jax.nn.silu(_dense(h, p["w_gate"]))
    x = x + _dense(gate * _dense(h, p["w_up"]), p["w_down"])
    return x, cache_k, cache_v


def fuse_lm_qkv(params: Params) -> Params:
    """Concatenate the LM blocks' q/k/v projections into one stacked
    (L, d, q_dim + 2·kv_dim) matmul (``wqkv``).

    Same lever as whisper's quant.py:fuse_qkv_weights: the generate
    loop's per-layer matmuls are small, so kernel count is a real share
    of step time. Mathematically identical (each output column's dot product
    is unchanged; Qwen3 projections carry no biases; rounding may
    drift at float epsilon if XLA re-blocks the wider reduction). Accepts either a
    full ASR tree (LM blocks under ``params["blocks"]``) or a bare LM
    tree; returns the tree unchanged if already fused.
    """
    if "wqkv" in params.get("blocks", {}):
        return params
    out = dict(params)
    blocks = dict(params["blocks"])
    wq, wk, wv = blocks.pop("wq"), blocks.pop("wk"), blocks.pop("wv")
    blocks["wqkv"] = jnp.concatenate(
        [jnp.asarray(wq), jnp.asarray(wk), jnp.asarray(wv)], axis=-1)
    out["blocks"] = blocks
    return out


def quantize_lm_weights(params: Params) -> Params:
    """int8-quantize the LM generate-hot matmuls + the lm head.

    Same lever as whisper's quant.py:quantize_decoder_weights: the LM
    block weights (~3.4 GB bf16 for 1.7B) and the (d, 151936) head
    (~0.6 GB) are read EVERY generate step; symmetric per-output-channel
    int8 halves that stream, with the dequant fused into each matmul
    (_dense). The bf16 tok_emb stays for embedding lookups; norms stay
    bf16. Apply AFTER fuse_lm_qkv (per-output-channel scales commute
    with the concat). The audio tower is untouched — it runs once per
    window and amortizes weight reads over hundreds of positions.
    """
    def _q(w):
        w32 = jnp.asarray(w, jnp.float32)
        s = jnp.max(jnp.abs(w32), axis=-2, keepdims=True) / 127.0 + 1e-12
        return {"q": jnp.clip(jnp.round(w32 / s), -127, 127
                              ).astype(jnp.int8), "s": s}

    out = dict(params)
    blocks = dict(params["blocks"])
    for name in ("wqkv", "wq", "wk", "wv", "wo",
                 "w_gate", "w_up", "w_down"):
        if name in blocks and not isinstance(blocks[name], dict):
            blocks[name] = _q(blocks[name])
    out["blocks"] = blocks
    if "lm_head" in params and "lm_head_q" not in params:
        out["lm_head_q"] = _q(params["lm_head"])
        out.pop("lm_head")
    return out


def lm_step(params: Params, cfg: QwenASRConfig, x_emb: jax.Array,
            pos, cache: LMCache) -> Tuple[jax.Array, LMCache]:
    """Embedded inputs (B, q_len, d) at [pos, pos+q) → logits + cache."""
    b, q_len, _ = x_emb.shape
    t_max = cache.k.shape[2]
    if _COLUMN_CACHE and q_len == 1:
        # column-cache generate step (see _lm_block column_mode): scan ys
        # are only the new K/V columns; ONE stacked write updates every
        # layer. WJAV_QWEN_COLUMN_CACHE=0 restores the restack path (A/B).
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (1, t_max), 1)
        col_bias = jnp.where(k_idx < pos, 0.0,
                             -jnp.inf)[None, None, None]   # (1,1,1,1,T)

        def body(h, xs):
            layer_p, ck, cv = xs
            h, kc, vc = _lm_block(h, layer_p, ck, cv, pos, cfg, col_bias,
                                  column_mode=True)
            return h, (kc, vc)

        x, (k_cols, v_cols) = jax.lax.scan(
            body, x_emb, (params["blocks"], cache.k, cache.v),
            unroll=_SCAN_UNROLL)
        nk = jax.lax.dynamic_update_slice(cache.k, k_cols, (0, 0, pos, 0))
        nv = jax.lax.dynamic_update_slice(cache.v, v_cols, (0, 0, pos, 0))
    else:
        q_idx = pos + jax.lax.broadcasted_iota(jnp.int32, (q_len, t_max), 0)
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, t_max), 1)
        bias = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)[None, None]

        def body(h, xs):
            layer_p, ck, cv = xs
            h, nk, nv = _lm_block(h, layer_p, ck, cv, pos, cfg, bias)
            return h, (nk, nv)

        x, (nk, nv) = jax.lax.scan(body, x_emb,
                                   (params["blocks"], cache.k, cache.v),
                                   unroll=_SCAN_UNROLL)
    x = rms_norm(x, params["ln_f"], cfg.rms_eps)
    if "lm_head_q" in params:       # int8 head (quantize_lm_weights)
        lm = params["lm_head_q"]
        logits = jnp.dot(x, lm["q"].astype(x.dtype),
                         preferred_element_type=jnp.float32
                         ) * lm["s"].astype(jnp.float32)
    else:
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
                                             "repetition_penalty",
                                             "temperature"))
def generate(params: Params, cfg: QwenASRConfig, mel: jax.Array,
             max_new: int, audio_len: int,
             repetition_penalty: float = 1.1,
             temperature: float = 0.0,
             rng: Optional[jax.Array] = None,
             ctx_ids: Optional[jax.Array] = None) -> QwenGenResult:
    """Transcribe mel windows: audio prefix [+ context] + BOS → greedy
    generation.

    audio_len: number of audio embedding positions to keep as the LM
    prefix (static; ≤ cfg.audio_tokens_for(mel frames)).
    ctx_ids: optional (1, L) or (B, L) int32 context token ids inserted
    between the audio prefix and BOS — the contextual-biasing hook the
    reference exposes as --context/--context-file (reference:
    main.py:676-681; Qwen3-ASR conditions generation on a free-text
    context prompt). Each distinct L compiles once; context is constant
    per run.
    """
    b = mel.shape[0]
    audio_emb = encode_audio(params, cfg, mel)[:, :audio_len]
    ctx_len = 0 if ctx_ids is None else ctx_ids.shape[-1]
    t_max = audio_len + ctx_len + 1 + max_new
    dtype = params["tok_emb"].dtype
    cache = LMCache.zeros(cfg, b, t_max, dtype)

    bos = jnp.full((b, 1), cfg.bos_id, jnp.int32)
    parts = [audio_emb]
    if ctx_ids is not None:
        ctx = jnp.broadcast_to(ctx_ids, (b, ctx_len))
        parts.append(params["tok_emb"][ctx].astype(audio_emb.dtype))
    parts.append(params["tok_emb"][bos].astype(audio_emb.dtype))
    prefix = jnp.concatenate(parts, axis=1)
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
        seen: jax.Array   # (B, V) emitted-id membership, incremental

    state = S(jnp.int32(0), jnp.full((b, max_new), cfg.eos_id, jnp.int32),
              cache, cur, jnp.zeros((b,), jnp.float32),
              jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.bool_), rng,
              jnp.zeros((b, cfg.vocab_size if repetition_penalty != 1.0
                         else 1), jnp.bool_))

    def cond(s):
        return (s.step < max_new) & ~jnp.all(s.finished)

    def body(s):
        logits = s.cur
        if repetition_penalty != 1.0:
            # incremental membership carry (one (B, V) one-hot OR per
            # step) — neither a (B, V) scatter (TPU serializes those,
            # ~ms/step) nor the old (B, max_new, V) broadcast-compare
            # rebuild (see whisper decode.py / ADR-002)
            vid = jax.lax.broadcasted_iota(jnp.int32, (b, cfg.vocab_size), 1)
            seen = s.seen & (vid != cfg.eos_id)
            pen = jnp.where(logits > 0, logits / repetition_penalty,
                            logits * repetition_penalty)
            logits = jnp.where(seen, pen, logits)
        if temperature == 0.0:
            # static greedy: skip the per-step (B, V) threefry draw
            rng = s.rng
            tok = jnp.argmax(logits, axis=-1)
        else:
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
        if repetition_penalty != 1.0:
            vid = jax.lax.broadcasted_iota(jnp.int32, (b, cfg.vocab_size), 1)
            new_seen = s.seen | (vid == tok[:, None])
        else:
            new_seen = s.seen
        pos = audio_len + ctx_len + 1 + s.step
        emb = params["tok_emb"][tok[:, None]].astype(dtype)
        nxt, cache = lm_step(params, cfg, emb, pos, s.cache)
        return S(s.step + 1, tokens, cache, nxt[:, 0], sum_lp, length,
                 s.finished | is_eos, rng, new_seen)

    f = jax.lax.while_loop(cond, body, state)
    avg_lp = f.sum_lp / (f.length.astype(jnp.float32) + 1.0)
    return QwenGenResult(f.tokens, f.length, avg_lp)


def token_budget(cfg: QwenASRConfig, audio_seconds: float) -> int:
    """Dynamic max-token budget with floor (reference: qwen_asr.py:414,
    236-238)."""
    return max(cfg.min_token_budget,
               int(audio_seconds * cfg.max_tokens_per_audio_second))


@functools.partial(jax.jit, static_argnames=("cfg", "max_new",
                                             "repetition_penalty",
                                             "temperature"))
def generate_text(params: Params, cfg: QwenASRConfig,
                  prompt_ids: jax.Array, prompt_len: jax.Array,
                  max_new: int,
                  repetition_penalty: float = 1.0,
                  temperature: float = 0.0,
                  rng: Optional[jax.Array] = None) -> QwenGenResult:
    """LM-only generation (no audio tower) — the TPU local-translation
    backend's decode loop (role of llama.cpp generation in the
    reference's translate/local_backend.py).

    prompt_ids: (1, L) RIGHT-padded prompt; prompt_len: (1,) real length.
    Right padding is safe: the causal mask keeps pad keys out of the
    last real token's prefill attention, and each decode step overwrites
    the pad slot at its own position before attending to it. L should be
    bucketed by the caller so each bucket compiles once.
    """
    b, L = prompt_ids.shape
    t_max = L + max_new
    dtype = params["tok_emb"].dtype
    cache = LMCache.zeros(cfg, b, t_max, dtype)
    emb = params["tok_emb"][prompt_ids].astype(dtype)
    logits, cache = lm_step(params, cfg, emb, 0, cache)
    cur = logits[jnp.arange(b), prompt_len - 1]

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
        seen: jax.Array   # (B, V) emitted-id membership, incremental

    state = S(jnp.int32(0), jnp.full((b, max_new), cfg.eos_id, jnp.int32),
              cache, cur, jnp.zeros((b,), jnp.float32),
              jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.bool_), rng,
              jnp.zeros((b, cfg.vocab_size if repetition_penalty != 1.0
                         else 1), jnp.bool_))

    def cond(s):
        return (s.step < max_new) & ~jnp.all(s.finished)

    def body(s):
        logits = s.cur
        if repetition_penalty != 1.0:
            # incremental membership carry (see generate() above)
            vid = jax.lax.broadcasted_iota(jnp.int32, (b, cfg.vocab_size), 1)
            seen = s.seen & (vid != cfg.eos_id)
            pen = jnp.where(logits > 0, logits / repetition_penalty,
                            logits * repetition_penalty)
            logits = jnp.where(seen, pen, logits)
        if temperature == 0.0:
            rng = s.rng
            tok = jnp.argmax(logits, axis=-1)
        else:
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
        if repetition_penalty != 1.0:
            vid = jax.lax.broadcasted_iota(jnp.int32, (b, cfg.vocab_size), 1)
            new_seen = s.seen | (vid == tok[:, None])
        else:
            new_seen = s.seen
        # all rows share prompt_len (callers pass B=1); generated tokens
        # land at prompt_len + step, overwriting stale pad cache slots
        pos = prompt_len[0] + s.step
        emb = params["tok_emb"][tok[:, None]].astype(dtype)
        nxt, cache = lm_step(params, cfg, emb, pos, s.cache)
        return S(s.step + 1, tokens, cache, nxt[:, 0], sum_lp, length,
                 s.finished | is_eos, rng, new_seen)

    f = jax.lax.while_loop(cond, body, state)
    avg_lp = f.sum_lp / (f.length.astype(jnp.float32) + 1.0)
    return QwenGenResult(f.tokens, f.length, avg_lp)
