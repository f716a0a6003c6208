"""Word-level timestamps from decoder cross-attention (DTW).

The reference obtains word timing through stable-ts' adjustment of
whisper word timestamps (reference: whisperjav/modules/stable_ts_asr.py,
qwen word timestamps via the ForcedAligner). The native mechanism for
Whisper models is alignment from decoder cross-attention: a
teacher-forced pass over the decoded tokens accumulates attention mass
from selected alignment heads into a (tokens × audio-frames) matrix, and
a monotonic Viterbi path (shared with the Qwen aligner) assigns each
token a frame span at 20 ms resolution.

Without model-specific alignment-head tables, the default head set is
every head in the top half of decoder layers — the standard fallback
when published head masks are unavailable.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.models.qwen.aligner import monotonic_align
from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import (
    Params, _split_heads, dense, layer_norm,
)

FRAME_S = 0.02


def default_head_mask(config: WhisperConfig) -> np.ndarray:
    """(L, H) float mask over alignment heads.

    Uses the checkpoint's published per-model head table when the config
    carries one (convert.load_pretrained reads generation_config.
    alignment_heads); otherwise the standard fallback — every head in
    the top half of decoder layers."""
    mask = np.zeros((config.n_text_layer, config.n_text_head), np.float32)
    if config.alignment_heads:
        for layer, head in config.alignment_heads:
            if 0 <= layer < config.n_text_layer \
                    and 0 <= head < config.n_text_head:
                mask[layer, head] = 1.0
    if mask.sum() == 0:
        mask[config.n_text_layer // 2:, :] = 1.0
    return mask / max(mask.sum(), 1.0)


@functools.partial(jax.jit, static_argnames=("config",))
def cross_attention_maps(
    params: Params,
    config: WhisperConfig,
    tokens: jax.Array,       # (B, S) teacher-forced token ids
    xa: jax.Array,           # (B, T_a, d) encoder states
    head_mask: jax.Array,    # (L, H) weights over alignment heads
) -> jax.Array:
    """Teacher-forced decoder pass → (B, S, T_a) attention mass."""
    dec = params["decoder"]
    b, s = tokens.shape
    t_a = xa.shape[1]
    dtype = dec["tok_emb"].dtype
    n_head = config.n_text_head

    x = dec["tok_emb"][tokens].astype(dtype)
    x = x + dec["pos_emb"][:s].astype(dtype)

    q_idx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    k_idx = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    causal = jnp.where(k_idx <= q_idx, 0.0, -jnp.inf)[None, None]

    def block(carry, xs):
        h_state, acc = carry
        layer_p, mask_l = xs
        # self-attention (full-sequence causal)
        h = layer_norm(h_state, layer_p["ln1_s"], layer_p["ln1_b"])
        if "wqkv" in layer_p:      # engine trees fuse q/k/v (quant.py)
            d_model = h.shape[-1]
            qkv = dense(h, layer_p["wqkv"], layer_p["bqkv"])
            q = _split_heads(qkv[..., :d_model], n_head)
            k = _split_heads(qkv[..., d_model:2 * d_model], n_head)
            v = _split_heads(qkv[..., 2 * d_model:], n_head)
        else:
            q = _split_heads(dense(h, layer_p["wq"], layer_p["bq"]), n_head)
            k = _split_heads(dense(h, layer_p["wk"]), n_head)
            v = _split_heads(dense(h, layer_p["wv"], layer_p["bv"]), n_head)
        hd = q.shape[-1]
        sc = hd ** -0.25
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * sc, k * sc,
                            preferred_element_type=jnp.float32) + causal
        w = jax.nn.softmax(logits, axis=-1).astype(dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", w, v,
                       preferred_element_type=jnp.float32).astype(dtype)
        h_state = h_state + dense(a.reshape(b, s, -1), layer_p["wo"],
                                  layer_p["bo"])
        # cross-attention with probability capture
        h = layer_norm(h_state, layer_p["lnx_s"], layer_p["lnx_b"])
        cq = _split_heads(dense(h, layer_p["cwq"], layer_p["cbq"]), n_head)
        ck = _split_heads(dense(xa, layer_p["cwk"]), n_head)
        cv = _split_heads(dense(xa, layer_p["cwv"], layer_p["cbv"]), n_head)
        clogits = jnp.einsum("bqhd,bkhd->bhqk", cq * sc, ck * sc,
                             preferred_element_type=jnp.float32)
        cw = jax.nn.softmax(clogits, axis=-1)          # (B, H, S, T_a) f32
        acc = acc + jnp.einsum("bhqk,h->bqk", cw, mask_l)
        a = jnp.einsum("bhqk,bkhd->bqhd", cw.astype(dtype), cv,
                       preferred_element_type=jnp.float32).astype(dtype)
        h_state = h_state + dense(a.reshape(b, s, -1), layer_p["cwo"],
                                  layer_p["cbo"])
        # mlp
        h = layer_norm(h_state, layer_p["ln2_s"], layer_p["ln2_b"])
        h_state = h_state + dense(
            jax.nn.gelu(dense(h, layer_p["w1"], layer_p["b1"]),
                        approximate=False),
            layer_p["w2"], layer_p["b2"])
        return (h_state, acc), None

    acc0 = jnp.zeros((b, s, t_a), jnp.float32)
    (_, acc), _ = jax.lax.scan(block, (x, acc0),
                               (dec["blocks"], head_mask))
    return acc


@dataclass
class WordSpan:
    text: str
    start: float
    end: float
    tokens: List[int]


def word_timestamps(
    params: Params,
    config: WhisperConfig,
    xa: jax.Array,
    generated: np.ndarray,       # (S,) one row of generated ids (eot-padded)
    tokenizer=None,
    head_mask: Optional[np.ndarray] = None,
    audio_duration: Optional[float] = None,
) -> List[WordSpan]:
    """Align one window's generated tokens to audio → word spans.

    Text tokens only (timestamps/specials stripped); grouping is
    per-token for the fallback tokenizer and whitespace/WordPiece-free
    JA-character granularity with a real tokenizer.
    """
    ids = [int(t) for t in generated if int(t) < config.eot]
    if not ids:
        return []
    if head_mask is None:
        head_mask = default_head_mask(config)
    # pad the token sequence to a 64-multiple so cross_attention_maps
    # compiles per LENGTH BUCKET, not per transcript length (hundreds of
    # distinct lengths would otherwise each trigger a full decoder trace)
    padded_len = ((len(ids) + 1 + 63) // 64) * 64
    seq = [config.sot] + ids + [config.eot] * (padded_len - len(ids) - 1)
    toks = jnp.asarray(np.asarray(seq, np.int32)[None])
    maps = np.asarray(cross_attention_maps(
        params, config, toks, xa, jnp.asarray(head_mask)))[0]
    maps = maps[1:len(ids) + 1]   # drop SOT row and eot padding rows

    # normalize columns over time and take log for the DTW cost
    maps = maps / (maps.sum(axis=-1, keepdims=True) + 1e-9)
    lp = np.log(maps + 1e-9)
    spans = monotonic_align(lp)

    out: List[WordSpan] = []
    for tid, (a, b) in zip(ids, spans):
        text = tokenizer.decode([tid]) if tokenizer is not None else str(tid)
        start = a * FRAME_S
        end = max(b * FRAME_S, start + FRAME_S)
        if audio_duration is not None:
            start = min(start, audio_duration)
            end = min(end, audio_duration)
        out.append(WordSpan(text, start, end, [tid]))
    return out
