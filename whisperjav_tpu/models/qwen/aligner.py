"""ForcedAligner-class non-autoregressive audio/text aligner in JAX.

TPU-native counterpart of the reference's Qwen ForcedAligner-0.6B
(reference: whisperjav/modules/qwen_asr.py:1093-1320 standalone aligner
mode; ADR-003 — non-autoregressive, 180 s audio limit) built fresh:

- audio tower (stride-4 conv + transformer, 40 ms frames) and a
  bidirectional text encoder project into a shared space;
- a scaled similarity matrix text×audio is computed on device;
- the monotonic alignment path is extracted host-side with a Viterbi
  DP (monotonic-alignment-search recurrence), yielding per-token
  [start, end] times.

``merge_master_with_timestamps`` reconciles the punctuated master ASR
text with the aligner's unpunctuated tokens (reference: qwen_asr.py:33).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.models.qwen.model import (
    QwenASRConfig, _dense, rms_norm, rope,
)

FRAME_S = 0.04


@dataclass(frozen=True)
class AlignerConfig:
    vocab_size: int = 4096
    d_model: int = 192
    n_layers: int = 4
    n_heads: int = 6
    n_mels: int = 128
    rope_theta: float = 10_000.0
    max_audio_s: float = 180.0   # reference limit (qwen_asr.py:215)


def init_params(cfg: AlignerConfig, key: jax.Array,
                dtype=jnp.float32) -> Dict:
    ka, kt, ke = jax.random.split(key, 3)
    d = cfg.d_model
    s = d ** -0.5
    L = cfg.n_layers

    def w(k, shape, scale=None):
        return (jax.random.normal(k, shape) * (scale or s)).astype(dtype)

    ks = jax.random.split(ka, 8)
    blocks = {
        "ln1": jnp.ones((L, d), dtype),
        "wq": w(ks[0], (L, d, d)), "wk": w(ks[1], (L, d, d)),
        "wv": w(ks[2], (L, d, d)), "wo": w(ks[3], (L, d, d)),
        "ln2": jnp.ones((L, d), dtype),
        "w1": w(ks[4], (L, d, 4 * d)), "w2": w(ks[5], (L, 4 * d, d)),
    }
    kt1, kt2 = jax.random.split(kt)
    ks2 = jax.random.split(kt2, 8)
    text_blocks = {
        "ln1": jnp.ones((L, d), dtype),
        "wq": w(ks2[0], (L, d, d)), "wk": w(ks2[1], (L, d, d)),
        "wv": w(ks2[2], (L, d, d)), "wo": w(ks2[3], (L, d, d)),
        "ln2": jnp.ones((L, d), dtype),
        "w1": w(ks2[4], (L, d, 4 * d)), "w2": w(ks2[5], (L, 4 * d, d)),
    }
    return {
        "conv1_w": w(ke, (d, cfg.n_mels, 3), 0.05),
        "conv1_b": jnp.zeros((d,), dtype),
        "conv2_w": w(jax.random.fold_in(ke, 1), (d, d, 3), 0.05),
        "conv2_b": jnp.zeros((d,), dtype),
        "audio_blocks": blocks,
        "audio_ln": jnp.ones((d,), dtype),
        "tok_emb": w(kt1, (cfg.vocab_size, d)),
        "text_blocks": text_blocks,
        "text_ln": jnp.ones((d,), dtype),
        "temp": jnp.ones((), dtype) * 10.0,
    }


def _block(x, p, n_heads, theta, mask=None):
    """Transformer block; ``mask`` (B, T) True at VALID positions.

    Masking padded keys keeps bucketed batch results identical to
    tight-padded per-clip results (up to conv edge frames) — the
    property that makes fixed-shape bucketing a free lunch on TPU."""
    b, t, d = x.shape
    h = rms_norm(x, p["ln1"], 1e-6)
    pos = jnp.arange(t)
    q = rope(_dense(h, p["wq"]).reshape(b, t, n_heads, -1), pos, theta)
    k = rope(_dense(h, p["wk"]).reshape(b, t, n_heads, -1), pos, theta)
    v = _dense(h, p["wv"]).reshape(b, t, n_heads, -1)
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    a = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + _dense(o.reshape(b, t, d), p["wo"])
    h = rms_norm(x, p["ln2"], 1e-6)
    return x + _dense(jax.nn.gelu(_dense(h, p["w1"]), approximate=False),
                      p["w2"])


@functools.partial(jax.jit, static_argnames=("cfg",))
def similarity(params: Dict, cfg: AlignerConfig, mel: jax.Array,
               tokens: jax.Array,
               mel_valid: Optional[jax.Array] = None,
               tok_valid: Optional[jax.Array] = None) -> jax.Array:
    """mel (B, n_mels, T_mel), tokens (B, N) → logits (B, N, T_mel/4).

    ``mel_valid``/``tok_valid`` (B,) give true lengths so padded audio
    frames / pad tokens are masked out of attention — required for
    bucketed fixed-shape batching (ADR-002 round 5: the per-frame
    dynamic-shape path recompiled per (T, N) pair and spent 1,011 s of
    a 1,456 s qwen-mode file on alignment)."""
    def conv(x, w, b, stride):
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(stride,),
            padding=((1, 1),), dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
        return (out + b.astype(jnp.float32)[None, :, None]).astype(x.dtype)

    a = jax.nn.gelu(conv(mel, params["conv1_w"], params["conv1_b"], 2),
                    approximate=False)
    a = jax.nn.gelu(conv(a, params["conv2_w"], params["conv2_b"], 2),
                    approximate=False)
    a = jnp.swapaxes(a, 1, 2)

    t_frames = a.shape[1]
    amask = (None if mel_valid is None else
             jnp.arange(t_frames)[None, :]
             < ((mel_valid[:, None] + 3) // 4))
    tmask = (None if tok_valid is None else
             jnp.arange(tokens.shape[1])[None, :] < tok_valid[:, None])

    def abody(h, lp):
        return _block(h, lp, cfg.n_heads, cfg.rope_theta, amask), None

    a, _ = jax.lax.scan(abody, a, params["audio_blocks"])
    a = rms_norm(a, params["audio_ln"], 1e-6)

    def tbody(h, lp):
        return _block(h, lp, cfg.n_heads, cfg.rope_theta, tmask), None

    t = params["tok_emb"][tokens]
    t, _ = jax.lax.scan(tbody, t, params["text_blocks"])
    t = rms_norm(t, params["text_ln"], 1e-6)

    a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-6)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-6)
    return jnp.einsum("bnd,bmd->bnm", t, a,
                      preferred_element_type=jnp.float32) * params["temp"]


class TokenSpan(NamedTuple):
    token: int
    start: float
    end: float


def monotonic_align(log_probs: np.ndarray) -> List[Tuple[int, int]]:
    """Viterbi monotonic alignment over (N_tokens, T_frames) log-probs.

    Recurrence (MAS): Q[i,j] = lp[i,j] + max(Q[i-1,j-1], Q[i,j-1]).
    Returns per-token (start_frame, end_frame_exclusive).
    """
    n, t = log_probs.shape
    if n == 0 or t == 0:
        return []
    if t < n:   # degenerate: fewer frames than tokens — spread evenly
        bounds = np.linspace(0, t, n + 1).astype(int)
        return [(bounds[i], max(bounds[i + 1], bounds[i] + 1))
                for i in range(n)]
    # column sweep, vectorized over tokens: q[:, j] depends only on
    # q[:, j-1] (stay) and its one-down shift (diag), so the DP runs in
    # T numpy vector ops instead of N*T Python iterations (the scalar
    # loop cost ~0.1 s per frame at N~200 — material at 300+ frames/file)
    neg = -1e30
    lp = np.asarray(log_probs, np.float64)
    q = np.full((n, t), neg, np.float64)
    back = np.zeros((n, t), np.int8)   # 1 = came from i-1 (new token)
    q[0, 0] = lp[0, 0]
    prev = q[:, 0]
    for j in range(1, t):
        diag = np.empty(n, np.float64)
        diag[0] = neg            # row 0 can only stay
        diag[1:] = prev[:-1]
        take_diag = diag >= prev
        col = np.where(take_diag, diag, prev) + lp[:, j]
        col[0] = prev[0] + lp[0, j]      # row 0: stay only
        back[:, j] = take_diag
        back[0, j] = 0
        q[:, j] = col
        prev = col
    # backtrack
    spans = [[0, 0] for _ in range(n)]
    i, j = n - 1, t - 1
    end = t
    while i >= 0:
        if back[i, j] == 1 or j == 0:
            spans[i] = [j, end]
            end = j
            i -= 1
            j = max(j - 1, 0)
        else:
            j -= 1
    spans[0][0] = 0
    return [(int(a), int(b)) for a, b in spans]


class ForcedAligner:
    """Host-facing aligner: tokens + audio → per-token timestamps."""

    def __init__(self, cfg: Optional[AlignerConfig] = None,
                 params: Optional[Dict] = None,
                 key: Optional[jax.Array] = None):
        self.cfg = cfg or AlignerConfig()
        self.params = params if params is not None else init_params(
            self.cfg, key if key is not None else jax.random.PRNGKey(0))

    def align(self, mel: np.ndarray, tokens: Sequence[int]) -> List[TokenSpan]:
        """mel (n_mels, T_mel) for one clip; tokens text ids → spans."""
        if not tokens:
            return []
        toks = jnp.asarray(np.asarray(tokens, np.int32)[None, :])
        logits = similarity(self.params, self.cfg, jnp.asarray(mel[None]),
                            toks)
        lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))[0]
        spans = monotonic_align(lp)
        return [TokenSpan(int(t), a * FRAME_S, b * FRAME_S)
                for t, (a, b) in zip(tokens, spans)]

    def align_batch(self, mels: np.ndarray, token_rows: Sequence[Sequence[int]],
                    mel_valid: Sequence[int],
                    n_pad: Optional[int] = None) -> List[List[TokenSpan]]:
        """ONE fixed-shape device call for a whole batch of clips.

        mels (B, n_mels, T_mel) padded to a shared bucket; token_rows are
        ragged per row (padded to the batch max internally); mel_valid
        gives each row's true mel length. Attention masks keep padded
        frames/tokens out of the similarity; log-softmax and the Viterbi
        DP run host-side per row over the VALID slice only, so results
        match tight-padded per-clip alignment. Replaces the per-frame
        dynamic-shape path that recompiled per (T, N) pair (ADR-002 r5).
        """
        b = int(mels.shape[0])
        counts = [len(t) for t in token_rows]
        n_max = max(counts, default=0)
        if n_max == 0:
            return [[] for _ in range(b)]
        if n_pad is not None:        # caller pins the token axis to a
            n_max = max(n_max, n_pad)  # bucket so program shapes repeat
        toks = np.zeros((b, n_max), np.int32)
        for r, row in enumerate(token_rows):
            toks[r, :len(row)] = row
        logits = similarity(
            self.params, self.cfg, jnp.asarray(mels),
            jnp.asarray(toks),
            jnp.asarray(np.asarray(mel_valid, np.int32)),
            jnp.asarray(np.asarray(counts, np.int32)))
        raw = np.asarray(logits)    # (B, N_max, T_mel/4)
        out: List[List[TokenSpan]] = []
        for r, row in enumerate(token_rows):
            n = counts[r]
            if n == 0:
                out.append([])
                continue
            frames = max(1, (int(mel_valid[r]) + 3) // 4)
            sl = raw[r, :n, :frames].astype(np.float64)
            sl -= sl.max(axis=-1, keepdims=True)
            lp = sl - np.log(np.exp(sl).sum(axis=-1, keepdims=True))
            spans = monotonic_align(lp)
            out.append([TokenSpan(int(t), a * FRAME_S, b_ * FRAME_S)
                        for t, (a, b_) in zip(row, spans)])
        return out


# ---------------------------------------------------------------------------
# master-text reconciliation
# ---------------------------------------------------------------------------

def merge_master_with_timestamps(
    master_text: str,
    aligned: Sequence[TokenSpan],
    token_texts: Sequence[str],
) -> List[Tuple[str, float, float]]:
    """Reconcile punctuated master text with unpunctuated aligner tokens.

    Walks the master text assigning each aligner token's time span to the
    matching characters; punctuation between matches inherits the previous
    token's end time (reference: qwen_asr.py:33 merge_master step).
    Returns [(text_piece, start, end)] covering the master text in order.
    """
    out: List[Tuple[str, float, float]] = []
    pos = 0
    master = master_text
    last_end = 0.0
    for span, tok_text in zip(aligned, token_texts):
        if not tok_text:
            continue
        idx = master.find(tok_text, pos)
        if idx < 0:
            # token not found (cleaner changed it): attach to timeline order
            out.append((tok_text, span.start, span.end))
            last_end = span.end
            continue
        if idx > pos:
            # intervening punctuation/whitespace rides the previous span
            out.append((master[pos:idx], last_end, span.start))
        out.append((master[idx:idx + len(tok_text)], span.start, span.end))
        pos = idx + len(tok_text)
        last_end = span.end
    if pos < len(master):
        out.append((master[pos:], last_end, last_end))
    return out
