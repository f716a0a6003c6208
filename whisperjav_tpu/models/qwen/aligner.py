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


def _similarity(params: Dict, cfg: AlignerConfig, mel: jax.Array,
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


similarity = jax.jit(_similarity, static_argnames=("cfg",))


def _dp_backtrack(lp: jax.Array, frames: jax.Array,
                  n_tok: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """On-device monotonic Viterbi + backtrack (one batch row).

    lp (N, T) float32 masked log-probs, frames/n_tok scalars: the row's
    true lengths inside the padded buffers. Mirrors ``monotonic_align``
    exactly (same recurrence, same ``diag >= prev`` tie-break, same
    backtrack rules) so spans match the host DP bit-for-bit on float32-
    exact inputs. Returns (starts, ends) (N,) int32 frame indices; slots
    past n_tok-1 are undefined (callers slice by token count)."""
    n, t = lp.shape
    neg = jnp.float32(-1e30)

    prev0 = jnp.full((n,), neg, jnp.float32).at[0].set(lp[0, 0])

    def col_step(prev, inputs):
        j, lp_j = inputs                       # lp_j (N,)
        diag = jnp.concatenate([jnp.array([neg]), prev[:-1]])
        take_diag = diag >= prev
        col = jnp.where(take_diag, diag, prev) + lp_j
        col = col.at[0].set(prev[0] + lp_j[0])   # row 0: stay only
        back_j = take_diag.at[0].set(False)
        active = j < frames
        prev = jnp.where(active, col, prev)
        return prev, jnp.where(active, back_j, False)

    js = jnp.arange(1, t)
    _, back_cols = jax.lax.scan(col_step, prev0, (js, lp[:, 1:].T))
    # back (N, T): column 0 is all zeros (host DP never sets it)
    back = jnp.concatenate(
        [jnp.zeros((n, 1), bool), back_cols.T], axis=1)

    def bt_cond(state):
        i, _j, _end, _s, _e = state
        return i >= 0

    def bt_body(state):
        i, j, end, starts, ends = state
        hit = back[i, j] | (j == 0)
        starts = jnp.where(hit, starts.at[i].set(j), starts)
        ends = jnp.where(hit, ends.at[i].set(end), ends)
        end = jnp.where(hit, j, end)
        i = jnp.where(hit, i - 1, i)
        j = jnp.where(hit, jnp.maximum(j - 1, 0), j - 1)
        return i, j, end, starts, ends

    starts0 = jnp.zeros((n,), jnp.int32)
    ends0 = jnp.zeros((n,), jnp.int32)
    i0 = n_tok.astype(jnp.int32) - 1
    j0 = frames.astype(jnp.int32) - 1
    _, _, _, starts, ends = jax.lax.while_loop(
        bt_cond, bt_body, (i0, j0, frames.astype(jnp.int32),
                           starts0, ends0))
    return starts.at[0].set(0), ends


@functools.partial(jax.jit, static_argnames=("cfg",))
def align_spans(params: Dict, cfg: AlignerConfig, audio: jax.Array,
                tokens: jax.Array, audio_valid: jax.Array,
                tok_valid: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Whole alignment on device: int16 audio (B, S) + tokens (B, N) →
    (starts, ends) (B, N) int32 conv-frame indices.

    Fuses the mel frontend, the similarity towers, masked log-softmax,
    the monotonic Viterbi DP, and the backtrack into ONE program, so
    the host↔device traffic is int16 audio up and 2·B·N int32 down —
    vs the split path's mel drain + mel re-upload + full (B, N, T/4)
    float32 logits drain (~100 MB per 32-row 32 s bucket through a
    37 MB/s tunnel; ADR-002 round 5)."""
    from whisperjav_tpu.ops.mel import log_mel_spectrogram

    audio_f = audio.astype(jnp.float32) / 32767.0
    mel = log_mel_spectrogram(audio_f, n_mels=cfg.n_mels)
    mel_valid = -(-audio_valid.astype(jnp.int32) // 160)
    logits = _similarity(params, cfg, mel, tokens, mel_valid, tok_valid)

    t_conv = logits.shape[-1]
    frames = jnp.maximum(1, (mel_valid + 3) // 4)      # (B,)
    fmask = jnp.arange(t_conv)[None, :] < frames[:, None]
    masked = jnp.where(fmask[:, None, :], logits, jnp.float32(-1e30))
    lp = jax.nn.log_softmax(masked, axis=-1)
    lp = jnp.where(fmask[:, None, :], lp, jnp.float32(-1e30))

    return jax.vmap(_dp_backtrack)(lp, frames, tok_valid)


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

    def align_batch_audio(self, audio: np.ndarray,
                          token_rows: Sequence[Sequence[int]],
                          sample_valid: Sequence[int],
                          n_pad: Optional[int] = None
                          ) -> List[List[TokenSpan]]:
        """Fully-fused device path: raw audio in, spans out.

        audio (B, S) float32 [-1, 1] padded to a shared bucket;
        sample_valid gives each row's true sample count. One program
        computes mel → similarity → Viterbi → backtrack on device and
        drains only 2·B·N int32 (``align_spans``), vs ``align_batch``'s
        mel round-trip + full logits drain. int16 audio transfer is
        lossless for WAV-native sources (the engine uses the same trick,
        pipelines/engine.py:244). Rows whose valid conv frames < token
        count fall back to the host path's even-spread rule."""
        b = int(audio.shape[0])
        counts = [len(t) for t in token_rows]
        n_max = max(counts, default=0)
        if n_max == 0:
            return [[] for _ in range(b)]
        if n_pad is not None:
            n_max = max(n_max, n_pad)
        toks = np.zeros((b, n_max), np.int32)
        for r, row in enumerate(token_rows):
            toks[r, :len(row)] = row
        a16 = audio if audio.dtype == np.int16 else (
            np.clip(audio, -1.0, 1.0) * 32767.0).astype(np.int16)
        starts, ends = align_spans(
            self.params, self.cfg, jnp.asarray(a16), jnp.asarray(toks),
            jnp.asarray(np.asarray(sample_valid, np.int32)),
            jnp.asarray(np.asarray(counts, np.int32)))
        starts = np.asarray(starts)
        ends = np.asarray(ends)
        out: List[List[TokenSpan]] = []
        for r, row in enumerate(token_rows):
            n = counts[r]
            if n == 0:
                out.append([])
                continue
            frames = max(1, (-(-int(sample_valid[r]) // 160) + 3) // 4)
            if frames < n:     # degenerate: match monotonic_align's rule
                bounds = np.linspace(0, frames, n + 1).astype(int)
                out.append([TokenSpan(int(t), bounds[i] * FRAME_S,
                                      max(bounds[i + 1], bounds[i] + 1)
                                      * FRAME_S)
                            for i, t in enumerate(row)])
                continue
            out.append([TokenSpan(int(t), int(starts[r, i]) * FRAME_S,
                                  int(ends[r, i]) * FRAME_S)
                        for i, t in enumerate(row)])
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
