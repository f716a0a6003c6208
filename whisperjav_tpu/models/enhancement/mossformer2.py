"""Checkpoint-faithful MossFormer2_SE_48K speech enhancement.

The reference's ClearVoice backend defaults to ``MossFormer2_SE_48K``
(reference: whisperjav/modules/speech_enhancement/backends/
clearvoice.py:42-47,59 — "MossFormer2 enhancement at 48kHz (default,
best quality)").  This module implements THAT architecture — the
ClearerVoice-Studio MossFormer2 SE network: a mask net over 180-dim
log-mel fbank features predicting a 961-bin magnitude mask
(n_fft 1920 / hop 384 @48 kHz), built from MossFormer2's hybrid
blocks — gated single-head FLASH attention (joint local-quadratic +
global-linear) interleaved with gated FSMN "RNN-free recurrent"
modules — with the vendor implementation's module math so published
state dicts bind through :func:`params_from_torch_state_dict`:

* ``MossFormer_MaskNet`` — GroupNorm(1, 180) → 1×1 conv encoder to 512
  → scaled sinusoidal positional embedding → one ``Computation_Block``
  of ``num_blocks`` MossFormer2 layers (intra skip + GroupNorm) →
  PReLU → 1×1 conv → tanh·sigmoid output gate → 1×1 conv decoder to
  961 → ReLU.
* ``FLASH_ShareA_FFConvM`` — token-shift on half the lanes; shared
  ``v, u`` streams from one FFConvM (dim → 4·dim, chunked); a 128-dim
  qk stream offset-scaled into 4 roles (quad/lin × q/k) with partial
  interleaved-pair RoPE (first 32 lanes); quadratic attention
  ``relu(qk/g)²`` inside groups of 256 frames plus global linear
  attention ``(lin_q · Σ lin_kᵀv / n)``; output gate
  ``(att_u∘v)·σ(att_v∘u)`` and FFConvM back-projection (residual).
* ``FFConvM`` — norm (ScaleNorm in attention blocks, LayerNorm inside
  Gated_FSMN) → Linear → SiLU → residual depthwise conv (kernel 17).
* ``Gated_FSMN_Block`` — 1×1 conv to 256 + PReLU → per-timestep
  LayerNorm → gated FSMN (u/v FFConvM streams; UniDeepFsmn memory:
  Linear → ReLU → project → ±(lorder−1) depthwise memory conv over
  TIME, double residual) → LayerNorm → 1×1 conv back to dim
  (block residual).

TPU mapping: the whole network is feed-forward (the FSMN "recurrence"
is a finite depthwise conv, the linear attention a pair of einsums) —
one XLA program, no scan-over-time.  The ``num_blocks`` layers run
under ``lax.scan`` with per-layer leaves stacked on a leading axis
(repo convention); group attention is a fixed (B, G, 256, ·) reshape.

Frame geometry: win 1920 / hop 384 / hamming @48 kHz for both the
fbank frontend and the mask STFT (961 = 1920/2+1 bins).  The fbank is
kaldi-style (dither off): preemphasis 0.97, per-frame DC removal,
hamming window, log mel energies, snip-edges off so fbank and STFT
frames align 1:1.

``tests/test_mossformer2_parity.py`` builds a torch twin from this
exact module list and checks layer-exact parity through the converter.
"""

from __future__ import annotations

import functools
import re
from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 48_000
N_FFT = 1920
HOP = 384


@dataclass(frozen=True)
class MossFormer2Config:
    n_mels: int = 180                 # masknet in_channels
    d_model: int = 512                # masknet out_channels
    n_freqs: int = 961                # masknet out_channels_final
    num_blocks: int = 24
    group_size: int = 256
    qk_dim: int = 128
    rope_dim: int = 32                # min(32, qk_dim)
    expansion: int = 4                # FLASH hidden = dim * expansion
    fsmn_inner: int = 256             # Gated_FSMN_Block inner channels
    lorder: int = 20                  # UniDeepFsmn memory half-order
    n_fft: int = N_FFT
    hop: int = HOP
    sample_rate: int = SAMPLE_RATE

    @property
    def hidden(self) -> int:          # v/u stream width (dim * exp / 2)
        return self.d_model * self.expansion // 2


MOSSFORMER2_SE_48K = MossFormer2Config()

# tiny geometry for tests (dims even, rope_dim < qk_dim, 2 blocks)
MF2_TEST = MossFormer2Config(
    n_mels=6, d_model=16, n_freqs=9, num_blocks=2, group_size=8,
    qk_dim=8, rope_dim=4, expansion=4, fsmn_inner=12, lorder=3,
    n_fft=16, hop=4, sample_rate=16_000)


# ---------------------------------------------------------------------------
# frontend: hamming STFT + kaldi-style fbank (frames aligned 1:1)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def _hamming_dft_kernel(n_fft: int) -> np.ndarray:
    """(2F, 1, n_fft) conv kernel computing a hamming-windowed rDFT."""
    n_freqs = n_fft // 2 + 1
    t = np.arange(n_fft)
    angle = 2.0 * np.pi * np.outer(np.arange(n_freqs), t) / n_fft
    win = np.hamming(n_fft)[None, :]
    real = np.cos(angle) * win
    imag = -np.sin(angle) * win
    return np.concatenate([real, imag], axis=0)[:, None, :].astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_hamming(audio: jax.Array, n_fft: int = N_FFT,
                 hop: int = HOP) -> Tuple[jax.Array, jax.Array]:
    """audio (B, T) → (real, imag) each (B, F, frames); centered."""
    pad = n_fft // 2
    x = jnp.pad(audio[:, None, :], ((0, 0), (0, 0), (pad, pad)),
                mode="reflect")
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(_hamming_dft_kernel(n_fft)), window_strides=(hop,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    f = n_fft // 2 + 1
    return out[:, :f], out[:, f:]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft_hamming(real: jax.Array, imag: jax.Array, length: int,
                  n_fft: int = N_FFT, hop: int = HOP) -> jax.Array:
    """WOLA inverse of :func:`stft_hamming` (hamming analysis+synthesis)."""
    b, n_freqs, frames = real.shape
    t = np.arange(n_fft)
    angle = 2.0 * np.pi * np.outer(np.arange(n_freqs), t) / n_fft
    scale = np.full((n_freqs, 1), 2.0)
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    win = np.hamming(n_fft)
    basis = np.concatenate(
        [np.cos(angle) * scale / n_fft * win[None, :],
         -np.sin(angle) * scale / n_fft * win[None, :]], axis=0)
    spec = jnp.concatenate([real, imag], axis=1)           # (B, 2F, T)
    frames_time = jnp.einsum("bft,fn->btn", spec,
                             jnp.asarray(basis.astype(np.float32)))
    pad = n_fft // 2
    total = (frames - 1) * hop + n_fft
    idx = (np.arange(frames)[:, None] * hop
           + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((b, total), jnp.float32)
    out = out.at[:, idx].add(frames_time.reshape(b, -1))
    norm = np.zeros(total, np.float64)
    for f in range(frames):
        norm[f * hop: f * hop + n_fft] += win ** 2
    out = out / jnp.asarray(np.maximum(norm, 1e-8).astype(np.float32))
    return out[:, pad: pad + length]


@functools.lru_cache(maxsize=4)
def _mel_matrix(n_mels: int, n_fft: int, sr: int) -> np.ndarray:
    """Kaldi-style mel filterbank (F, n_mels), mel = 1127 ln(1 + f/700)."""
    n_freqs = n_fft // 2 + 1
    mel = lambda f: 1127.0 * np.log1p(f / 700.0)          # noqa: E731
    lo, hi = mel(20.0), mel(sr / 2.0)
    pts = np.linspace(lo, hi, n_mels + 2)
    freqs = mel(np.arange(n_freqs) * sr / n_fft)
    fb = np.zeros((n_freqs, n_mels), np.float64)
    for m in range(n_mels):
        left, center, right = pts[m], pts[m + 1], pts[m + 2]
        up = (freqs - left) / (center - left)
        down = (right - freqs) / (right - center)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def fbank(audio: jax.Array, cfg: MossFormer2Config) -> jax.Array:
    """audio (B, T) → log-mel features (B, frames, n_mels).

    Kaldi-style: preemphasis 0.97, per-frame DC removal, hamming
    window, power spectrum, log mel energies (floor 1e-10); centered
    framing so frames align 1:1 with :func:`stft_hamming`.
    """
    pad = cfg.n_fft // 2
    x = jnp.pad(audio[:, None, :], ((0, 0), (0, 0), (pad, pad)),
                mode="reflect")
    # frame into (B, frames, n_fft)
    n_frames = (x.shape[-1] - cfg.n_fft) // cfg.hop + 1
    idx = (np.arange(n_frames)[:, None] * cfg.hop
           + np.arange(cfg.n_fft)[None, :])
    frames = x[:, 0, :].take(idx.reshape(-1), axis=-1).reshape(
        audio.shape[0], n_frames, cfg.n_fft)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    pre = jnp.concatenate([frames[..., :1] * (1 - 0.97),
                           frames[..., 1:] - 0.97 * frames[..., :-1]],
                          axis=-1)
    win = jnp.asarray(np.hamming(cfg.n_fft).astype(np.float32))
    spec = jnp.fft.rfft(pre * win, axis=-1)
    power = jnp.abs(spec) ** 2
    mels = power @ jnp.asarray(
        _mel_matrix(cfg.n_mels, cfg.n_fft, cfg.sample_rate))
    return jnp.log(jnp.maximum(mels, 1e-10))


# ---------------------------------------------------------------------------
# primitive forwards (vendor module math)
# ---------------------------------------------------------------------------

def _group_norm1(x: jax.Array, w: jax.Array, b: jax.Array,
                 eps: float = 1e-8) -> jax.Array:
    """torch GroupNorm(1, C) on (B, S, C): normalize over (S, C)."""
    mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
    var = jnp.var(x, axis=(-2, -1), keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _layer_norm(x, w, b, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _scale_norm(x, g, eps=1e-5):
    """lucidrains ScaleNorm: x / max(‖x‖·d^-½, eps) · g."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True) * (x.shape[-1] ** -0.5)
    return x / jnp.maximum(n, eps) * g


def _prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


def _dw_conv_seq(x: jax.Array, w: jax.Array) -> jax.Array:
    """Depthwise conv over the sequence axis. x (B, S, C), w (C, K),
    'same' padding, no bias (vendor ConvModule.DepthwiseConv1d)."""
    k = w.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w[:, None, :], window_strides=(1,),
        padding=[((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=("NHC", "OIH", "NHC"),
        feature_group_count=w.shape[0])


def _ffconvm(x: jax.Array, p: Mapping[str, Any]) -> jax.Array:
    """norm → Linear → SiLU → residual depthwise conv (kernel 17).

    ``p["norm"]`` holds {"g"} (ScaleNorm) or {"w","b"} (LayerNorm),
    matching the vendor's per-site norm_klass.
    """
    n = p["norm"]
    y = _scale_norm(x, n["g"]) if "g" in n else _layer_norm(x, n["w"], n["b"])
    y = y @ p["w"] + p["b"]
    y = jax.nn.silu(y)
    return y + _dw_conv_seq(y, p["conv_w"])


def _rotate_half_interleaved(x: jax.Array) -> jax.Array:
    x1, x2 = x[..., 0::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_partial_rotary(x: jax.Array, rope_dim: int) -> jax.Array:
    """Interleaved-pair RoPE on the first ``rope_dim`` lanes
    (rotary-embedding-torch semantics, θ=10000). x (B, S, d)."""
    freqs = 1.0 / (10000.0 ** (np.arange(0, rope_dim, 2) / rope_dim))
    n = x.shape[-2]
    angles = jnp.arange(n)[:, None] * jnp.asarray(freqs,
                                                  jnp.float32)[None, :]
    angles = jnp.repeat(angles, 2, axis=-1)                  # (n, rope)
    head, tail = x[..., :rope_dim], x[..., rope_dim:]
    head = (head * jnp.cos(angles)
            + _rotate_half_interleaved(head) * jnp.sin(angles))
    return jnp.concatenate([head, tail], axis=-1)


def _flash_attention(x: jax.Array, p: Mapping[str, Any],
                     cfg: MossFormer2Config) -> jax.Array:
    """FLASH_ShareA_FFConvM forward. x (B, S, d) → (B, S, d)."""
    b, n, d = x.shape
    g = cfg.group_size

    # token shift: first half of lanes delayed by one frame
    x_shift, x_pass = x[..., : d // 2], x[..., d // 2:]
    x_shift = jnp.pad(x_shift, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    normed = jnp.concatenate([x_shift, x_pass], axis=-1)

    vu = _ffconvm(normed, p["to_hidden"])                  # (B, S, 2h)
    v, u = jnp.split(vu, 2, axis=-1)                       # each (B, S, h)
    qk = _ffconvm(normed, p["to_qk"])                      # (B, S, qk)

    # OffsetScale: 4 roles (quad_q, lin_q, quad_k, lin_k)
    roles = qk[:, :, None, :] * p["gamma"] + p["beta"]     # (B, S, 4, qk)
    roles = _apply_partial_rotary(
        jnp.moveaxis(roles, 2, 1).reshape(b * 4, n, cfg.qk_dim),
        cfg.rope_dim).reshape(b, 4, n, cfg.qk_dim)
    quad_q, lin_q, quad_k, lin_k = (roles[:, 0], roles[:, 1],
                                    roles[:, 2], roles[:, 3])

    # pad to a group multiple
    padding = (-n) % g
    if padding:
        z = ((0, 0), (0, padding), (0, 0))
        quad_q, lin_q, quad_k, lin_k, vg, ug = (
            jnp.pad(t, z) for t in (quad_q, lin_q, quad_k, lin_k, v, u))
    else:
        vg, ug = v, u
    grp = lambda t: t.reshape(b, -1, g, t.shape[-1])       # noqa: E731
    quad_q, lin_q, quad_k, lin_k, vg, ug = map(
        grp, (quad_q, lin_q, quad_k, lin_k, vg, ug))

    sim = jnp.einsum("bgid,bgjd->bgij", quad_q, quad_k) / g
    attn = jax.nn.relu(sim) ** 2
    quad_v = jnp.einsum("bgij,bgjd->bgid", attn, vg)
    quad_u = jnp.einsum("bgij,bgjd->bgid", attn, ug)

    lin_kv = jnp.einsum("bgnd,bgne->bde", lin_k, vg) / n
    lin_v = jnp.einsum("bgnd,bde->bgne", lin_q, lin_kv)
    lin_ku = jnp.einsum("bgnd,bgne->bde", lin_k, ug) / n
    lin_u = jnp.einsum("bgnd,bde->bgne", lin_q, lin_ku)

    att_v = (quad_v + lin_v).reshape(b, -1, v.shape[-1])[:, :n]
    att_u = (quad_u + lin_u).reshape(b, -1, u.shape[-1])[:, :n]

    out = (att_u * v) * jax.nn.sigmoid(att_v * u)
    return x + _ffconvm(out, p["to_out"])


def _uni_deep_fsmn(x: jax.Array, p: Mapping[str, Any]) -> jax.Array:
    """UniDeepFsmn over TIME: x + (proj + dw_memory_conv(proj)).
    x (B, S, C); memory conv kernel 2·lorder−1, depthwise, no bias."""
    f1 = jax.nn.relu(x @ p["lin_w"] + p["lin_b"])
    p1 = f1 @ p["proj_w"]                                  # (B, S, C)
    k = p["conv_w"].shape[-1]
    half = (k - 1) // 2
    mem = jax.lax.conv_general_dilated(
        p1, p["conv_w"][:, None, :], window_strides=(1,),
        padding=[(half, half)],
        dimension_numbers=("NHC", "OIH", "NHC"),
        feature_group_count=p["conv_w"].shape[0])
    return x + (p1 + mem)


def _gated_fsmn_block(x: jax.Array, p: Mapping[str, Any]) -> jax.Array:
    """Gated_FSMN_Block. x (B, S, d) → (B, S, d), residual."""
    y = x @ p["conv1_w"] + p["conv1_b"]                    # 1x1 conv to inner
    y = _prelu(y, p["prelu1"])
    y = _layer_norm(y, p["norm1_w"], p["norm1_b"])
    # Gated_FSMN: u stream through FSMN, v stream gates it
    x_u = _ffconvm(y, p["to_u"])
    x_v = _ffconvm(y, p["to_v"])
    x_u = _uni_deep_fsmn(x_u, p["fsmn"])
    y2 = x_v * x_u + y
    y2 = _layer_norm(y2, p["norm2_w"], p["norm2_b"])
    return x + (y2 @ p["conv2_w"] + p["conv2_b"])


def _block(x: jax.Array, p: Mapping[str, Any],
           cfg: MossFormer2Config) -> jax.Array:
    x = _flash_attention(x, p["flash"], cfg)
    return _gated_fsmn_block(x, p["fsmn_block"])


def _sinu_pos_emb(n: int, d: int, scale: jax.Array) -> jax.Array:
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    ang = jnp.arange(n)[:, None] * jnp.asarray(inv, jnp.float32)[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1) * scale


def forward_mask(params: Dict[str, Any], cfg: MossFormer2Config,
                 feats: jax.Array) -> jax.Array:
    """MossFormer_MaskNet: fbank (B, S, n_mels) → mask (B, S, n_freqs)."""
    x = _group_norm1(feats, params["norm_w"], params["norm_b"])
    x = x @ params["enc_w"]                                # 1x1 conv, no bias
    x = x + _sinu_pos_emb(x.shape[1], cfg.d_model, params["pos_scale"])

    def body(h, layer_p):
        return _block(h, layer_p, cfg), None

    y, _ = jax.lax.scan(body, x, params["blocks"])
    y = _layer_norm(y, params["mossformer_norm_w"],
                    params["mossformer_norm_b"], eps=1e-6)
    y = _group_norm1(y, params["intra_norm_w"], params["intra_norm_b"])
    y = y + x                                              # intra skip
    y = _prelu(y, params["prelu"])
    y = y @ params["out_w"] + params["out_b"]
    y = (jnp.tanh(y @ params["gate_t_w"] + params["gate_t_b"])
         * jax.nn.sigmoid(y @ params["gate_s_w"] + params["gate_s_b"]))
    y = y @ params["dec_w"]                                # to n_freqs
    return jax.nn.relu(y)


@functools.partial(jax.jit, static_argnames=("cfg", "length"))
def enhance(params: Dict[str, Any], cfg: MossFormer2Config,
            audio: jax.Array, length: int) -> jax.Array:
    """Denoise audio (B, T) @cfg.sample_rate → (B, length).

    Vendor decode semantics: predict a real magnitude mask from fbank
    features, scale the noisy STFT (noisy phase kept), ISTFT.
    """
    feats = fbank(audio, cfg)                              # (B, S, mels)
    mask = forward_mask(params, cfg, feats)                # (B, S, F)
    real, imag = stft_hamming(audio, cfg.n_fft, cfg.hop)   # (B, F, S')
    s = min(mask.shape[1], real.shape[-1])
    m = jnp.moveaxis(mask, 1, 2)[:, :, :s]
    return istft_hamming(real[:, :, :s] * m, imag[:, :, :s] * m,
                         length, cfg.n_fft, cfg.hop)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _lin(key, d_in, d_out, bias=True):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / np.sqrt(d_in)
    w = jax.random.uniform(k1, (d_in, d_out), jnp.float32, -lim, lim)
    return (w, jax.random.uniform(k2, (d_out,), jnp.float32, -lim, lim)
            if bias else None)


def _init_ffconvm(key, d_in, d_out, scalenorm: bool, kernel=17):
    k1, k2 = jax.random.split(key)
    w, b = _lin(k1, d_in, d_out)
    norm = ({"g": jnp.ones(())} if scalenorm
            else {"w": jnp.ones((d_in,)), "b": jnp.zeros((d_in,))})
    lim = 1.0 / np.sqrt(kernel)
    conv = jax.random.uniform(k2, (d_out, kernel), jnp.float32, -lim, lim)
    return {"norm": norm, "w": w, "b": b, "conv_w": conv}


def _init_block(key, cfg: MossFormer2Config):
    ks = jax.random.split(key, 12)
    d, h, qk = cfg.d_model, cfg.hidden, cfg.qk_dim
    inner = cfg.fsmn_inner
    flash = {
        "to_hidden": _init_ffconvm(ks[0], d, 2 * h, scalenorm=True),
        "to_qk": _init_ffconvm(ks[1], d, qk, scalenorm=True),
        "gamma": 0.02 * jax.random.normal(ks[2], (4, qk), jnp.float32),
        "beta": jnp.zeros((4, qk)),
        "to_out": _init_ffconvm(ks[3], h, d, scalenorm=True),
    }
    lw, lb = _lin(ks[4], inner, inner)
    pw, _ = _lin(ks[5], inner, inner, bias=False)
    lim = 1.0 / np.sqrt(2 * cfg.lorder - 1)
    cw = jax.random.uniform(ks[6], (inner, 2 * cfg.lorder - 1),
                            jnp.float32, -lim, lim)
    c1w, c1b = _lin(ks[7], d, inner)
    c2w, c2b = _lin(ks[8], inner, d)
    fsmn_block = {
        "conv1_w": c1w, "conv1_b": c1b,
        "prelu1": jnp.full((), 0.25),
        "norm1_w": jnp.ones((inner,)), "norm1_b": jnp.zeros((inner,)),
        "to_u": _init_ffconvm(ks[9], inner, inner, scalenorm=False),
        "to_v": _init_ffconvm(ks[10], inner, inner, scalenorm=False),
        "fsmn": {"lin_w": lw, "lin_b": lb, "proj_w": pw, "conv_w": cw},
        "norm2_w": jnp.ones((inner,)), "norm2_b": jnp.zeros((inner,)),
        "conv2_w": c2w, "conv2_b": c2b,
    }
    return {"flash": flash, "fsmn_block": fsmn_block}


def init_params(cfg: MossFormer2Config, key: jax.Array) -> Dict[str, Any]:
    ks = jax.random.split(key, cfg.num_blocks + 8)
    blocks = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_init_block(ks[i], cfg) for i in range(cfg.num_blocks)])
    d = cfg.d_model
    ew, _ = _lin(ks[-1], cfg.n_mels, d, bias=False)
    ow, ob = _lin(ks[-2], d, d)
    tw, tb = _lin(ks[-3], d, d)
    sw, sb = _lin(ks[-4], d, d)
    dw, _ = _lin(ks[-5], d, cfg.n_freqs, bias=False)
    return {
        "norm_w": jnp.ones((cfg.n_mels,)), "norm_b": jnp.zeros((cfg.n_mels,)),
        "enc_w": ew,
        "pos_scale": jnp.ones(()),
        "blocks": blocks,
        "mossformer_norm_w": jnp.ones((d,)),
        "mossformer_norm_b": jnp.zeros((d,)),
        "intra_norm_w": jnp.ones((d,)), "intra_norm_b": jnp.zeros((d,)),
        "prelu": jnp.full((), 0.25),
        "out_w": ow, "out_b": ob,
        "gate_t_w": tw, "gate_t_b": tb,
        "gate_s_w": sw, "gate_s_b": sb,
        "dec_w": dw,
    }


# ---------------------------------------------------------------------------
# converter: ClearerVoice-Studio state dict → params pytree
# ---------------------------------------------------------------------------

_PREFIXES = ("model.mossformer.", "mossformer.", "")


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _ffconvm_from(sd: Mapping[str, Any], base: str) -> Dict[str, Any]:
    """FFConvM keys: {base}.mdl.0 norm, .1 Linear, .3 ConvModule."""
    if f"{base}.mdl.0.g" in sd:
        norm = {"g": jnp.asarray(_np(sd[f"{base}.mdl.0.g"]).reshape(()))}
    else:
        norm = {"w": jnp.asarray(_np(sd[f"{base}.mdl.0.weight"])),
                "b": jnp.asarray(_np(sd[f"{base}.mdl.0.bias"]))}
    w = _np(sd[f"{base}.mdl.1.weight"]).T                  # torch (out,in)
    b = _np(sd[f"{base}.mdl.1.bias"])
    conv = _np(sd[f"{base}.mdl.3.sequential.1.conv.weight"])[:, 0, :]
    return {"norm": norm, "w": jnp.asarray(w), "b": jnp.asarray(b),
            "conv_w": jnp.asarray(conv)}


def params_from_torch_state_dict(
        sd: Mapping[str, Any],
        cfg: Optional[MossFormer2Config] = None,
) -> Tuple[Dict[str, Any], MossFormer2Config]:
    """Bind a ClearerVoice-Studio ``MossFormer2_SE_48K`` state dict.

    Accepts the published wrapper prefix (``model.mossformer.``) or a
    bare MaskNet dict; infers num_blocks / dims from the tensors.
    """
    sd = {k: v for k, v in sd.items()}
    for pref in _PREFIXES:
        if f"{pref}norm.weight" in sd:
            if pref:
                sd = {k[len(pref):]: v for k, v in sd.items()
                      if k.startswith(pref)}
            break
    else:
        raise ValueError("unrecognized MossFormer2 state dict "
                         f"(no <prefix>norm.weight among {len(sd)} keys)")

    enc = _np(sd["conv1d_encoder.weight"])                 # (d, mels, 1)
    d_model, n_mels = enc.shape[0], enc.shape[1]
    dec = _np(sd["conv1_decoder.weight"])                  # (F, d, 1)
    n_freqs = dec.shape[0]
    mm = "mdl.intra_mdl.mossformerM"
    n_blocks = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(rf"{mm}\.layers\.(\d+)\.", k)))
    qk = _np(sd[f"{mm}.layers.0.qk_offset_scale.gamma"]).shape[-1]
    hidden2 = _np(sd[f"{mm}.layers.0.to_hidden.mdl.1.weight"]).shape[0]
    inner = _np(sd[f"{mm}.fsmn.0.conv1.0.weight"]).shape[0]
    lorder = (_np(sd[f"{mm}.fsmn.0.gated_fsmn.fsmn.conv1.weight"]
                  ).shape[2] + 1) // 2
    if cfg is None:
        n_fft = (n_freqs - 1) * 2          # mask bins fix the STFT size
        cfg = MossFormer2Config(
            n_mels=n_mels, d_model=d_model, n_freqs=n_freqs,
            num_blocks=n_blocks, qk_dim=qk, rope_dim=min(32, qk),
            expansion=hidden2 // d_model, fsmn_inner=inner, lorder=lorder,
            n_fft=n_fft, hop=max(1, n_fft // 5),   # vendor 1920/384 ratio
            sample_rate=SAMPLE_RATE if n_freqs == 961 else 16_000)

    def conv1x1(name):                                     # (out,in,1) → (in,out)
        return jnp.asarray(_np(sd[f"{name}.weight"])[:, :, 0].T)

    blocks = []
    for i in range(cfg.num_blocks):
        lb, fb = f"{mm}.layers.{i}", f"{mm}.fsmn.{i}"
        flash = {
            "to_hidden": _ffconvm_from(sd, f"{lb}.to_hidden"),
            "to_qk": _ffconvm_from(sd, f"{lb}.to_qk"),
            "gamma": jnp.asarray(_np(sd[f"{lb}.qk_offset_scale.gamma"])),
            "beta": jnp.asarray(_np(sd[f"{lb}.qk_offset_scale.beta"])),
            "to_out": _ffconvm_from(sd, f"{lb}.to_out"),
        }
        fsmn_block = {
            "conv1_w": conv1x1(f"{fb}.conv1.0"),
            "conv1_b": jnp.asarray(_np(sd[f"{fb}.conv1.0.bias"])),
            "prelu1": jnp.asarray(_np(sd[f"{fb}.conv1.1.weight"]
                                      ).reshape(())),
            "norm1_w": jnp.asarray(_np(sd[f"{fb}.norm1.weight"]).reshape(-1)),
            "norm1_b": jnp.asarray(_np(sd[f"{fb}.norm1.bias"]).reshape(-1)),
            "to_u": _ffconvm_from(sd, f"{fb}.gated_fsmn.to_u"),
            "to_v": _ffconvm_from(sd, f"{fb}.gated_fsmn.to_v"),
            "fsmn": {
                "lin_w": jnp.asarray(
                    _np(sd[f"{fb}.gated_fsmn.fsmn.linear.weight"]).T),
                "lin_b": jnp.asarray(
                    _np(sd[f"{fb}.gated_fsmn.fsmn.linear.bias"])),
                "proj_w": jnp.asarray(
                    _np(sd[f"{fb}.gated_fsmn.fsmn.project.weight"]).T),
                # vendor conv1: (C, 1, 2·lorder−1, 1) depthwise over time
                "conv_w": jnp.asarray(
                    _np(sd[f"{fb}.gated_fsmn.fsmn.conv1.weight"])[:, 0, :, 0]),
            },
            "norm2_w": jnp.asarray(_np(sd[f"{fb}.norm2.weight"]).reshape(-1)),
            "norm2_b": jnp.asarray(_np(sd[f"{fb}.norm2.bias"]).reshape(-1)),
            "conv2_w": conv1x1(f"{fb}.conv2"),
            "conv2_b": jnp.asarray(_np(sd[f"{fb}.conv2.bias"])),
        }
        blocks.append({"flash": flash, "fsmn_block": fsmn_block})

    params = {
        "norm_w": jnp.asarray(_np(sd["norm.weight"])),
        "norm_b": jnp.asarray(_np(sd["norm.bias"])),
        "enc_w": jnp.asarray(enc[:, :, 0].T),
        "pos_scale": jnp.asarray(_np(sd["pos_enc.scale"]).reshape(())),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "mossformer_norm_w": jnp.asarray(_np(sd[f"{mm[:-11]}norm.weight"])),
        "mossformer_norm_b": jnp.asarray(_np(sd[f"{mm[:-11]}norm.bias"])),
        "intra_norm_w": jnp.asarray(_np(sd["mdl.intra_norm.weight"])),
        "intra_norm_b": jnp.asarray(_np(sd["mdl.intra_norm.bias"])),
        "prelu": jnp.asarray(_np(sd["prelu.weight"]).reshape(())),
        "out_w": conv1x1("conv1d_out"),
        "out_b": jnp.asarray(_np(sd["conv1d_out.bias"])),
        "gate_t_w": conv1x1("output.0"),
        "gate_t_b": jnp.asarray(_np(sd["output.0.bias"])),
        "gate_s_w": conv1x1("output_gate.0"),
        "gate_s_b": jnp.asarray(_np(sd["output_gate.0.bias"])),
        "dec_w": conv1x1("conv1_decoder"),
    }
    return params, cfg


def save_params(path: str, params: Dict[str, Any],
                cfg: MossFormer2Config) -> None:
    import dataclasses

    from whisperjav_tpu.utils.pytree_npz import save_pytree

    save_pytree(path, jax.tree.map(np.asarray, params),
                meta=dataclasses.asdict(cfg))


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], MossFormer2Config]:
    """``.npz`` (our format) or torch ``.pt|.pth|.ckpt|.bin`` state dict."""
    p = str(path)
    if p.endswith(".npz"):
        from whisperjav_tpu.utils.pytree_npz import load_pytree

        tree, meta = load_pytree(p)
        if meta is None:
            raise ValueError(f"{p}: missing config metadata")
        return jax.tree.map(jnp.asarray, tree), MossFormer2Config(**meta)
    import torch

    sd = torch.load(p, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return params_from_torch_state_dict(sd)
