"""Band-split dual-path transformer for separation/enhancement in JAX.

One architecture serves the reference's two heavy enhancement engines
(reference: whisperjav/modules/speech_enhancement/backends/bs_roformer.py
— band-split RoFormer vocal isolation @44.1 kHz; backends/clearvoice.py —
MossFormer2_SE_48K speech enhancement @48 kHz). Fresh implementation of
the published model family's shape:

  STFT → split frequency bins into perceptual bands → per-band linear
  embeddings → alternating transformer blocks ACROSS TIME (per band) and
  ACROSS BANDS (per frame), rotary positions → per-band complex mask →
  ISTFT.

Sizes are configurable; the default (~8 M params) is a practical TPU
inference size. Weights load from .npz; random-init runs for plumbing.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.models.qwen.model import rms_norm, rope
from whisperjav_tpu.ops.stft import istft, stft


@dataclass(frozen=True)
class BandSplitConfig:
    sample_rate: int = 44_100
    n_fft: int = 2048
    hop: int = 512
    n_bands: int = 24
    d_model: int = 96
    n_heads: int = 4
    n_layers: int = 4            # pairs of (time block, band block)
    target: str = "vocals"       # vocals (keep mask) | noise (residual)


@functools.lru_cache(maxsize=4)
def band_edges(n_freqs: int, n_bands: int) -> Tuple[Tuple[int, int], ...]:
    """Mel-spaced frequency band partition covering [0, n_freqs)."""
    pts = np.unique(np.round(
        (np.exp(np.linspace(0, np.log(n_freqs), n_bands + 1)) - 1)
    ).astype(int))
    pts = np.clip(pts, 0, n_freqs)
    pts[0], pts[-1] = 0, n_freqs
    while len(pts) < n_bands + 1:   # ensure exactly n_bands bands
        gaps = np.diff(pts)
        i = int(np.argmax(gaps))
        pts = np.insert(pts, i + 1, pts[i] + gaps[i] // 2)
    return tuple((int(a), int(b)) for a, b in zip(pts[:-1], pts[1:]))


def init_params(cfg: BandSplitConfig, key: jax.Array,
                dtype=jnp.float32) -> Dict:
    n_freqs = cfg.n_fft // 2 + 1
    edges = band_edges(n_freqs, cfg.n_bands)
    d = cfg.d_model
    keys = jax.random.split(key, 6 + 2 * cfg.n_layers)

    def w(k, shape, scale=None):
        fan = shape[0]
        return (jax.random.normal(k, shape) * (scale or fan ** -0.5)
                ).astype(dtype)

    params: Dict = {"band_in": [], "band_out": []}
    for i, (a, b) in enumerate(edges):
        width = (b - a) * 2     # real+imag
        params["band_in"].append({
            "w": w(jax.random.fold_in(keys[0], i), (width, d)),
            "b": jnp.zeros((d,), dtype)})
        params["band_out"].append({
            "w": w(jax.random.fold_in(keys[1], i), (d, width)),
            "b": jnp.zeros((width,), dtype)})

    def block(k):
        ks = jax.random.split(k, 6)
        return {
            "ln1": jnp.ones((d,), dtype),
            "wq": w(ks[0], (d, d)), "wk": w(ks[1], (d, d)),
            "wv": w(ks[2], (d, d)), "wo": w(ks[3], (d, d)),
            "ln2": jnp.ones((d,), dtype),
            "w1": w(ks[4], (d, 4 * d)), "w2": w(ks[5], (4 * d, d)),
        }

    params["time_blocks"] = [block(keys[6 + 2 * i])
                             for i in range(cfg.n_layers)]
    params["band_blocks"] = [block(keys[7 + 2 * i])
                             for i in range(cfg.n_layers)]
    return params


def _attn_block(x: jax.Array, p: Dict, n_heads: int) -> jax.Array:
    """Pre-norm transformer block with RoPE over axis 1. x (N, S, d)."""
    n, s, d = x.shape
    h = rms_norm(x, p["ln1"], 1e-6)
    pos = jnp.arange(s)

    def heads(t):
        return t.reshape(n, s, n_heads, d // n_heads)

    q = rope(heads(h @ p["wq"]), pos, 10_000.0)
    k = rope(heads(h @ p["wk"]), pos, 10_000.0)
    v = heads(h @ p["wv"])
    scale = (d // n_heads) ** -0.5
    a = jax.nn.softmax(jnp.einsum("nqhd,nkhd->nhqk", q * scale, k,
                                  preferred_element_type=jnp.float32),
                       axis=-1).astype(v.dtype)
    o = jnp.einsum("nhqk,nkhd->nqhd", a, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + o.reshape(n, s, d) @ p["wo"]
    h = rms_norm(x, p["ln2"], 1e-6)
    return x + jax.nn.gelu(h @ p["w1"], approximate=False) @ p["w2"]


@functools.partial(jax.jit, static_argnames=("cfg", "length"))
def apply(params: Dict, cfg: BandSplitConfig, audio: jax.Array,
          length: int) -> jax.Array:
    """audio (B, length) → separated/enhanced audio (B, length)."""
    real, imag = stft(audio, cfg.n_fft, cfg.hop)       # (B, F, T)
    b, n_freqs, t = real.shape
    edges = band_edges(n_freqs, cfg.n_bands)

    # band-split embeddings → (B, n_bands, T, d)
    feats = []
    for (a, e), pin in zip(edges, params["band_in"]):
        band = jnp.concatenate([real[:, a:e], imag[:, a:e]], axis=1)
        band = jnp.swapaxes(band, 1, 2)                # (B, T, width)
        feats.append(band @ pin["w"] + pin["b"])
    x = jnp.stack(feats, axis=1)                       # (B, NB, T, d)

    nb, d = cfg.n_bands, cfg.d_model
    for tb, bb in zip(params["time_blocks"], params["band_blocks"]):
        # across time: fold bands into batch
        x = _attn_block(x.reshape(b * nb, t, d), tb, cfg.n_heads)
        x = x.reshape(b, nb, t, d)
        # across bands: fold time into batch
        x = jnp.swapaxes(x, 1, 2).reshape(b * t, nb, d)
        x = _attn_block(x, bb, cfg.n_heads)
        x = jnp.swapaxes(x.reshape(b, t, nb, d), 1, 2)

    # per-band complex masks → masked spectrum
    out_r = jnp.zeros_like(real)
    out_i = jnp.zeros_like(imag)
    for bi, ((a, e), pout) in enumerate(zip(edges, params["band_out"])):
        width = e - a
        m = jnp.tanh(x[:, bi] @ pout["w"] + pout["b"])  # (B, T, 2*width)
        mr = jnp.swapaxes(m[..., :width], 1, 2)
        mi = jnp.swapaxes(m[..., width:], 1, 2)
        # complex mask multiply
        out_r = out_r.at[:, a:e].set(real[:, a:e] * mr - imag[:, a:e] * mi)
        out_i = out_i.at[:, a:e].set(real[:, a:e] * mi + imag[:, a:e] * mr)

    return istft(out_r, out_i, length, cfg.n_fft, cfg.hop)


def param_count(params) -> int:
    return sum(int(np.prod(np.asarray(v).shape))
               for v in jax.tree.leaves(params))


def load_params(path: str) -> Dict:
    data = np.load(path, allow_pickle=True)
    import json
    tree = json.loads(str(data["__tree__"]))

    def rebuild(node, prefix):
        if node == "leaf":
            return jnp.asarray(data[prefix])
        if isinstance(node, list):
            return [rebuild(n, f"{prefix}.{i}") for i, n in enumerate(node)]
        return {k: rebuild(v, f"{prefix}.{k}" if prefix else k)
                for k, v in node.items()}

    return rebuild(tree, "")


def save_params(path: str, params: Dict) -> None:
    import json
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}.{k}" if prefix else k)
                    for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{prefix}.{i}") for i, v in enumerate(node)]
        flat[prefix] = np.asarray(node)
        return "leaf"

    tree = walk(params, "")
    np.savez(path, __tree__=json.dumps(tree), **flat)
