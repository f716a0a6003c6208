"""Checkpoint-faithful BS-RoFormer (band-split RoFormer) in JAX.

The reference's vocal-isolation backend loads the public BS-RoFormer
vocal model through the ``bs_roformer`` package (reference:
whisperjav/modules/speech_enhancement/backends/bs_roformer.py:34-47,
100-125 — 44.1 kHz "vocals"/"other" stems), which wraps lucidrains'
``BSRoformer`` module.  This file implements THAT architecture — same
math, same tensor layout — so the published state dicts load through
:func:`params_from_torch_state_dict`.  The vendor module hierarchy the
converter names come from (BandSplit.to_features / Transformer.layers /
Attention.to_qkv,to_gates,to_out / MaskEstimator.to_freqs / RMSNorm.gamma
/ RotaryEmbedding.freqs) is the lucidrains ``bs_roformer/bs_roformer.py``
layer list; ``tests/test_bs_roformer_parity.py`` rebuilds a torch twin
from that exact list and round-trips real torch state dicts through the
converter.

Architecture (viperx vocal-model hyperparameters as defaults):

    stereo STFT (n_fft 2048, hop 441, centered hann)
      → fold channels into frequency rows → per-band [RMSNorm→Linear]
      (62 mel-ish bands: 24×2, 12×4, 8×12, 8×24, 8×48, 128, 129 bins)
      → ``depth`` outer layers, each = transformer ACROSS TIME (per
      band) then ACROSS BANDS (per frame); attention is RoPE
      (interleaved-pair rotary), per-head sigmoid gates, RMSNorm-first,
      GELU MLP ×4
      → final RMSNorm → per-band MLP mask head with GLU
      → complex mask × STFT → ISTFT.

TPU mapping: the ``depth`` outer layers are weight-stacked and run under
``lax.scan`` (one compiled block, MXU-friendly (B·bands, T, D) matmuls);
the heterogeneous per-band linears run as a static unrolled loop (62
small matmuls, negligible next to the transformer stack).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.ops.stft import istft, stft

# 24×2 + 12×4 + 8×12 + 8×24 + 8×48 + 128 + 129 = 1025 = 2048 // 2 + 1
VIPERX_BANDS: Tuple[int, ...] = (
    (2,) * 24 + (4,) * 12 + (12,) * 8 + (24,) * 8 + (48,) * 8 + (128, 129)
)


@dataclass(frozen=True)
class BSRoformerConfig:
    dim: int = 512
    depth: int = 12
    stereo: bool = True
    num_stems: int = 1
    time_transformer_depth: int = 1
    freq_transformer_depth: int = 1
    heads: int = 8
    dim_head: int = 64
    ff_mult: int = 4
    freqs_per_bands: Tuple[int, ...] = VIPERX_BANDS
    n_fft: int = 2048
    hop: int = 441
    mask_estimator_depth: int = 2
    mlp_expansion_factor: int = 4
    sample_rate: int = 44_100
    rotary_theta: float = 10_000.0

    @property
    def channels(self) -> int:
        return 2 if self.stereo else 1

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def dim_inputs(self) -> Tuple[int, ...]:
        # per-band feature width: bins × channels × (real, imag)
        return tuple(2 * f * self.channels for f in self.freqs_per_bands)


# tiny config for tests
BSR_TEST = BSRoformerConfig(
    dim=16, depth=2, stereo=False, heads=2, dim_head=8, ff_mult=2,
    freqs_per_bands=(2, 2, 2, 2, 4, 4, 8, 9), n_fft=64, hop=16,
    mask_estimator_depth=1, mlp_expansion_factor=2, sample_rate=16_000)


# ---------------------------------------------------------------------------
# primitives (lucidrains conventions, bit-matched by the twin test)
# ---------------------------------------------------------------------------

def _rms_norm(x: jax.Array, gamma: jax.Array) -> jax.Array:
    """torch ``F.normalize(x, dim=-1) * sqrt(d) * gamma`` exactly."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12) * np.sqrt(x.shape[-1]) * gamma


def _rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """rotary-embedding-torch pairing: adjacent (even, odd) lanes."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rotary(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """x (..., n, d), freqs (d//2,) → interleaved-pair RoPE."""
    n = x.shape[-2]
    angles = jnp.arange(n)[:, None] * freqs[None, :]          # (n, d/2)
    angles = jnp.repeat(angles, 2, axis=-1)                   # (n, d)
    return x * jnp.cos(angles) + _rotate_half_interleaved(x) * jnp.sin(angles)


def _attention(x: jax.Array, p: Mapping[str, jax.Array], heads: int,
               dim_head: int, rot_freqs: jax.Array) -> jax.Array:
    """Gated RoPE attention over axis -2. x: (..., n, dim)."""
    h, dh = heads, dim_head
    y = _rms_norm(x, p["norm_gamma"])
    qkv = y @ p["qkv_w"]                                      # (..., n, 3hd)
    *lead, n, _ = qkv.shape
    qkv = qkv.reshape(*lead, n, 3, h, dh)
    q = jnp.moveaxis(qkv[..., 0, :, :], -2, -3)               # (..., h, n, d)
    k = jnp.moveaxis(qkv[..., 1, :, :], -2, -3)
    v = jnp.moveaxis(qkv[..., 2, :, :], -2, -3)
    q = _apply_rotary(q, rot_freqs)
    k = _apply_rotary(k, rot_freqs)
    logits = jnp.einsum("...hnd,...hmd->...hnm", q, k) * (dh ** -0.5)
    out = jnp.einsum("...hnm,...hmd->...hnd",
                     jax.nn.softmax(logits, axis=-1), v)
    gates = y @ p["gates_w"] + p["gates_b"]                   # (..., n, h)
    out = out * jax.nn.sigmoid(jnp.moveaxis(gates, -1, -2))[..., None]
    out = jnp.moveaxis(out, -3, -2).reshape(*lead, n, h * dh)
    return out @ p["out_w"]


def _feed_forward(x: jax.Array, p: Mapping[str, jax.Array]) -> jax.Array:
    y = _rms_norm(x, p["norm_gamma"])
    y = jax.nn.gelu(y @ p["w1"] + p["b1"], approximate=False)
    return y @ p["w2"] + p["b2"]


def _transformer(x: jax.Array, layers: List[Dict[str, Any]], heads: int,
                 dim_head: int, rot_freqs: jax.Array) -> jax.Array:
    for lyr in layers:
        x = x + _attention(x, lyr["attn"], heads, dim_head, rot_freqs)
        x = x + _feed_forward(x, lyr["ff"])
    return x


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, bias=True, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    lim = 1.0 / np.sqrt(d_in)
    w = jax.random.uniform(k1, (d_in, d_out), dtype, -lim, lim)
    if not bias:
        return w, None
    return w, jax.random.uniform(k2, (d_out,), dtype, -lim, lim)


def _init_attn(key, cfg: BSRoformerConfig, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    inner = cfg.heads * cfg.dim_head
    qkv, _ = _init_linear(k1, cfg.dim, 3 * inner, bias=False, dtype=dtype)
    gw, gb = _init_linear(k2, cfg.dim, cfg.heads, dtype=dtype)
    ow, _ = _init_linear(k3, inner, cfg.dim, bias=False, dtype=dtype)
    return {"norm_gamma": jnp.ones((cfg.dim,), dtype), "qkv_w": qkv,
            "gates_w": gw, "gates_b": gb, "out_w": ow}


def _init_ff(key, cfg: BSRoformerConfig, dtype):
    k1, k2 = jax.random.split(key)
    hidden = cfg.dim * cfg.ff_mult
    w1, b1 = _init_linear(k1, cfg.dim, hidden, dtype=dtype)
    w2, b2 = _init_linear(k2, hidden, cfg.dim, dtype=dtype)
    return {"norm_gamma": jnp.ones((cfg.dim,), dtype),
            "w1": w1, "b1": b1, "w2": w2, "b2": b2}


def _init_mask_mlp(key, cfg: BSRoformerConfig, d_in: int, dtype):
    """MLP(dim → hidden×depth → d_in*2) + GLU; weights as [w, b] pairs."""
    hidden = cfg.dim * cfg.mlp_expansion_factor
    dims = (cfg.dim, *([hidden] * cfg.mask_estimator_depth), d_in * 2)
    keys = jax.random.split(key, len(dims) - 1)
    ws = []
    for k, (a, b) in zip(keys, zip(dims[:-1], dims[1:])):
        w, bb = _init_linear(k, a, b, dtype=dtype)
        ws.append({"w": w, "b": bb})
    return ws


def init_params(cfg: BSRoformerConfig, key: jax.Array,
                dtype=jnp.float32) -> Dict[str, Any]:
    n_keys = 4 + 2 * cfg.depth * (cfg.time_transformer_depth
                                  + cfg.freq_transformer_depth)
    keys = iter(jax.random.split(key, n_keys + 64))

    band_split = []
    for d_in in cfg.dim_inputs:
        w, b = _init_linear(next(keys), d_in, cfg.dim, dtype=dtype)
        band_split.append({"gamma": jnp.ones((d_in,), dtype),
                           "w": w, "b": b})

    def stack_layers(inner_depth):
        per_outer = []
        for _ in range(cfg.depth):
            per_outer.append([{"attn": _init_attn(next(keys), cfg, dtype),
                               "ff": _init_ff(next(keys), cfg, dtype)}
                              for _ in range(inner_depth)])
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_outer)

    time_layers = stack_layers(cfg.time_transformer_depth)
    freq_layers = stack_layers(cfg.freq_transformer_depth)

    half = cfg.dim_head // 2
    rot = 1.0 / (cfg.rotary_theta
                 ** (np.arange(0, cfg.dim_head, 2) / cfg.dim_head))
    mask_estimators = []
    for _ in range(cfg.num_stems):
        mask_estimators.append(
            [_init_mask_mlp(next(keys), cfg, d_in, dtype)
             for d_in in cfg.dim_inputs])

    return {
        "band_split": band_split,
        "time_rotary": jnp.asarray(rot[:half], dtype),
        "freq_rotary": jnp.asarray(rot[:half], dtype),
        "layers": {"time": time_layers, "freq": freq_layers},
        "final_norm": jnp.ones((cfg.dim,), dtype),
        "mask_estimators": mask_estimators,
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _band_slices(cfg: BSRoformerConfig) -> List[Tuple[int, int]]:
    edges = np.concatenate([[0], np.cumsum(cfg.dim_inputs)])
    return [(int(a), int(b)) for a, b in zip(edges[:-1], edges[1:])]


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward_spec(params: Dict[str, Any], cfg: BSRoformerConfig,
                 spec: jax.Array) -> jax.Array:
    """Complex-mask prediction on a precomputed spectrogram.

    spec: (B, FS, T, 2) real/imag, FS = n_freqs * channels (channel
    minor).  Returns masks (B, num_stems, FS, T, 2).
    """
    b, fs, t, _ = spec.shape
    x = jnp.transpose(spec, (0, 2, 1, 3)).reshape(b, t, fs * 2)

    # band split
    bands = []
    for (s0, s1), p in zip(_band_slices(cfg), params["band_split"]):
        y = _rms_norm(x[..., s0:s1], p["gamma"])
        bands.append(y @ p["w"] + p["b"])
    h = jnp.stack(bands, axis=2)                   # (B, T, bands, D)

    n_bands = h.shape[2]
    heads, dh = cfg.heads, cfg.dim_head

    def body(carry, layer):
        # layer: per-depth slice {"time": [inner...], "freq": [inner...]}
        x = carry
        # across time, per band
        y = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * n_bands, t, cfg.dim)
        y = _transformer(y, layer["time"], heads, dh, params["time_rotary"])
        x = jnp.transpose(y.reshape(b, n_bands, t, cfg.dim), (0, 2, 1, 3))
        # across bands, per frame
        y = x.reshape(b * t, n_bands, cfg.dim)
        y = _transformer(y, layer["freq"], heads, dh, params["freq_rotary"])
        x = y.reshape(b, t, n_bands, cfg.dim)
        return x, None

    h, _ = jax.lax.scan(body, h, params["layers"])
    h = _rms_norm(h, params["final_norm"])

    # mask heads
    stems = []
    for est in params["mask_estimators"]:
        outs = []
        for band_idx, mlp in enumerate(est):
            y = h[:, :, band_idx]
            for i, lyr in enumerate(mlp):
                y = y @ lyr["w"] + lyr["b"]
                if i < len(mlp) - 1:
                    y = jnp.tanh(y)
            a, g = jnp.split(y, 2, axis=-1)
            outs.append(a * jax.nn.sigmoid(g))     # GLU
        stems.append(jnp.concatenate(outs, axis=-1))
    masks = jnp.stack(stems, axis=1)               # (B, stems, T, FS*2)
    masks = masks.reshape(b, cfg.num_stems, t, fs, 2)
    return jnp.transpose(masks, (0, 1, 3, 2, 4))   # (B, stems, FS, T, 2)


def separate(params: Dict[str, Any], cfg: BSRoformerConfig,
             audio: jax.Array) -> jax.Array:
    """audio (B, C, T) → stems (B, num_stems, C, T).

    Matches lucidrains ``BSRoformer.forward`` (masking in the complex
    STFT domain, centered hann analysis/synthesis).
    """
    b, c, length = audio.shape
    assert c == cfg.channels, (c, cfg.channels)
    r, i = stft(audio.reshape(b * c, length), cfg.n_fft, cfg.hop)
    f, t = r.shape[1], r.shape[2]
    spec = jnp.stack([r, i], axis=-1).reshape(b, c, f, t, 2)
    # fold channels into frequency rows: 'b s f t c -> b (f s) t c'
    spec = jnp.transpose(spec, (0, 2, 1, 3, 4)).reshape(b, f * c, t, 2)

    masks = forward_spec(params, cfg, spec)        # (B, stems, f*c, T, 2)

    sr, si = spec[..., 0], spec[..., 1]
    mr, mi = masks[..., 0], masks[..., 1]
    outr = sr[:, None] * mr - si[:, None] * mi     # complex multiply
    outi = sr[:, None] * mi + si[:, None] * mr
    # unfold: 'b n (f s) t -> (b n s) f t'
    outr = outr.reshape(b, cfg.num_stems, f, c, t)
    outi = outi.reshape(b, cfg.num_stems, f, c, t)
    flat_r = jnp.transpose(outr, (0, 1, 3, 2, 4)).reshape(-1, f, t)
    flat_i = jnp.transpose(outi, (0, 1, 3, 2, 4)).reshape(-1, f, t)
    out = istft(flat_r, flat_i, length, cfg.n_fft, cfg.hop)
    return out.reshape(b, cfg.num_stems, c, length)


def isolate_vocals(params: Dict[str, Any], cfg: BSRoformerConfig,
                   audio: jax.Array) -> jax.Array:
    """(B, T) mono or (B, C, T) → vocal stem, same shape as input."""
    mono = audio.ndim == 2
    if mono:
        audio = audio[:, None, :]
    if audio.shape[1] == 1 and cfg.channels == 2:
        audio = jnp.repeat(audio, 2, axis=1)
    stems = separate(params, cfg, audio)
    out = stems[:, 0]
    if mono:
        out = out.mean(axis=1)
    return out


# ---------------------------------------------------------------------------
# converter: lucidrains BSRoformer state dict → params pytree
# ---------------------------------------------------------------------------

def _np_(t) -> np.ndarray:
    return np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy()
                      if hasattr(t, "detach") else t, np.float32)


def params_from_torch_state_dict(
        sd: Mapping[str, Any], cfg: BSRoformerConfig,
        dtype=jnp.float32) -> Dict[str, Any]:
    """Load a lucidrains ``BSRoformer`` state dict.

    Vendor tensor names handled (the package's own module hierarchy):
      band_split.to_features.{i}.0.gamma / .1.weight / .1.bias
      layers.{d}.{k}.layers.{l}.0.{norm.gamma,to_qkv.weight,
          to_gates.weight,to_gates.bias,to_out.0.weight}
      layers.{d}.{k}.layers.{l}.1.net.{0.gamma,1.weight,1.bias,
          4.weight,4.bias}
      final_norm.gamma
      mask_estimators.{s}.to_freqs.{i}.0.{j}.weight/.bias
      time_rotary_embed.freqs / freq_rotary_embed.freqs
    with k = 0 the time transformer and k = 1 the freq transformer
    (linear_transformer_depth = 0, as in the published vocal models).
    """
    def g(name):
        if name not in sd:
            raise KeyError(
                f"missing tensor {name!r}; nearest: "
                f"{[k for k in sd if name.split('.')[0] in k][:4]}")
        return _np_(sd[name])

    band_split = []
    for i, d_in in enumerate(cfg.dim_inputs):
        pre = f"band_split.to_features.{i}"
        band_split.append({
            "gamma": jnp.asarray(g(f"{pre}.0.gamma"), dtype),
            "w": jnp.asarray(g(f"{pre}.1.weight").T, dtype),
            "b": jnp.asarray(g(f"{pre}.1.bias"), dtype)})

    def attn(pre):
        return {
            "norm_gamma": jnp.asarray(g(f"{pre}.norm.gamma"), dtype),
            "qkv_w": jnp.asarray(g(f"{pre}.to_qkv.weight").T, dtype),
            "gates_w": jnp.asarray(g(f"{pre}.to_gates.weight").T, dtype),
            "gates_b": jnp.asarray(g(f"{pre}.to_gates.bias"), dtype),
            "out_w": jnp.asarray(g(f"{pre}.to_out.0.weight").T, dtype)}

    def ff(pre):
        return {
            "norm_gamma": jnp.asarray(g(f"{pre}.net.0.gamma"), dtype),
            "w1": jnp.asarray(g(f"{pre}.net.1.weight").T, dtype),
            "b1": jnp.asarray(g(f"{pre}.net.1.bias"), dtype),
            "w2": jnp.asarray(g(f"{pre}.net.4.weight").T, dtype),
            "b2": jnp.asarray(g(f"{pre}.net.4.bias"), dtype)}

    def stack_branch(k, inner_depth):
        per_outer = []
        for d in range(cfg.depth):
            per_outer.append(
                [{"attn": attn(f"layers.{d}.{k}.layers.{l}.0"),
                  "ff": ff(f"layers.{d}.{k}.layers.{l}.1")}
                 for l in range(inner_depth)])
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_outer)

    mask_estimators = []
    for s in range(cfg.num_stems):
        est = []
        n_linears = cfg.mask_estimator_depth + 1
        for i in range(len(cfg.dim_inputs)):
            mlp = []
            for j in range(n_linears):
                pre = f"mask_estimators.{s}.to_freqs.{i}.0.{2 * j}"
                mlp.append({"w": jnp.asarray(g(f"{pre}.weight").T, dtype),
                            "b": jnp.asarray(g(f"{pre}.bias"), dtype)})
            est.append(mlp)
        mask_estimators.append(est)

    half = cfg.dim_head // 2
    default_rot = (1.0 / (cfg.rotary_theta ** (
        np.arange(0, cfg.dim_head, 2) / cfg.dim_head)))[:half]

    def rot(name):
        return jnp.asarray(
            g(name) if name in sd else default_rot, dtype)

    return {
        "band_split": band_split,
        "time_rotary": rot("time_rotary_embed.freqs"),
        "freq_rotary": rot("freq_rotary_embed.freqs"),
        "layers": {
            "time": stack_branch(0, cfg.time_transformer_depth),
            "freq": stack_branch(1, cfg.freq_transformer_depth)},
        "final_norm": jnp.asarray(g("final_norm.gamma"), dtype),
        "mask_estimators": mask_estimators,
    }


# ---------------------------------------------------------------------------
# checkpoint IO
# ---------------------------------------------------------------------------

def save_params(path: str, params: Dict[str, Any],
                cfg: BSRoformerConfig) -> None:
    import dataclasses

    from whisperjav_tpu.utils.pytree_npz import save_pytree

    save_pytree(path, jax.tree.map(np.asarray, params),
                meta=dataclasses.asdict(cfg))


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], BSRoformerConfig]:
    """Load a checkpoint by extension: ``.npz`` (our format), ``.onnx``
    (torch-export initializer names), or torch ``.pt/.pth/.ckpt/.bin``."""
    p = str(path)
    if p.endswith(".npz"):
        from whisperjav_tpu.utils.pytree_npz import load_pytree

        tree, meta = load_pytree(p)
        if meta is None:
            raise ValueError(f"{p}: missing config metadata")
        meta["freqs_per_bands"] = tuple(meta["freqs_per_bands"])
        return jax.tree.map(jnp.asarray, tree), BSRoformerConfig(**meta)
    if p.endswith(".onnx"):
        from whisperjav_tpu.utils.onnx_io import read_initializers

        sd = read_initializers(p)
    else:
        import torch

        obj = torch.load(p, map_location="cpu", weights_only=True)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        sd = {k[6:] if k.startswith("model.") else k: v
              for k, v in sd.items()}
    cfg = config_from_state_dict(sd)
    return params_from_torch_state_dict(sd, cfg), cfg


def config_from_state_dict(sd: Mapping[str, Any]) -> BSRoformerConfig:
    """Infer the architecture hyperparameters from a vendor state dict."""
    dim = int(_np_(sd["final_norm.gamma"]).shape[0])
    depth = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("layers."))
    inner = {0: 0, 1: 0}
    for k in sd:
        parts = k.split(".")
        if k.startswith("layers.0.") and parts[3].isdigit():
            branch = int(parts[2])
            if branch in inner:
                inner[branch] = max(inner[branch], int(parts[3]) + 1)
    qkv = _np_(sd["layers.0.0.layers.0.0.to_qkv.weight"])
    heads = int(_np_(sd["layers.0.0.layers.0.0.to_gates.bias"]).shape[0])
    dim_head = qkv.shape[0] // (3 * heads)
    ff_mult = _np_(sd["layers.0.0.layers.0.1.net.1.weight"]).shape[0] // dim
    n_bands = 1 + max(int(k.split(".")[2]) for k in sd
                      if k.startswith("band_split.to_features."))
    dims_in = [int(_np_(sd[f"band_split.to_features.{i}.1.weight"]).shape[1])
               for i in range(n_bands)]
    num_stems = 1 + max((int(k.split(".")[1]) for k in sd
                         if k.startswith("mask_estimators.")), default=0)
    mask_linears = 1 + max(
        int(k.split(".")[5]) // 2 for k in sd
        if k.startswith("mask_estimators.0.to_freqs.0.0."))
    total = sum(dims_in)
    for stereo, n_fft in ((True, (total // 4 - 1) * 2),
                          (False, (total // 2 - 1) * 2)):
        chans = 2 if stereo else 1
        if (n_fft // 2 + 1) * 2 * chans == total and n_fft > 0:
            freqs = tuple(d // (2 * chans) for d in dims_in)
            return BSRoformerConfig(
                dim=dim, depth=depth, stereo=stereo, num_stems=num_stems,
                time_transformer_depth=inner[0] or 1,
                freq_transformer_depth=inner[1] or 1,
                heads=heads, dim_head=dim_head, ff_mult=ff_mult,
                freqs_per_bands=freqs, n_fft=n_fft,
                mask_estimator_depth=mask_linears - 1)
    raise ValueError(f"cannot infer stft size from band dims {dims_in}")
