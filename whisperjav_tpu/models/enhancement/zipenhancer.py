"""ZipEnhancer-family speech denoiser (MP-SENet architecture) in JAX.

Checkpoint-class counterpart of the reference's ZipEnhancer backend
(reference: whisperjav/modules/speech_enhancement/backends/
zipenhancer.py:36-51,438-503 — modelscope
``speech_zipenhancer_ans_multiloss_16k_base``; ONNX contract: STFT
magnitude^0.3 + phase in → enhanced magnitude + phase out, n_fft 400 /
hop 100 / win 400, with a per-clip RMS norm factor). This module
implements the paper's dual-path masking design:

    (mag, pha) stacked → DenseEncoder (1×1 conv → dilated dense block
    over time → stride-(1,2) freq downsample) → N dual-path blocks
    (self-attention + FFN along TIME per frequency, then along FREQUENCY
    per frame) → MaskDecoder (dense block → freq ConvTranspose up →
    learnable per-frequency sigmoid; enhanced_mag = noisy_mag·mask) and
    PhaseDecoder (dense block → up → real/imag heads → atan2).

``mag_pha_stft``/``mag_pha_istft`` reproduce the modelscope pre/post
math exactly (power-law compression 0.3, centered hann STFT). The torch
state-dict converter handles real torch conventions — packed
MultiheadAttention in_proj, InstanceNorm2d affine, PReLU slopes — and is
verified layer-exactly against a torch twin in
tests/test_zipenhancer_parity.py. Canonical tensor names are this
module's own (documented in ``params_from_torch_state_dict``); a
``rename`` hook adapts vendor checkpoints whose names differ.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.ops.stft import istft, stft

N_FFT = 400
HOP = 100
COMPRESS = 0.3
N_FREQS = N_FFT // 2 + 1   # 201


@dataclass(frozen=True)
class ZipConfig:
    width: int = 64          # channel width C
    n_blocks: int = 4        # dual-path blocks
    n_heads: int = 4
    ffn_mult: int = 4
    dense_depth: int = 4     # dilated dense block layers (dilations 2**i)
    n_freqs: int = N_FREQS

    @property
    def down_freqs(self) -> int:
        # stride-(1,2) conv, kernel (1,3), pad (0,1): F → (F+1)//2 + ...
        return (self.n_freqs + 2 - 3) // 2 + 1


ZIP_TEST = ZipConfig(width=8, n_blocks=1, n_heads=2, ffn_mult=2,
                     dense_depth=2)
ZIP_BASE = ZipConfig()


# ---------------------------------------------------------------------------
# STFT interface (modelscope mag_pha_stft/istft semantics)
# ---------------------------------------------------------------------------

def mag_pha_stft(audio: jax.Array, compress_factor: float = COMPRESS
                 ) -> Tuple[jax.Array, jax.Array]:
    """audio (B, T) → (mag**cf, pha), each (B, F, frames)."""
    r, i = stft(audio, N_FFT, HOP)
    mag = jnp.sqrt(r * r + i * i + 1e-9)
    pha = jnp.arctan2(i, r)
    return jnp.power(mag, compress_factor), pha


def mag_pha_istft(mag: jax.Array, pha: jax.Array, length: int,
                  compress_factor: float = COMPRESS) -> jax.Array:
    """Inverse: decompress magnitude, recombine with phase, ISTFT."""
    mag = jnp.power(mag, 1.0 / compress_factor)
    return istft(mag * jnp.cos(pha), mag * jnp.sin(pha), length,
                 N_FFT, HOP)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv2d(x, w, b, stride=(1, 1), dilation=(1, 1), pad=None):
    if pad is None:
        pad_h = ((w.shape[2] - 1) * dilation[0]) // 2
        pad_w = ((w.shape[3] - 1) * dilation[1]) // 2
        pad = ((pad_h, pad_h), (pad_w, pad_w))
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding=pad,
        rhs_dilation=dilation, dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _conv_t2d_freq(x, w, b):
    """ConvTranspose2d kernel (1,3) stride (1,2) pad (0,1): F' → 2F'-1.

    Exact torch semantics via lhs dilation: insert stride-1 zeros between
    freq inputs, pad by (k-1-p), convolve with the spatially-flipped
    kernel with in/out channels swapped. w is torch layout
    (in, out, kh, kw).
    """
    w_flip = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)  # (out,in,kh,kw)
    out = jax.lax.conv_general_dilated(
        x, w_flip.astype(x.dtype), window_strides=(1, 1),
        padding=((0, 0), (1, 1)),          # (kh-1-ph, kw-1-pw) = (0, 1)
        lhs_dilation=(1, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _instance_norm(x, scale, bias, eps=1e-5):
    """InstanceNorm2d(affine): normalize over (H, W) per channel/sample."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(2, 3), keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=(2, 3), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)[None, :, None, None]
            + bias.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _prelu(x, slope):
    """Per-channel PReLU; x (B, C, H, W), slope (C,)."""
    s = slope.astype(jnp.float32)[None, :, None, None]
    x32 = x.astype(jnp.float32)
    return jnp.where(x32 >= 0, x32, s * x32).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _he(k, shape, dtype):
    fan_in = int(np.prod(shape[1:]))
    return (jax.random.normal(k, shape) * (2.0 / fan_in) ** 0.5).astype(dtype)


def _init_dense_block(key, cfg: ZipConfig, dtype):
    c = cfg.width
    ks = jax.random.split(key, cfg.dense_depth)
    layers = []
    for i in range(cfg.dense_depth):
        layers.append({
            "w": _he(ks[i], (c, c * (i + 1), 3, 3), dtype),
            "b": jnp.zeros((c,), dtype),
            "in_s": jnp.ones((c,), dtype), "in_b": jnp.zeros((c,), dtype),
            "pr": jnp.full((c,), 0.25, dtype),
        })
    return layers


def _init_attn(key, d, dtype):
    ks = jax.random.split(key, 4)
    s = d ** -0.5
    return {
        "wq": (jax.random.normal(ks[0], (d, d)) * s).astype(dtype),
        "wk": (jax.random.normal(ks[1], (d, d)) * s).astype(dtype),
        "wv": (jax.random.normal(ks[2], (d, d)) * s).astype(dtype),
        "bq": jnp.zeros((d,), dtype), "bk": jnp.zeros((d,), dtype),
        "bv": jnp.zeros((d,), dtype),
        "wo": (jax.random.normal(ks[3], (d, d)) * s).astype(dtype),
        "bo": jnp.zeros((d,), dtype),
    }


def _init_dp_sub(key, cfg: ZipConfig, dtype):
    d = cfg.width
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "ln1_s": jnp.ones((d,), dtype), "ln1_b": jnp.zeros((d,), dtype),
        "attn": _init_attn(k1, d, dtype),
        "ln2_s": jnp.ones((d,), dtype), "ln2_b": jnp.zeros((d,), dtype),
        "w1": _he(k2, (d * cfg.ffn_mult, d, 1, 1), dtype
                  ).reshape(d * cfg.ffn_mult, d).T,
        "b1": jnp.zeros((d * cfg.ffn_mult,), dtype),
        "w2": _he(k3, (d, d * cfg.ffn_mult, 1, 1), dtype
                  ).reshape(d, d * cfg.ffn_mult).T,
        "b2": jnp.zeros((d,), dtype),
    }


def init_params(key: jax.Array, cfg: ZipConfig = ZIP_BASE,
                dtype=jnp.float32) -> Dict:
    c = cfg.width
    ks = jax.random.split(key, 12 + cfg.n_blocks * 2)
    params: Dict[str, Any] = {
        "enc_conv1_w": _he(ks[0], (c, 2, 1, 1), dtype),
        "enc_conv1_b": jnp.zeros((c,), dtype),
        "enc_norm1_s": jnp.ones((c,), dtype),
        "enc_norm1_b": jnp.zeros((c,), dtype),
        "enc_pr1": jnp.full((c,), 0.25, dtype),
        "enc_dense": _init_dense_block(ks[1], cfg, dtype),
        "enc_conv2_w": _he(ks[2], (c, c, 1, 3), dtype),
        "enc_conv2_b": jnp.zeros((c,), dtype),
        "enc_norm2_s": jnp.ones((c,), dtype),
        "enc_norm2_b": jnp.zeros((c,), dtype),
        "enc_pr2": jnp.full((c,), 0.25, dtype),
        "blocks": [
            {"time": _init_dp_sub(ks[10 + 2 * i], cfg, dtype),
             "freq": _init_dp_sub(ks[11 + 2 * i], cfg, dtype)}
            for i in range(cfg.n_blocks)
        ],
        "mask_dense": _init_dense_block(ks[3], cfg, dtype),
        "mask_up_w": _he(ks[4], (c, c, 1, 3), dtype),
        "mask_up_b": jnp.zeros((c,), dtype),
        "mask_conv_w": _he(ks[5], (1, c, 1, 1), dtype),
        "mask_conv_b": jnp.zeros((1,), dtype),
        "mask_beta": jnp.full((cfg.n_freqs,), 2.0, dtype),  # learnable sigmoid
        "pha_dense": _init_dense_block(ks[6], cfg, dtype),
        "pha_up_w": _he(ks[7], (c, c, 1, 3), dtype),
        "pha_up_b": jnp.zeros((c,), dtype),
        "pha_r_w": _he(ks[8], (1, c, 1, 1), dtype),
        "pha_r_b": jnp.zeros((1,), dtype),
        "pha_i_w": _he(ks[9], (1, c, 1, 1), dtype),
        "pha_i_b": jnp.zeros((1,), dtype),
    }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _dense_block(x, layers):
    """Dilated dense block: layer i sees all previous features, dilation
    2**i along the TIME axis (MP-SENet DS-DDB semantics)."""
    feats = x
    for i, p in enumerate(layers):
        h = _conv2d(feats, p["w"], p["b"], dilation=(2 ** i, 1))
        h = _prelu(_instance_norm(h, p["in_s"], p["in_b"]), p["pr"])
        feats = jnp.concatenate([feats, h], axis=1)
        x = h
    return x


def _layer_norm(x, s, b, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * s.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def _mhsa(x, p, n_heads):
    """x (N, T, d) — bidirectional self-attention (torch MHA semantics)."""
    n, t, d = x.shape
    hd = d // n_heads
    q = (x @ p["wq"].astype(x.dtype) + p["bq"]).reshape(n, t, n_heads, hd)
    k = (x @ p["wk"].astype(x.dtype) + p["bk"]).reshape(n, t, n_heads, hd)
    v = (x @ p["wv"].astype(x.dtype) + p["bv"]).reshape(n, t, n_heads, hd)
    logits = jnp.einsum("nqhd,nkhd->nhqk", q * hd ** -0.5, k,
                        preferred_element_type=jnp.float32)
    a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    o = jnp.einsum("nhqk,nkhd->nqhd", a, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return o.reshape(n, t, d) @ p["wo"].astype(x.dtype) + p["bo"]


def _dp_sub(x, p, n_heads):
    """Pre-LN attention + FFN over the middle axis of (N, T, d)."""
    h = _layer_norm(x, p["ln1_s"], p["ln1_b"])
    x = x + _mhsa(h, p["attn"], n_heads)
    h = _layer_norm(x, p["ln2_s"], p["ln2_b"])
    h = jax.nn.gelu(h @ p["w1"].astype(x.dtype) + p["b1"],
                    approximate=False)
    return x + (h @ p["w2"].astype(x.dtype) + p["b2"])


def forward(params: Dict, cfg: ZipConfig, mag: jax.Array, pha: jax.Array
            ) -> Tuple[jax.Array, jax.Array]:
    """(mag, pha) each (B, F, T) compressed-domain → enhanced (mag, pha).

    The ONNX-contract shape: frequency-major spectrogram inputs/outputs.
    """
    b, f, t = mag.shape
    x = jnp.stack([mag, pha], axis=1).transpose(0, 1, 3, 2)  # (B, 2, T, F)

    x = _conv2d(x, params["enc_conv1_w"], params["enc_conv1_b"])
    x = _prelu(_instance_norm(x, params["enc_norm1_s"],
                              params["enc_norm1_b"]), params["enc_pr1"])
    x = _dense_block(x, params["enc_dense"])
    x = _conv2d(x, params["enc_conv2_w"], params["enc_conv2_b"],
                stride=(1, 2), pad=((0, 0), (1, 1)))
    x = _prelu(_instance_norm(x, params["enc_norm2_s"],
                              params["enc_norm2_b"]), params["enc_pr2"])

    c = cfg.width
    fd = x.shape[-1]
    for blk in params["blocks"]:
        # time path: (B*F', T, C)
        h = x.transpose(0, 3, 2, 1).reshape(b * fd, t, c)
        h = _dp_sub(h, blk["time"], cfg.n_heads)
        x = h.reshape(b, fd, t, c).transpose(0, 3, 2, 1)
        # freq path: (B*T, F', C)
        h = x.transpose(0, 2, 3, 1).reshape(b * t, fd, c)
        h = _dp_sub(h, blk["freq"], cfg.n_heads)
        x = h.reshape(b, t, fd, c).transpose(0, 3, 1, 2)

    # mask decoder
    m = _dense_block(x, params["mask_dense"])
    m = _conv_t2d_freq(m, params["mask_up_w"], params["mask_up_b"])
    m = _conv2d(m, params["mask_conv_w"], params["mask_conv_b"])
    m = m[:, 0].transpose(0, 2, 1)                     # (B, F, T)
    mask = 1.2 / (1.0 + jnp.exp(
        -params["mask_beta"].astype(jnp.float32)[None, :, None]
        * m.astype(jnp.float32)))
    mag_out = mag * mask.astype(mag.dtype)

    # phase decoder
    ph = _dense_block(x, params["pha_dense"])
    ph = _conv_t2d_freq(ph, params["pha_up_w"], params["pha_up_b"])
    r = _conv2d(ph, params["pha_r_w"], params["pha_r_b"])[:, 0]
    i = _conv2d(ph, params["pha_i_w"], params["pha_i_b"])[:, 0]
    pha_out = jnp.arctan2(i.astype(jnp.float32),
                          r.astype(jnp.float32)).transpose(0, 2, 1)
    return mag_out, pha_out.astype(pha.dtype)


@functools.partial(jax.jit, static_argnames=("cfg", "length"))
def denoise(params: Dict, audio: jax.Array, length: int,
            cfg: ZipConfig = ZIP_BASE) -> jax.Array:
    """audio (B, length) → denoised (B, length).

    Includes the modelscope pre/post math: per-clip RMS norm factor,
    compressed-domain enhancement, ISTFT, denorm.
    """
    audio = audio[:, :length]
    norm = jnp.sqrt(length / (jnp.sum(audio.astype(jnp.float32) ** 2,
                                      axis=1, keepdims=True) + 1e-9))
    x = audio * norm
    mag, pha = mag_pha_stft(x)
    mag_g, pha_g = forward(params, cfg, mag, pha)
    wav = mag_pha_istft(mag_g, pha_g, length)
    return (wav / norm).astype(jnp.float32)


# ---------------------------------------------------------------------------
# checkpoint conversion
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def params_from_torch_state_dict(
    sd: Mapping[str, Any], cfg: ZipConfig = ZIP_BASE, dtype=np.float32,
    rename: Optional[Callable[[str], str]] = None,
) -> Dict:
    """Convert a torch generator state dict to our tree.

    Canonical names (the torch twin in tests/test_zipenhancer_parity.py
    emits exactly these; vendor checkpoints adapt via ``rename``):

    - ``dense_encoder.conv1/norm1/prelu1``, ``dense_encoder.dense.{i}.
      conv/norm/prelu``, ``dense_encoder.conv2/norm2/prelu2``
    - ``blocks.{n}.{time|freq}.ln1/attn/ln2/fc1/fc2`` where ``attn`` is a
      torch ``nn.MultiheadAttention`` (packed ``in_proj_weight``)
    - ``mask_decoder.dense.{i}.*``, ``mask_decoder.up``, ``mask_decoder.
      conv``, ``mask_decoder.beta``
    - ``phase_decoder.dense.{i}.*``, ``phase_decoder.up``,
      ``phase_decoder.conv_r``, ``phase_decoder.conv_i``
    """
    if rename is not None:
        sd = {rename(k): v for k, v in sd.items()}

    def g(name):
        return _np(sd[name]).astype(dtype)

    def dense(prefix):
        out = []
        for i in range(cfg.dense_depth):
            out.append({
                "w": g(f"{prefix}.{i}.conv.weight"),
                "b": g(f"{prefix}.{i}.conv.bias"),
                "in_s": g(f"{prefix}.{i}.norm.weight"),
                "in_b": g(f"{prefix}.{i}.norm.bias"),
                "pr": g(f"{prefix}.{i}.prelu.weight"),
            })
        return out

    def attn(prefix):
        d = cfg.width
        wqkv = g(f"{prefix}.in_proj_weight")          # (3d, d)
        bqkv = g(f"{prefix}.in_proj_bias")
        return {
            "wq": wqkv[:d].T, "wk": wqkv[d:2 * d].T, "wv": wqkv[2 * d:].T,
            "bq": bqkv[:d], "bk": bqkv[d:2 * d], "bv": bqkv[2 * d:],
            "wo": g(f"{prefix}.out_proj.weight").T,
            "bo": g(f"{prefix}.out_proj.bias"),
        }

    def dp_sub(prefix):
        return {
            "ln1_s": g(f"{prefix}.ln1.weight"),
            "ln1_b": g(f"{prefix}.ln1.bias"),
            "attn": attn(f"{prefix}.attn"),
            "ln2_s": g(f"{prefix}.ln2.weight"),
            "ln2_b": g(f"{prefix}.ln2.bias"),
            "w1": g(f"{prefix}.fc1.weight").T,
            "b1": g(f"{prefix}.fc1.bias"),
            "w2": g(f"{prefix}.fc2.weight").T,
            "b2": g(f"{prefix}.fc2.bias"),
        }

    n_blocks = 0
    while f"blocks.{n_blocks}.time.ln1.weight" in sd:
        n_blocks += 1

    return {
        "enc_conv1_w": g("dense_encoder.conv1.weight"),
        "enc_conv1_b": g("dense_encoder.conv1.bias"),
        "enc_norm1_s": g("dense_encoder.norm1.weight"),
        "enc_norm1_b": g("dense_encoder.norm1.bias"),
        "enc_pr1": g("dense_encoder.prelu1.weight"),
        "enc_dense": dense("dense_encoder.dense"),
        "enc_conv2_w": g("dense_encoder.conv2.weight"),
        "enc_conv2_b": g("dense_encoder.conv2.bias"),
        "enc_norm2_s": g("dense_encoder.norm2.weight"),
        "enc_norm2_b": g("dense_encoder.norm2.bias"),
        "enc_pr2": g("dense_encoder.prelu2.weight"),
        "blocks": [{"time": dp_sub(f"blocks.{i}.time"),
                    "freq": dp_sub(f"blocks.{i}.freq")}
                   for i in range(n_blocks)],
        "mask_dense": dense("mask_decoder.dense"),
        "mask_up_w": g("mask_decoder.up.weight"),
        "mask_up_b": g("mask_decoder.up.bias"),
        "mask_conv_w": g("mask_decoder.conv.weight"),
        "mask_conv_b": g("mask_decoder.conv.bias"),
        "mask_beta": g("mask_decoder.beta"),
        "pha_dense": dense("phase_decoder.dense"),
        "pha_up_w": g("phase_decoder.up.weight"),
        "pha_up_b": g("phase_decoder.up.bias"),
        "pha_r_w": g("phase_decoder.conv_r.weight"),
        "pha_r_b": g("phase_decoder.conv_r.bias"),
        "pha_i_w": g("phase_decoder.conv_i.weight"),
        "pha_i_b": g("phase_decoder.conv_i.bias"),
    }


#: Vendor prefixes seen on published generator state dicts (ModelScope
#: wraps the generator in a decorator module; ONNX exports keep the
#: torch names).  ``params_from_vendor`` strips the first that matches.
VENDOR_PREFIXES = ("generator.", "model.generator.", "model.",
                   "denoise_net.", "module.")


def _strip_vendor_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    for pre in VENDOR_PREFIXES:
        if any(k.startswith(pre) for k in sd):
            return {k[len(pre):] if k.startswith(pre) else k: v
                    for k, v in sd.items()}
    return dict(sd)


def params_from_vendor(
    sd: Mapping[str, Any], cfg: ZipConfig = ZIP_BASE, dtype=np.float32,
) -> Dict:
    """Vendor state dict (ModelScope torch ``.bin`` contents or ONNX
    initializers) → params, stripping wrapper prefixes first.

    Reference loads the same tensors through modelscope / onnxruntime
    (reference: whisperjav/modules/speech_enhancement/backends/
    zipenhancer.py:164-258).
    """
    return params_from_torch_state_dict(
        _strip_vendor_prefix(sd), cfg, dtype)


def params_from_onnx(src, cfg: ZipConfig = ZIP_BASE,
                     dtype=np.float32) -> Dict:
    """Load from an ONNX export (e.g. the ``ZipEnhancer-se-16k-base-onnx``
    file the reference's ONNX mode downloads): torch.onnx.export keeps
    state-dict names as initializer names, so the file's initializers
    ARE the vendor state dict."""
    from whisperjav_tpu.utils.onnx_io import read_initializers

    return params_from_vendor(read_initializers(src), cfg, dtype)


# ---------------------------------------------------------------------------
# npz round-trip
# ---------------------------------------------------------------------------

def save_params(path: str, params: Dict,
                cfg: Optional[ZipConfig] = None) -> None:
    flat: Dict[str, np.ndarray] = {}
    if cfg is not None:
        flat["__cfg__"] = np.asarray([cfg.width, cfg.n_blocks, cfg.n_heads,
                                      cfg.ffn_mult, cfg.dense_depth,
                                      cfg.n_freqs], np.int64)

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                rec(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", params)
    np.savez(path, **flat)


def load_params(path: str) -> Tuple[Dict, ZipConfig]:
    """Load (params, cfg) from .npz (cfg defaults to ZIP_BASE when the
    archive carries no __cfg__ record)."""
    data = np.load(path)
    cfg = ZIP_BASE
    tree: Dict = {}
    for key in data.files:
        if key == "__cfg__":
            v = [int(x) for x in data[key]]
            cfg = ZipConfig(*v)
            continue
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])

    def listify(n):
        if isinstance(n, dict):
            if n and all(k.isdigit() for k in n):
                return [listify(n[str(i)]) for i in range(len(n))]
            return {k: listify(v) for k, v in n.items()}
        return n

    return listify(tree), cfg
