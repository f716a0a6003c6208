"""Checkpoint-faithful FRCRN speech enhancement (ClearVoice FRCRN_SE_16K).

The reference's ClearVoice backend offers FRCRN_SE_16K — ModelScope's
``speech_frcrn_ans_cirm_16k`` denoiser (reference: whisperjav/modules/
speech_enhancement/backends/clearvoice.py:36-41,116-125).  This module
implements THAT architecture — the FRCRN paper's complex U-Net with
frequency-recurrent FSMN blocks and cascaded dual U-Nets predicting a
complex ideal ratio mask (cIRM) — with the vendor implementation's
module math, so published state dicts bind through
:func:`params_from_torch_state_dict`:

* **ComplexConv2d / ComplexConvTranspose2d** — two real convs
  (``conv_re`` / ``conv_im``), complex-multiplied:
  ``y_r = conv_re(x_r) - conv_im(x_i)``, ``y_i = conv_re(x_i) +
  conv_im(x_r)``; transposed convs use torch's ``(in, out, kH, kW)``
  weight layout and output-size semantics.
* **ComplexBatchNorm2d** — deep-complex-networks whitening BN:
  running mean (C, 2), running covariance (C, 3) [V_rr, V_ii, V_ri],
  learnable ``weight`` (C, 3) [W_rr, W_ri, W_ii] and ``bias`` (C, 2);
  inference uses the running stats (this is an inference framework).
* **ComplexUniDeepFsmn** — frequency recurrence: per complex part a
  UniDeepFsmn (linear→ReLU→project→depthwise memory conv over the
  FREQUENCY axis with ±(lorder-1) context, residual), combined
  complex-linearly (re = f_re(x_r) - f_im(x_i), im = f_re(x_i) +
  f_im(x_r)).
* **Cascade** — ``mask = tanh(unet(x)) + tanh(unet2(unet(x)))``;
  ``est = spec ∘ mask`` (complex product), ISTFT (win 640 / hop 320 /
  fft 640 @16 kHz — the published model's ConvSTFT geometry).

The converter infers the per-stage geometry (channels, kernel sizes,
FSMN presence and order) from the state dict itself, so checkpoint
hyperparameters need not be guessed.  ``tests/test_frcrn_parity.py``
builds a torch twin from this exact module list and checks layer-exact
parity through the converter.

TPU mapping: all compute is conv2d/matmul on (B, C, F, T) blocks (MXU);
the FSMN "recurrence" is a finite depthwise conv, not a sequential scan,
so the whole network is one feed-forward XLA program. Complex pairs ride
as separate real tensors (XLA has no complex MXU path).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.ops.stft import istft, stft

SAMPLE_RATE = 16_000
N_FFT = 640
HOP = 320


@dataclass(frozen=True)
class StageGeom:
    """One encoder/decoder stage's conv geometry."""
    c_in: int
    c_out: int
    kernel: Tuple[int, int] = (5, 2)       # (freq, time)
    stride: Tuple[int, int] = (2, 1)
    padding: Tuple[int, int] = (2, 1)
    fsmn: bool = True


@dataclass(frozen=True)
class FRCRNConfig:
    n_fft: int = N_FFT
    hop: int = HOP
    lorder: int = 20                       # FSMN memory half-order
    encoders: Tuple[StageGeom, ...] = ()
    decoders: Tuple[StageGeom, ...] = ()

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


def default_config(complexity: int = 45, depth: int = 14,
                   lorder: int = 20) -> FRCRNConfig:
    """The published model's geometry family: ``depth`` total stages
    (depth//2 encoders), channel ladder 1→C→C→2C→2C→2C→128."""
    n = depth // 2
    chans = [1]
    for i in range(n - 1):
        chans.append(complexity if i < 2 else complexity * 2)
    chans.append(128)
    encs = tuple(StageGeom(chans[i], chans[i + 1]) for i in range(n))
    decs = []
    for i in reversed(range(n)):
        skip = chans[i + 1]                # concatenated encoder output
        c_in = chans[i + 1] + (skip if i < n - 1 else 0)
        decs.append(StageGeom(c_in, chans[i], fsmn=i > 0))
    return FRCRNConfig(encoders=encs, decoders=tuple(decs),
                       lorder=lorder)


FRCRN_SE_16K = default_config()

# tiny test config (n_fft 64 → 33 freq rows, 2 stages)
FRCRN_TEST = FRCRNConfig(
    n_fft=64, hop=16, lorder=3,
    encoders=(StageGeom(1, 4), StageGeom(4, 6)),
    decoders=(StageGeom(6, 4), StageGeom(8, 1, fsmn=False)))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv2d(x, w, b, stride, padding):
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None] if b is not None else out


def _conv_t2d(x, w, b, stride, padding):
    """torch ConvTranspose2d with output_padding 1 on the frequency
    axis: w (in, out, kH, kW), out_F = (in-1)*s - 2p + k + 1.

    The extra row covers mirror stages whose encoder input was even
    (stride-2 halving is not uniquely invertible); the caller crops to
    the mirrored encoder's exact size.
    """
    kh, kw = w.shape[2], w.shape[3]
    wt = jnp.flip(jnp.swapaxes(w, 0, 1), (2, 3))       # (out, in, kH, kW)
    out = jax.lax.conv_general_dilated(
        x, wt, window_strides=(1, 1),
        padding=[(kh - 1 - padding[0], kh - 1 - padding[0] + 1),
                 (kw - 1 - padding[1],) * 2],
        lhs_dilation=stride,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out + b[None, :, None, None] if b is not None else out


def _complex_op(op, xr, xi, p, *args):
    yr = op(xr, p["re_w"], p.get("re_b"), *args) \
        - op(xi, p["im_w"], p.get("im_b"), *args)
    yi = op(xi, p["re_w"], p.get("re_b"), *args) \
        + op(xr, p["im_w"], p.get("im_b"), *args)
    return yr, yi


def _complex_bn(xr, xi, p, eps=1e-5):
    """deep-complex-networks whitening BN, inference (running stats)."""
    mean_r = p["running_mean"][:, 0][None, :, None, None]
    mean_i = p["running_mean"][:, 1][None, :, None, None]
    vrr = p["running_covar"][:, 0] + eps
    vii = p["running_covar"][:, 1] + eps
    vri = p["running_covar"][:, 2]
    # inverse matrix square root of [[vrr, vri], [vri, vii]]
    s = jnp.sqrt(vrr * vii - vri * vri)
    t = jnp.sqrt(vrr + vii + 2 * s)
    inv_st = 1.0 / (s * t)
    rrr = ((vii + s) * inv_st)[None, :, None, None]
    rii = ((vrr + s) * inv_st)[None, :, None, None]
    rri = (-vri * inv_st)[None, :, None, None]
    xr_h = xr - mean_r
    xi_h = xi - mean_i
    wr = rrr * xr_h + rri * xi_h
    wi = rri * xr_h + rii * xi_h
    w_rr = p["weight"][:, 0][None, :, None, None]
    w_ri = p["weight"][:, 1][None, :, None, None]
    w_ii = p["weight"][:, 2][None, :, None, None]
    b_r = p["bias"][:, 0][None, :, None, None]
    b_i = p["bias"][:, 1][None, :, None, None]
    return (w_rr * wr + w_ri * wi + b_r,
            w_ri * wr + w_ii * wi + b_i)


def _uni_fsmn(x, p, lorder):
    """UniDeepFsmn along the frequency axis.

    x: (B, C, F, T).  linear C→H, ReLU, project H→C (no bias), plus a
    depthwise memory conv over F with ±(lorder-1) context; residual.
    """
    h = jnp.einsum("bcft,hc->bhft", x, p["linear_w"]) \
        + p["linear_b"][None, :, None, None]
    h = jax.nn.relu(h)
    pr = jnp.einsum("bhft,ch->bcft", h, p["project_w"])
    # depthwise conv over F: kernel (C, 1, 2*lorder-1, 1)
    mem = jax.lax.conv_general_dilated(
        pr, p["conv1_w"], window_strides=(1, 1),
        padding=[(lorder - 1, lorder - 1), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=pr.shape[1])
    return x + pr + mem


def _complex_fsmn(xr, xi, p, lorder):
    rr = _uni_fsmn(xr, p["re"], lorder)
    ri = _uni_fsmn(xi, p["re"], lorder)
    ir = _uni_fsmn(xr, p["im"], lorder)
    ii = _uni_fsmn(xi, p["im"], lorder)
    return rr - ii, ri + ir


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_complex_conv(key, geom: StageGeom, transpose, dtype):
    k1, k2 = jax.random.split(key)
    kh, kw = geom.kernel
    shape = ((geom.c_in, geom.c_out, kh, kw) if transpose
             else (geom.c_out, geom.c_in, kh, kw))
    fan_in = geom.c_in * kh * kw
    lim = 1.0 / np.sqrt(fan_in)

    def w(k):
        return jax.random.uniform(k, shape, dtype, -lim, lim)

    def b(k):
        return jax.random.uniform(k, (geom.c_out,), dtype, -lim, lim)

    ka, kb, kc, kd = jax.random.split(k1, 4)
    return {"re_w": w(ka), "re_b": b(kb), "im_w": w(kc), "im_b": b(kd)}


def _init_bn(c, dtype):
    weight = np.zeros((c, 3), np.float32)
    weight[:, 0] = weight[:, 2] = 1.0 / np.sqrt(2.0)
    covar = np.zeros((c, 3), np.float32)
    covar[:, 0] = covar[:, 1] = 1.0 / np.sqrt(2.0)
    return {"weight": jnp.asarray(weight, dtype),
            "bias": jnp.zeros((c, 2), dtype),
            "running_mean": jnp.zeros((c, 2), dtype),
            "running_covar": jnp.asarray(covar, dtype)}


def _init_fsmn_part(key, c, lorder, dtype):
    k1, k2, k3 = jax.random.split(key, 3)
    lim = 1.0 / np.sqrt(c)
    return {
        "linear_w": jax.random.uniform(k1, (c, c), dtype, -lim, lim),
        "linear_b": jnp.zeros((c,), dtype),
        "project_w": jax.random.uniform(k2, (c, c), dtype, -lim, lim),
        "conv1_w": jax.random.uniform(
            k3, (c, 1, 2 * lorder - 1, 1), dtype, -lim, lim),
    }


def _init_unet(key, cfg: FRCRNConfig, dtype):
    keys = iter(jax.random.split(key, 4 * (len(cfg.encoders)
                                           + len(cfg.decoders)) + 4))
    encoders = []
    for geom in cfg.encoders:
        stage = {"conv": _init_complex_conv(next(keys), geom, False, dtype),
                 "bn": _init_bn(geom.c_out, dtype)}
        if geom.fsmn:
            stage["fsmn"] = {
                "re": _init_fsmn_part(next(keys), geom.c_out,
                                      cfg.lorder, dtype),
                "im": _init_fsmn_part(next(keys), geom.c_out,
                                      cfg.lorder, dtype)}
        encoders.append(stage)
    decoders = []
    for i, geom in enumerate(cfg.decoders):
        last = i == len(cfg.decoders) - 1
        stage = {"conv": _init_complex_conv(next(keys), geom, True, dtype)}
        if not last:
            stage["bn"] = _init_bn(geom.c_out, dtype)
        if geom.fsmn:
            stage["fsmn"] = {
                "re": _init_fsmn_part(next(keys), geom.c_out,
                                      cfg.lorder, dtype),
                "im": _init_fsmn_part(next(keys), geom.c_out,
                                      cfg.lorder, dtype)}
        decoders.append(stage)
    return {"encoders": encoders, "decoders": decoders}


def init_params(cfg: FRCRNConfig, key: jax.Array,
                dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"unet": _init_unet(k1, cfg, dtype),
            "unet2": _init_unet(k2, cfg, dtype)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

_LEAK = 0.1


def _run_unet(unet, cfg: FRCRNConfig, xr, xi):
    skips = []
    for geom, stage in zip(cfg.encoders, unet["encoders"]):
        xr, xi = _complex_op(_conv2d, xr, xi, stage["conv"],
                             geom.stride, geom.padding)
        xr, xi = _complex_bn(xr, xi, stage["bn"])
        xr = jax.nn.leaky_relu(xr, _LEAK)
        xi = jax.nn.leaky_relu(xi, _LEAK)
        if "fsmn" in stage:
            xr, xi = _complex_fsmn(xr, xi, stage["fsmn"], cfg.lorder)
        skips.append((xr, xi))
    n = len(cfg.decoders)
    for i, (geom, stage) in enumerate(zip(cfg.decoders, unet["decoders"])):
        if i > 0:                           # concat mirror-encoder output
            sr, si = skips[n - 1 - i]
            xr = jnp.concatenate([xr, sr], axis=1)
            xi = jnp.concatenate([xi, si], axis=1)
        xr, xi = _complex_op(_conv_t2d, xr, xi, stage["conv"],
                             geom.stride, geom.padding)
        # transposed conv can overshoot the mirror size by one row/col
        f_tgt, t_tgt = (skips[n - 2 - i][0].shape[2:] if i < n - 1
                        else (cfg.n_freqs, None))
        xr = xr[:, :, :f_tgt, :]
        xi = xi[:, :, :f_tgt, :]
        if t_tgt is not None:
            xr = xr[:, :, :, :t_tgt]
            xi = xi[:, :, :, :t_tgt]
        if i < n - 1:
            xr, xi = _complex_bn(xr, xi, stage["bn"])
            xr = jax.nn.leaky_relu(xr, _LEAK)
            xi = jax.nn.leaky_relu(xi, _LEAK)
            if "fsmn" in stage:
                xr, xi = _complex_fsmn(xr, xi, stage["fsmn"], cfg.lorder)
    return xr, xi


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward_spec(params: Dict[str, Any], cfg: FRCRNConfig,
                 spec_r: jax.Array, spec_i: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """Noisy spectrogram (B, F, T) re/im → cIRM (B, F, T) re/im.

    ``mask = tanh(unet(x)) + tanh(unet2(unet(x)))`` — the cascade's
    second stage refines the first's raw (pre-tanh) output.
    """
    xr = spec_r[:, None]                    # (B, 1, F, T)
    xi = spec_i[:, None]
    u1r, u1i = _run_unet(params["unet"], cfg, xr, xi)
    m1r, m1i = jnp.tanh(u1r), jnp.tanh(u1i)
    u2r, u2i = _run_unet(params["unet2"], cfg, u1r, u1i)
    m2r, m2i = jnp.tanh(u2r), jnp.tanh(u2i)
    return (m1r + m2r)[:, 0], (m1i + m2i)[:, 0]


def denoise(params: Dict[str, Any], audio: jax.Array,
            cfg: FRCRNConfig = FRCRN_SE_16K) -> jax.Array:
    """audio (B, T) @16 kHz → enhanced audio, same shape.

    STFT → cascaded complex U-Nets → complex ratio mask → masked
    spectrogram → ISTFT (win = fft 640, hop 320, centered hann).
    """
    length = audio.shape[-1]
    sr, si = stft(audio, cfg.n_fft, cfg.hop)
    mr, mi = forward_spec(params, cfg, sr, si)
    er = sr * mr - si * mi
    ei = sr * mi + si * mr
    return istft(er, ei, length, cfg.n_fft, cfg.hop)


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# converter: vendor torch state dict → params
# ---------------------------------------------------------------------------

def _np_(t) -> np.ndarray:
    return np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy()
                      if hasattr(t, "detach") else t, np.float32)


#: wrapper prefixes seen on published checkpoints (TorchModel decorator)
VENDOR_PREFIXES = ("model.", "module.", "frcrn.")


def _strip_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    keys = list(sd)
    for pre in VENDOR_PREFIXES:
        if any(k.startswith(pre + "unet") for k in keys):
            return {k[len(pre):] if k.startswith(pre) else k: v
                    for k, v in sd.items()}
    return dict(sd)


def params_from_torch_state_dict(
        sd: Mapping[str, Any], cfg: Optional[FRCRNConfig] = None,
        dtype=jnp.float32) -> Tuple[Dict[str, Any], FRCRNConfig]:
    """Bind a vendor FRCRN state dict; returns (params, inferred cfg).

    Canonical module names (the torch twin in
    tests/test_frcrn_parity.py emits exactly these; wrapper prefixes
    from VENDOR_PREFIXES are stripped first):

      unet.encoders.{i}.conv.conv_re.weight/.bias, .conv.conv_im.*
      unet.encoders.{i}.bn.{weight,bias,running_mean,running_covar}
      unet.encoders.{i}.fsmn.fsmn_{re,im}_L1.{linear.weight,
          linear.bias,project.weight,conv1.weight}
      unet.decoders.{i}.conv.conv_re.* (ConvTranspose2d layout), .bn.*,
          .fsmn.*
      unet2.<same>

    Stage count, channels, kernel sizes, FSMN presence and memory order
    are inferred from the tensors, so checkpoint hyperparameters are
    authoritative.  Strides/paddings keep the published (2,1)/(2,1)
    defaults unless a cfg is supplied.
    """
    sd = _strip_prefix(sd)

    def g(name):
        if name not in sd:
            raise KeyError(f"missing tensor {name!r}")
        return _np_(sd[name])

    def stage_indices(unet, kind):
        idx = set()
        pre = f"{unet}.{kind}."
        for k in sd:
            if k.startswith(pre):
                idx.add(int(k[len(pre):].split(".")[0]))
        return sorted(idx)

    lorder = None

    def read_fsmn(prefix):
        nonlocal lorder
        parts = {}
        for part in ("re", "im"):
            p = f"{prefix}.fsmn_{part}_L1"
            conv1 = g(f"{p}.conv1.weight")
            lorder = (conv1.shape[2] + 1) // 2
            parts[part] = {
                "linear_w": jnp.asarray(g(f"{p}.linear.weight"), dtype),
                "linear_b": jnp.asarray(g(f"{p}.linear.bias"), dtype),
                "project_w": jnp.asarray(g(f"{p}.project.weight"), dtype),
                "conv1_w": jnp.asarray(conv1, dtype),
            }
        return parts

    def read_stage(prefix, transpose):
        re_w = g(f"{prefix}.conv.conv_re.weight")
        stage = {"conv": {
            "re_w": jnp.asarray(re_w, dtype),
            "re_b": jnp.asarray(g(f"{prefix}.conv.conv_re.bias"), dtype),
            "im_w": jnp.asarray(g(f"{prefix}.conv.conv_im.weight"), dtype),
            "im_b": jnp.asarray(g(f"{prefix}.conv.conv_im.bias"), dtype),
        }}
        if f"{prefix}.bn.weight" in sd:
            stage["bn"] = {k: jnp.asarray(g(f"{prefix}.bn.{k}"), dtype)
                           for k in ("weight", "bias", "running_mean",
                                     "running_covar")}
        if f"{prefix}.fsmn.fsmn_re_L1.linear.weight" in sd:
            stage["fsmn"] = read_fsmn(f"{prefix}.fsmn")
        c_in, c_out = ((re_w.shape[0], re_w.shape[1]) if transpose
                       else (re_w.shape[1], re_w.shape[0]))
        geom = StageGeom(c_in, c_out, kernel=(re_w.shape[2],
                                              re_w.shape[3]),
                         fsmn="fsmn" in stage)
        return stage, geom

    params: Dict[str, Any] = {}
    enc_geoms = dec_geoms = None
    for unet in ("unet", "unet2"):
        encoders, egs = [], []
        for i in stage_indices(unet, "encoders"):
            stage, geom = read_stage(f"{unet}.encoders.{i}", False)
            encoders.append(stage)
            egs.append(geom)
        decoders, dgs = [], []
        for i in stage_indices(unet, "decoders"):
            stage, geom = read_stage(f"{unet}.decoders.{i}", True)
            decoders.append(stage)
            dgs.append(geom)
        if not encoders:
            raise ValueError(
                f"no '{unet}.encoders.*' tensors found; keys like: "
                f"{sorted(sd)[:4]}")
        params[unet] = {"encoders": encoders, "decoders": decoders}
        enc_geoms, dec_geoms = egs, dgs

    if cfg is None:
        cfg = FRCRNConfig(encoders=tuple(enc_geoms),
                          decoders=tuple(dec_geoms),
                          lorder=lorder or 20)
    return params, cfg


def params_from_onnx(src, cfg: Optional[FRCRNConfig] = None,
                     dtype=jnp.float32):
    """ONNX export (torch names preserved as initializers) → params."""
    from whisperjav_tpu.utils.onnx_io import read_initializers

    return params_from_torch_state_dict(read_initializers(src), cfg,
                                        dtype)


# ---------------------------------------------------------------------------
# checkpoint IO
# ---------------------------------------------------------------------------

def save_params(path: str, params: Dict[str, Any],
                cfg: FRCRNConfig) -> None:
    import dataclasses

    from whisperjav_tpu.utils.pytree_npz import save_pytree

    save_pytree(path, jax.tree.map(np.asarray, params),
                meta=dataclasses.asdict(cfg))


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], FRCRNConfig]:
    """``.npz`` (our format) / ``.onnx`` / torch ``.pt|.pth|.ckpt|.bin``."""
    p = str(path)
    if p.endswith(".npz"):
        from whisperjav_tpu.utils.pytree_npz import load_pytree

        tree, meta = load_pytree(p)
        if meta is None:
            raise ValueError(f"{p}: missing config metadata")
        meta["encoders"] = tuple(
            StageGeom(**{**g, "kernel": tuple(g["kernel"]),
                         "stride": tuple(g["stride"]),
                         "padding": tuple(g["padding"])})
            for g in meta["encoders"])
        meta["decoders"] = tuple(
            StageGeom(**{**g, "kernel": tuple(g["kernel"]),
                         "stride": tuple(g["stride"]),
                         "padding": tuple(g["padding"])})
            for g in meta["decoders"])
        return jax.tree.map(jnp.asarray, tree), FRCRNConfig(**meta)
    if p.endswith(".onnx"):
        return params_from_onnx(p)
    import torch

    obj = torch.load(p, map_location="cpu", weights_only=True)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    return params_from_torch_state_dict(sd)
