"""TEN-class lightweight frame VAD in pure JAX.

TPU-native counterpart of the reference's TEN VAD backend — a distinct
small frame-DNN family, NOT the Silero conv/LSTM graph (reference:
whisperjav/modules/speech_segmentation/backends/ten.py:76-97 binds the
ten-vad C library: int16 @16 kHz, hop 256 = 16 ms frames, ~300 KB
model). Architecture in the same class, built fresh:

    per-hop features: 40-band Slaney log-mel over a 512-sample centered
    window + a pitch-salience feature (normalized autocorrelation peak
    over speech F0 lags) → ±1 frame context stacking (123-d) →
    2×[Conv1d k3 + ReLU] → LSTM(64) over frames → sigmoid per 16 ms hop.

The STFT/mel/autocorr feature stage is one batched conv program (MXU
work); only the 64-wide LSTM scans across frames. Weights train with the
framework's optimizers and round-trip via npz; a torch twin validates
the compute semantics in tests/test_ten_vad.py.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.ops.mel import mel_filterbank

HOP = 256                    # samples per frame @16 kHz → 16 ms
WIN = 512                    # analysis window (2 hops, centered)
N_MELS = 40
FRAME_S = HOP / 16000.0
_CONTEXT = 1                 # ±1 frame stacking
_FEAT = N_MELS + 1           # mel + pitch salience
_IN = _FEAT * (2 * _CONTEXT + 1)
HIDDEN = 64
_LAG_MIN, _LAG_MAX = 32, 256  # 62–500 Hz F0 search band


def init_params(key: jax.Array, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 6)

    def w(k, shape, scale=None):
        scale = scale or (shape[1] * (shape[2] if len(shape) > 2 else 1)
                          ) ** -0.5
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    return {
        "conv1_w": w(ks[0], (HIDDEN, _IN, 3)),
        "conv1_b": jnp.zeros((HIDDEN,), dtype),
        "conv2_w": w(ks[1], (HIDDEN, HIDDEN, 3)),
        "conv2_b": jnp.zeros((HIDDEN,), dtype),
        # torch LSTMCell layout: (4h, in)/(4h, h), gates i,f,g,o
        "lstm_wi": w(ks[2], (4 * HIDDEN, HIDDEN), HIDDEN ** -0.5),
        "lstm_wh": w(ks[3], (4 * HIDDEN, HIDDEN), HIDDEN ** -0.5),
        "lstm_bi": jnp.zeros((4 * HIDDEN,), dtype),
        "lstm_bh": jnp.zeros((4 * HIDDEN,), dtype),
        "out_w": w(ks[4], (1, HIDDEN), HIDDEN ** -0.5),
        "out_b": jnp.zeros((1,), dtype),
    }


def frame_features(audio: jax.Array) -> jax.Array:
    """audio (B, T) with T % HOP == 0 → features (B, F, 41).

    Windows are centered on each hop (zero-padded edges); the mel and
    autocorrelation run as one batched matmul/conv program.
    """
    b, t = audio.shape
    f = t // HOP
    pad = (WIN - HOP) // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)))
    idx = (np.arange(f)[:, None] * HOP + np.arange(WIN)[None, :])
    frames = x[:, idx]                                  # (B, F, WIN)
    window = jnp.asarray(np.hanning(WIN + 1)[:WIN], audio.dtype)
    fw = frames * window

    # magnitude spectrum via rFFT matmul kernel (static small WIN)
    k = np.arange(WIN // 2 + 1)[:, None] * np.arange(WIN)[None, :]
    ang = -2.0 * np.pi * k / WIN
    basis = jnp.asarray(np.concatenate([np.cos(ang), np.sin(ang)], axis=0),
                        jnp.float32)                    # (2F', WIN)
    spec = jnp.einsum("bfw,cw->bfc", fw.astype(jnp.float32), basis)
    n_bins = WIN // 2 + 1
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2

    mels = jnp.asarray(mel_filterbank(N_MELS, n_bins), jnp.float32)
    logmel = jnp.log10(jnp.einsum("bfc,mc->bfm", power, mels) + 1e-10)

    # pitch salience: max normalized autocorrelation in the F0 lag band
    def autocorr_at(lag):
        a = fw[:, :, :WIN - _LAG_MAX]
        bb = jax.lax.dynamic_slice_in_dim(fw, lag, WIN - _LAG_MAX, axis=2)
        num = jnp.sum(a * bb, axis=-1)
        den = jnp.sqrt(jnp.sum(a * a, axis=-1)
                       * jnp.sum(bb * bb, axis=-1)) + 1e-6
        return num / den

    lags = jnp.arange(_LAG_MIN, _LAG_MAX, 8)
    corrs = jax.vmap(autocorr_at)(lags)                 # (L, B, F)
    pitch = jnp.max(corrs, axis=0)[..., None]           # (B, F, 1)
    return jnp.concatenate([logmel.astype(audio.dtype),
                            pitch.astype(audio.dtype)], axis=-1)


def apply(params: Dict, audio: jax.Array) -> jax.Array:
    """audio (B, T @16 kHz, T % 256 == 0) → speech probs (B, T/256)."""
    feats = frame_features(audio)                       # (B, F, 41)
    b, f, _ = feats.shape
    # ±context stacking
    padded = jnp.pad(feats, ((0, 0), (_CONTEXT, _CONTEXT), (0, 0)))
    stacked = jnp.concatenate(
        [padded[:, i:i + f] for i in range(2 * _CONTEXT + 1)], axis=-1)

    x = jnp.swapaxes(stacked, 1, 2)                     # (B, C, F)

    def conv(x, w, bias):
        out = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1,), padding=((1, 1),),
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32)
        return (out + bias.astype(jnp.float32)[None, :, None]
                ).astype(x.dtype)

    x = jax.nn.relu(conv(x, params["conv1_w"], params["conv1_b"]))
    x = jax.nn.relu(conv(x, params["conv2_w"], params["conv2_b"]))
    x = jnp.swapaxes(x, 1, 2)                           # (B, F, H)

    wi = params["lstm_wi"].astype(jnp.float32)
    wh = params["lstm_wh"].astype(jnp.float32)
    bias = (params["lstm_bi"] + params["lstm_bh"]).astype(jnp.float32)

    def step(carry, xt):
        h, c = carry
        gates = xt.astype(jnp.float32) @ wi.T + h @ wh.T + bias
        i, fg, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(fg) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((b, HIDDEN), jnp.float32)
    _, hs = jax.lax.scan(step, (h0, h0), jnp.swapaxes(x, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)
    logits = jnp.einsum("bfh,oh->bfo", hs,
                        params["out_w"].astype(jnp.float32))
    return jax.nn.sigmoid(logits[..., 0]
                          + params["out_b"].astype(jnp.float32))


def load_params(path: str) -> Dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


# ---------------------------------------------------------------------------
# vendor ONNX binding (reference backend consumes the ten-vad model file
# through onnxruntime; we bind its tensors directly into the pytree)
# ---------------------------------------------------------------------------

def params_from_onnx(src, dtype=jnp.float32) -> Dict:
    """Bind an ONNX VAD model file's weights into our param pytree.

    Two vendor layouts are handled (tests/test_onnx_io.py exercises
    both against files synthesized in the exact vendor wire format):

    * **torch-export naming** — ``torch.onnx.export`` keeps state-dict
      names as initializer names: ``conv1.weight``, ``conv2.weight``,
      ``lstm.weight_ih_l0`` / ``weight_hh_l0`` / ``bias_*_l0`` (ifgo
      gate rows, exactly our layout) and ``out.weight`` / ``out.bias``.
    * **native ONNX ops** — a graph using the ONNX ``LSTM`` operator
      stores W (1, 4H, I), R (1, 4H, H), B (1, 8H) with the spec's
      ``iofc`` gate order; ``Conv`` and ``Gemm``/``MatMul`` nodes carry
      their weights as initializer inputs.  Binding is structural
      (topology + shape), so it is naming-independent.

    Raises ``ValueError`` when the graph's shapes don't match this
    architecture (hop-256 frame VAD with a single 64-wide LSTM).
    """
    from whisperjav_tpu.utils.onnx_io import (
        lstm_reorder_gates, read_onnx, topo_order,
    )

    model = read_onnx(src)
    init = model.graph.initializers

    def a(x):
        return jnp.asarray(np.asarray(x, np.float32), dtype)

    if "lstm.weight_ih_l0" in init:                     # torch export
        return {
            "conv1_w": a(init["conv1.weight"]),
            "conv1_b": a(init["conv1.bias"]),
            "conv2_w": a(init["conv2.weight"]),
            "conv2_b": a(init["conv2.bias"]),
            "lstm_wi": a(init["lstm.weight_ih_l0"]),
            "lstm_wh": a(init["lstm.weight_hh_l0"]),
            "lstm_bi": a(init["lstm.bias_ih_l0"]),
            "lstm_bh": a(init["lstm.bias_hh_l0"]),
            "out_w": a(init["out.weight"]),
            "out_b": a(init["out.bias"]),
        }

    # structural: find the LSTM op, the Convs before it, the Gemm after
    nodes = topo_order(model.graph)
    lstms = [n for n in nodes if n.op_type == "LSTM"]
    if not lstms:
        raise ValueError(
            "ONNX graph has neither torch-export names nor an LSTM op; "
            f"initializers: {sorted(init)[:8]}")
    lstm = lstms[0]
    w = np.asarray(init[lstm.inputs[1]], np.float32)    # (1, 4H, I)
    r = np.asarray(init[lstm.inputs[2]], np.float32)    # (1, 4H, H)
    hidden = r.shape[-1]
    if w.ndim == 3:
        w, r = w[0], r[0]
    bi = bh = np.zeros((4 * hidden,), np.float32)
    if len(lstm.inputs) > 3 and lstm.inputs[3] in init:
        b = np.asarray(init[lstm.inputs[3]], np.float32).reshape(-1)
        bi, bh = b[:4 * hidden], b[4 * hidden:8 * hidden]

    convs = []
    for n in nodes:
        if n.op_type == "LSTM":
            break
        if n.op_type == "Conv":
            cw = np.asarray(init[n.inputs[1]], np.float32)
            cb = (np.asarray(init[n.inputs[2]], np.float32)
                  if len(n.inputs) > 2 and n.inputs[2] in init
                  else np.zeros((cw.shape[0],), np.float32))
            convs.append((cw, cb))
    if len(convs) != 2:
        raise ValueError(
            f"expected 2 Conv nodes before the LSTM, found {len(convs)}")

    ow, ob = None, np.zeros((1,), np.float32)
    for n in nodes[nodes.index(lstm) + 1:]:
        if n.op_type in ("Gemm", "MatMul"):
            ow = np.asarray(init[n.inputs[1]], np.float32)
            if n.op_type == "Gemm":
                if not n.attrs.get("transB", 0):
                    ow = ow.T                           # -> (out, in)
                if len(n.inputs) > 2 and n.inputs[2] in init:
                    ob = np.asarray(init[n.inputs[2]],
                                    np.float32).reshape(-1)
            elif ow.shape[0] == hidden:                 # (in, out)
                ow = ow.T
        elif n.op_type == "Add" and ow is not None:
            for src_name in n.inputs:
                if src_name in init:
                    ob = np.asarray(init[src_name],
                                    np.float32).reshape(-1)
    if ow is None:
        raise ValueError("no Gemm/MatMul output head after the LSTM")

    return {
        "conv1_w": a(convs[0][0]), "conv1_b": a(convs[0][1]),
        "conv2_w": a(convs[1][0]), "conv2_b": a(convs[1][1]),
        "lstm_wi": a(lstm_reorder_gates(w, hidden)),
        "lstm_wh": a(lstm_reorder_gates(r, hidden)),
        "lstm_bi": a(lstm_reorder_gates(bi, hidden)),
        "lstm_bh": a(lstm_reorder_gates(bh, hidden)),
        "out_w": a(ow), "out_b": a(ob),
    }


def save_params(path: str, params: Dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
