"""Silero VAD (v5/v6 pip-package generation) in pure JAX.

Checkpoint-faithful counterpart of the torch-JIT model the reference
loads (reference: whisperjav/modules/speech_segmentation/backends/
silero.py:199 via torch.hub, backends/silero_v6.py via the silero-vad
package). The published 16 kHz graph is:

    512-sample chunks (+64 context samples carried from the previous
    chunk) → STFT as a fixed conv basis (forward_basis_buffer,
    (258, 1, 256), stride 128) → magnitude (129 bins, 4 frames/chunk)
    → 4×[Conv1d k3 p1 + ReLU] encoder (129→128 s1, 128→64 s2,
    64→64 s2, 64→128 s1) → LSTMCell(128) carried across chunks →
    ReLU → Conv1d(128→1, k1) → sigmoid = one speech prob per 32 ms.

:func:`params_from_torch_state_dict` maps the JIT export's tensor names
(``_model.stft.forward_basis_buffer``,
``_model.encoder.{i}.reparam_conv.*``, ``_model.decoder.rnn.*``,
``_model.decoder.decoder.2.*``) onto this tree; torch-oracle parity
lives in tests/test_silero_parity.py. One recorded assumption pending a
real checkpoint: the per-chunk STFT input (576 samples) is
reflect-padded by 64 on the right before the basis conv (yielding the
known 4 frames/chunk).

TPU mapping: the STFT + conv encoder over ALL chunks runs as one big
batched conv program (MXU-friendly); only the 128-wide LSTM scans
sequentially, and that over chunks (31 steps/s of audio), not samples.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 512             # samples per probability frame @16 kHz
CONTEXT = 64            # samples carried from the previous chunk
FRAME_S = CHUNK / 16000.0   # 32 ms
_N_FFT = 256
_HOP = 128
_N_BINS = 129
HIDDEN = 128


def _stft_basis() -> np.ndarray:
    """Fourier forward basis as a (258, 1, 256) conv kernel (hann-windowed),
    matching the layout of the JIT export's forward_basis_buffer."""
    n = _N_FFT
    k = np.arange(n)
    freqs = np.arange(_N_BINS)
    ang = 2.0 * np.pi * freqs[:, None] * k[None, :] / n
    window = np.hanning(n + 1)[:n]
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=0) * window
    return basis[:, None, :].astype(np.float32)


def init_params(key: jax.Array, dtype=jnp.float32) -> Dict:
    ks = jax.random.split(key, 8)

    def w(k, shape, scale=0.1):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    return {
        "stft_basis": jnp.asarray(_stft_basis(), dtype),
        "enc0_w": w(ks[0], (128, _N_BINS, 3)), "enc0_b": jnp.zeros((128,), dtype),
        "enc1_w": w(ks[1], (64, 128, 3)), "enc1_b": jnp.zeros((64,), dtype),
        "enc2_w": w(ks[2], (64, 64, 3)), "enc2_b": jnp.zeros((64,), dtype),
        "enc3_w": w(ks[3], (128, 64, 3)), "enc3_b": jnp.zeros((128,), dtype),
        # torch LSTMCell layout kept: (4h, in) / (4h, h), gate order i,f,g,o
        "lstm_wi": w(ks[4], (4 * HIDDEN, HIDDEN)),
        "lstm_wh": w(ks[5], (4 * HIDDEN, HIDDEN)),
        "lstm_bi": jnp.zeros((4 * HIDDEN,), dtype),
        "lstm_bh": jnp.zeros((4 * HIDDEN,), dtype),
        "head_w": w(ks[6], (1, HIDDEN, 1)), "head_b": jnp.zeros((1,), dtype),
    }


def _conv(x, w, b, stride, pad=1):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,),
        padding=((pad, pad),), dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return (out + b.astype(jnp.float32)[None, :, None]).astype(x.dtype)


def _frames_from_audio(audio: jax.Array) -> jax.Array:
    """audio (B, T) with T a multiple of CHUNK → (B, F, CHUNK+CONTEXT)."""
    b, t = audio.shape
    f = t // CHUNK
    main = audio.reshape(b, f, CHUNK)
    ctx = jnp.concatenate(
        [jnp.zeros((b, 1, CONTEXT), audio.dtype), main[:, :-1, -CONTEXT:]],
        axis=1)
    return jnp.concatenate([ctx, main], axis=-1)


def chunk_features(params: Dict, audio: jax.Array) -> jax.Array:
    """audio (B, T) → per-chunk encoder features (B, F, HIDDEN).

    The heavy, fully-parallel part: STFT + conv encoder batched over all
    chunks at once.
    """
    b = audio.shape[0]
    frames = _frames_from_audio(audio)              # (B, F, 576)
    f = frames.shape[1]
    x = frames.reshape(b * f, 1, CHUNK + CONTEXT)
    # reflect-pad right by CONTEXT, then the fixed Fourier basis conv
    x = jnp.pad(x, ((0, 0), (0, 0), (0, CONTEXT)), mode="reflect")
    spec = jax.lax.conv_general_dilated(
        x, params["stft_basis"].astype(x.dtype), window_strides=(_HOP,),
        padding=((0, 0),), dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)          # (BF, 258, 4)
    mag = jnp.sqrt(spec[:, :_N_BINS] ** 2 + spec[:, _N_BINS:] ** 2 + 1e-12)
    h = jax.nn.relu(_conv(mag.astype(audio.dtype),
                          params["enc0_w"], params["enc0_b"], 1))
    h = jax.nn.relu(_conv(h, params["enc1_w"], params["enc1_b"], 2))
    h = jax.nn.relu(_conv(h, params["enc2_w"], params["enc2_b"], 2))
    h = jax.nn.relu(_conv(h, params["enc3_w"], params["enc3_b"], 1))
    return h[:, :, 0].reshape(b, f, HIDDEN)


def apply(params: Dict, audio: jax.Array) -> jax.Array:
    """audio (B, T samples @16 kHz, T multiple of 512) → probs (B, T/512).

    One probability per 32 ms chunk (v5/v6 semantics; state reset at clip
    start).
    """
    feats = chunk_features(params, audio)           # (B, F, H)
    b = feats.shape[0]
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
    _, hs = jax.lax.scan(step, (h0, h0), jnp.swapaxes(feats, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)                     # (B, F, H)
    act = jax.nn.relu(hs)
    logits = jnp.einsum("bfh,oh->bfo", act,
                        params["head_w"][:, :, 0].astype(jnp.float32))
    logits = logits + params["head_b"].astype(jnp.float32)
    return jax.nn.sigmoid(logits[..., 0])


# ---------------------------------------------------------------------------
# checkpoint conversion
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def params_from_torch_state_dict(sd: Mapping[str, Any],
                                 dtype=np.float32) -> Dict:
    """Map a silero-vad JIT export's state dict onto our param tree.

    Accepts the ``_model.``-prefixed names of the published 16 kHz JIT
    model (v5/v6) and the same names unprefixed.
    """
    def get(*names):
        for name in names:
            for prefix in ("_model.", ""):
                key = prefix + name
                if key in sd:
                    return _np(sd[key]).astype(dtype)
        raise KeyError(f"none of {names} (with/without '_model.') in "
                       "state dict")

    out = {"stft_basis": get("stft.forward_basis_buffer")}
    if out["stft_basis"].ndim == 2:
        out["stft_basis"] = out["stft_basis"][:, None, :]
    for i in range(4):
        out[f"enc{i}_w"] = get(f"encoder.{i}.reparam_conv.weight",
                               f"encoder.{i}.weight")
        out[f"enc{i}_b"] = get(f"encoder.{i}.reparam_conv.bias",
                               f"encoder.{i}.bias")
    out["lstm_wi"] = get("decoder.rnn.weight_ih")
    out["lstm_wh"] = get("decoder.rnn.weight_hh")
    out["lstm_bi"] = get("decoder.rnn.bias_ih")
    out["lstm_bh"] = get("decoder.rnn.bias_hh")
    head_w = get("decoder.decoder.2.weight", "decoder.decoder.1.weight")
    out["head_w"] = head_w if head_w.ndim == 3 else head_w[:, :, None]
    out["head_b"] = get("decoder.decoder.2.bias", "decoder.decoder.1.bias")
    return out


def load_params(path: str) -> Dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def save_params(path: str, params: Dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
