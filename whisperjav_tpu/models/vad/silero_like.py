"""Silero-class frame VAD model in pure JAX.

TPU-native counterpart of the torch-JIT Silero models the reference loads
via torch.hub (reference: whisperjav/modules/speech_segmentation/backends/
silero.py:53-96). Fresh architecture in the same small-model class
(~200 k params): log-mel features → stride-2 conv stack → GRU over frames
(lax.scan) → per-frame speech probability at 40 ms resolution.

The model is trainable with the framework's train step; inference runs
batched under jit. Weights load from an .npz checkpoint; without weights
the segmentation backend falls back to a calibrated energy→probability
mapping so the identical hysteresis post-chain stays exercised.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.ops.mel import log_mel_spectrogram

FRAME_S = 0.04          # output frame resolution (2× mel hop of 10 ms ×2)
N_MELS = 40


def init_params(key: jax.Array, hidden: int = 128,
                dtype=jnp.float32) -> Dict:
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    def w(k, shape, scale=None):
        scale = scale or (shape[-2] if len(shape) > 1 else shape[-1]) ** -0.5
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    return {
        # conv stack: (out, in, k); stride 2 each → 40 ms frames from 10 ms
        "conv1_w": w(k1, (64, N_MELS, 3), 0.1), "conv1_b": jnp.zeros((64,), dtype),
        "conv2_w": w(k2, (hidden, 64, 3), 0.1), "conv2_b": jnp.zeros((hidden,), dtype),
        # GRU
        "gru_wx": w(k3, (hidden, 3 * hidden)),
        "gru_wh": w(k4, (hidden, 3 * hidden)),
        "gru_b": jnp.zeros((3 * hidden,), dtype),
        # head
        "out_w": w(k5, (hidden, 1)), "out_b": jnp.zeros((1,), dtype),
    }


def _conv(x, w, b, stride):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    return (out + b[None, :, None]).astype(x.dtype)


def apply(params: Dict, audio: jax.Array) -> jax.Array:
    """audio (B, T samples @16 kHz, T multiple of 640) → probs (B, F).

    F = T / 640 (40 ms frames).
    """
    mel = log_mel_spectrogram(audio, n_mels=N_MELS)      # (B, 40, T/160)
    x = jax.nn.relu(_conv(mel, params["conv1_w"], params["conv1_b"], 2))
    x = jax.nn.relu(_conv(x, params["conv2_w"], params["conv2_b"], 2))
    x = jnp.swapaxes(x, 1, 2)                            # (B, F, H)

    h0 = jnp.zeros((x.shape[0], params["gru_wh"].shape[0]), x.dtype)

    def step(h, xt):
        gates = xt @ params["gru_wx"] + params["gru_b"]
        rec = h @ params["gru_wh"]
        r = jax.nn.sigmoid(gates[:, :h.shape[1]] + rec[:, :h.shape[1]])
        z = jax.nn.sigmoid(gates[:, h.shape[1]:2 * h.shape[1]]
                           + rec[:, h.shape[1]:2 * h.shape[1]])
        n = jnp.tanh(gates[:, 2 * h.shape[1]:]
                     + r * rec[:, 2 * h.shape[1]:])
        h = (1 - z) * n + z * h
        return h, h

    _, hs = jax.lax.scan(step, h0, jnp.swapaxes(x, 0, 1))
    hs = jnp.swapaxes(hs, 0, 1)                          # (B, F, H)
    logits = hs @ params["out_w"] + params["out_b"]
    return jax.nn.sigmoid(logits[..., 0])


def load_params(path: str) -> Dict:
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def save_params(path: str, params: Dict) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
