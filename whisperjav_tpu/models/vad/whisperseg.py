"""WhisperSeg-class VAD: Whisper-base encoder + frame head in JAX.

TPU-native counterpart of the reference's default segmenter — a
Whisper-base encoder + 2-layer decoder VAD exported to ONNX (reference:
whisperjav/modules/speech_segmentation/backends/whisperseg.py:42-130,
F1=0.787 on the Netflix-GT clip). Here the Whisper-base encoder is
REUSED from the ASR stack (same scan-stacked implementation, same
weights layout) with a small MLP frame head emitting speech logits at
20 ms resolution (1500 frames per 30 s window); the decoder-as-head of
the ONNX export is replaced by a feedforward head, which is both cheaper
and friendlier to fixed-shape batching.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.models.whisper.config import WHISPER_SIZES, WhisperConfig
from whisperjav_tpu.models.whisper.model import encode, init_params as _init_whisper
from whisperjav_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram

FRAME_S = 0.02   # encoder frame resolution
BASE = WHISPER_SIZES["base"]


def init_params(key: jax.Array, dtype=jnp.float32) -> Dict:
    kw, kh1, kh2 = jax.random.split(key, 3)
    whisper = _init_whisper(BASE, kw, dtype)
    d = BASE.n_audio_state
    return {
        "encoder": whisper["encoder"],
        "head": {
            "w1": (jax.random.normal(kh1, (d, 256)) * d ** -0.5).astype(dtype),
            "b1": jnp.zeros((256,), dtype),
            "w2": (jax.random.normal(kh2, (256, 1)) * 256 ** -0.5).astype(dtype),
            "b2": jnp.zeros((1,), dtype),
        },
    }


def apply(params: Dict, audio: jax.Array) -> jax.Array:
    """audio (B, N_SAMPLES) → frame speech probs (B, 1500) @20 ms."""
    mel = log_mel_spectrogram(audio, n_mels=BASE.n_mels)
    xa = encode({"encoder": params["encoder"]}, BASE, mel)   # (B, 1500, d)
    h = jax.nn.gelu(xa @ params["head"]["w1"] + params["head"]["b1"],
                    approximate=False)
    logits = h @ params["head"]["w2"] + params["head"]["b2"]
    return jax.nn.sigmoid(logits[..., 0].astype(jnp.float32))


def load_params(path: str) -> Dict:
    """Load from .npz with flat 'a/b/c' keys."""
    data = np.load(path)
    tree: Dict = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return tree


def save_params(path: str, params: Dict) -> None:
    flat: Dict[str, np.ndarray] = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", params)
    np.savez(path, **flat)
