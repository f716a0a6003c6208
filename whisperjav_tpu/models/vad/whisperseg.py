"""WhisperSeg VAD: Whisper-base encoder + 2-layer decoder frame head in JAX.

TPU-native counterpart of the reference's default segmenter — the
TransWithAI/Whisper-Vad-EncDec-ASMR ONNX export (reference:
whisperjav/modules/speech_segmentation/backends/whisperseg.py:42-130;
F1=0.787 on the Netflix-GT clip). Architecture matches the published
checkpoint: a Whisper **encoder + 2-layer decoder** (ONNX input
(1, 80, 3000) log-mel → output (1, 1500) frame logits @20 ms), NOT an
MLP head — so the published weights can port via
:func:`params_from_hf_state_dict`.

The decoder runs teacher-forced over 1500 fixed query tokens (a constant
token id, positions 0..1499, standard causal self-attention — HF
WhisperDecoder semantics) with cross-attention to the encoder states; a
(d, 1) linear head on the decoder hidden states emits the per-frame
speech logits. Everything reuses the scan-stacked ASR decoder from
models/whisper/model.py, so the same pjit sharding rules apply.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.convert import (
    _np, _stack_blocks,
)
from whisperjav_tpu.models.whisper.model import (
    KVCache, decode_hidden, encode, init_params as _init_whisper,
    precompute_cross_kv,
)
from whisperjav_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram

FRAME_S = 0.02          # decoder query resolution: 1500 frames per 30 s
N_FRAMES = 1500
QUERY_TOKEN_ID = 0      # constant decoder input id (vendor export default)

# whisper-base dims with a 2-layer decoder and 1500 decoder positions —
# the shape of the published VAD checkpoint.
SEG_CONFIG = WhisperConfig(
    name="whisperseg-base", n_mels=80, n_audio_ctx=1500, n_audio_state=512,
    n_audio_head=8, n_audio_layer=6, n_vocab=51865, n_text_ctx=N_FRAMES,
    n_text_state=512, n_text_head=8, n_text_layer=2,
)


def init_params(key: jax.Array, dtype=jnp.float32,
                config: WhisperConfig = SEG_CONFIG) -> Dict:
    kw, kh = jax.random.split(key)
    whisper = _init_whisper(config, kw, dtype)
    d = config.n_text_state
    return {
        "encoder": whisper["encoder"],
        "decoder": whisper["decoder"],
        "head": {
            "w": (jax.random.normal(kh, (d, 1)) * d ** -0.5).astype(dtype),
            "b": jnp.zeros((1,), dtype),
        },
    }


def frame_logits(params: Dict, audio: jax.Array,
                 config: WhisperConfig = SEG_CONFIG,
                 query_token_id: int = QUERY_TOKEN_ID) -> jax.Array:
    """audio (B, N_SAMPLES) → frame speech logits (B, n_text_ctx) f32."""
    mel = log_mel_spectrogram(audio, n_mels=config.n_mels)
    xa = encode(params, config, mel)
    cross = precompute_cross_kv(params, config, xa)
    b = audio.shape[0]
    t = config.n_text_ctx
    dtype = params["decoder"]["tok_emb"].dtype
    tokens = jnp.full((b, t), query_token_id, jnp.int32)
    cache = KVCache.zeros(config, b, t, dtype)
    hidden, _ = decode_hidden(params, config, tokens, 0, cache, cross)
    logits = (hidden.astype(jnp.float32) @
              params["head"]["w"].astype(jnp.float32)
              + params["head"]["b"].astype(jnp.float32))
    return logits[..., 0]


def apply(params: Dict, audio: jax.Array,
          config: WhisperConfig = SEG_CONFIG) -> jax.Array:
    """audio (B, N_SAMPLES) → frame speech probs (B, 1500) @20 ms."""
    return jax.nn.sigmoid(frame_logits(params, audio, config))


# ---------------------------------------------------------------------------
# checkpoint conversion
# ---------------------------------------------------------------------------

_HEAD_KEY_CANDIDATES = (
    "head", "frame_head", "classifier", "vad_head", "proj_out", "fc",
)


def params_from_hf_state_dict(
    sd: Mapping[str, Any], config: WhisperConfig = SEG_CONFIG,
    dtype=np.float32,
) -> Dict[str, Any]:
    """Convert an HF-Whisper-style VAD state dict to our param tree.

    Accepts ``model.encoder.* / model.decoder.*`` (or unprefixed) HF
    Whisper naming for the trunk, plus a (1, d) linear frame head under
    any of the common names (``head.weight``, ``classifier.weight``, …) —
    or, failing those, the unique (1, d)/(d,)-shaped linear outside the
    trunk. Mirrors models/whisper/convert.py for the trunk layout
    (torch Linear (out, in) transposed to (in, out); per-layer leaves
    stacked on a leading axis).
    """
    full = dict(sd)
    if any(k.startswith("model.") for k in full):
        trunk = {k[len("model."):]: v for k, v in full.items()
                 if k.startswith("model.")}
        extra = {k: v for k, v in full.items() if not k.startswith("model.")}
    else:
        trunk = {k: v for k, v in full.items()
                 if k.startswith(("encoder.", "decoder."))}
        extra = {k: v for k, v in full.items()
                 if not k.startswith(("encoder.", "decoder."))}

    head_w = head_b = None
    for cand in _HEAD_KEY_CANDIDATES:
        if f"{cand}.weight" in extra:
            head_w = _np(extra[f"{cand}.weight"])
            head_b = _np(extra.get(f"{cand}.bias", np.zeros((1,))))
            break
    if head_w is None:
        d = config.n_text_state
        matches = [k for k, v in extra.items()
                   if k.endswith(".weight") and _np(v).shape == (1, d)]
        if len(matches) == 1:
            head_w = _np(extra[matches[0]])
            head_b = _np(extra.get(matches[0][:-len(".weight")] + ".bias",
                                   np.zeros((1,))))
    if head_w is None:
        raise KeyError(
            "no (1, d) frame-head linear found in state dict; expected one "
            f"of {_HEAD_KEY_CANDIDATES} or a unique (1, {config.n_text_state})"
            " weight outside model.*")

    return {
        "encoder": {
            "conv1_w": _np(trunk["encoder.conv1.weight"]).astype(dtype),
            "conv1_b": _np(trunk["encoder.conv1.bias"]).astype(dtype),
            "conv2_w": _np(trunk["encoder.conv2.weight"]).astype(dtype),
            "conv2_b": _np(trunk["encoder.conv2.bias"]).astype(dtype),
            "pos": _np(trunk["encoder.embed_positions.weight"]).astype(dtype),
            "blocks": _stack_blocks(trunk, "encoder", config.n_audio_layer,
                                    False, dtype),
            "ln_s": _np(trunk["encoder.layer_norm.weight"]).astype(dtype),
            "ln_b": _np(trunk["encoder.layer_norm.bias"]).astype(dtype),
        },
        "decoder": {
            "tok_emb": _np(trunk["decoder.embed_tokens.weight"]).astype(dtype),
            "pos_emb": _np(trunk["decoder.embed_positions.weight"]).astype(dtype),
            "blocks": _stack_blocks(trunk, "decoder", config.n_text_layer,
                                    True, dtype),
            "ln_s": _np(trunk["decoder.layer_norm.weight"]).astype(dtype),
            "ln_b": _np(trunk["decoder.layer_norm.bias"]).astype(dtype),
        },
        "head": {
            "w": head_w.T.astype(dtype),       # (1, d) → (d, 1)
            "b": head_b.astype(dtype),
        },
    }


# ---------------------------------------------------------------------------
# npz round-trip (local checkpoint format)
# ---------------------------------------------------------------------------

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
