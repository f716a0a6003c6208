"""JA voice-type classifier: train/infer a small JAX MLP on audio clips.

Role parity with the reference's standalone classifier utility
(reference: utils/japanese_ero_voice_classifier_AkitoP_v1.py — a torch
MLP over pyannote speaker embeddings, used to label JAV voice types like
moan/dialogue/narration). TPU-native reframing: features come from this
framework's own MFCC texture statistics (the same front-end the semantic
scene detector uses — no pyannote/torch dependency, no network), and the
classifier is a jitted JAX MLP trained with optax.

CLI:
    python -m whisperjav_tpu.tools.voice_classifier train \
        --data /clips --labels labels.json --out clf.npz
    python -m whisperjav_tpu.tools.voice_classifier infer \
        --model clf.npz clip.wav

labels.json: {"clip1.wav": "moan", "clip2.wav": "dialogue", ...}
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from whisperjav_tpu.utils.logger import logger


def clip_features(audio: np.ndarray, sample_rate: int) -> np.ndarray:
    """One fixed-length feature vector per clip: mean + std of MFCC
    texture windows (the semantic detector's representation pooled over
    the clip)."""
    from whisperjav_tpu.modules.scene_detection.semantic import (
        compute_mfcc, texture_features,
    )
    mfcc = compute_mfcc(audio, sample_rate)
    feats = texture_features(mfcc, frames_per_window=50)
    if feats.shape[0] == 0:
        feats = np.zeros((1, feats.shape[1]), np.float32)
    return np.concatenate([feats.mean(axis=0), feats.std(axis=0)]) \
        .astype(np.float32)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def init_mlp(rng, dims: List[int]) -> List[Tuple[np.ndarray, np.ndarray]]:
    import jax
    params = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        rng, sub = jax.random.split(rng)
        w = jax.random.normal(sub, (a, b)) * (2.0 / a) ** 0.5
        params.append((w, np.zeros((b,), np.float32)))
    return params


def mlp_logits(params, x):
    import jax.numpy as jnp
    h = x
    for w, b in params[:-1]:
        h = jnp.maximum(jnp.dot(h, w) + b, 0.0)
    w, b = params[-1]
    return jnp.dot(h, w) + b


def train(features: np.ndarray, labels: np.ndarray, n_classes: int,
          hidden: int = 128, steps: int = 300, lr: float = 1e-3,
          seed: int = 0):
    import jax
    import jax.numpy as jnp
    import optax

    params = init_mlp(jax.random.PRNGKey(seed),
                      [features.shape[1], hidden, n_classes])
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    x = jnp.asarray(features)
    y = jnp.asarray(labels)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            lp = jax.nn.log_softmax(mlp_logits(p, x))
            return -jnp.mean(jnp.take_along_axis(lp, y[:, None], 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
    return params, float(loss)


def predict(params, feats: np.ndarray) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    return np.asarray(jax.nn.softmax(
        mlp_logits(params, jnp.asarray(feats)), axis=-1))


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------

def save_model(path: Path, params, id2label: Dict[int, str]) -> Path:
    flat = {}
    for i, (w, b) in enumerate(params):
        flat[f"w{i}"] = np.asarray(w)
        flat[f"b{i}"] = np.asarray(b)
    flat["labels"] = np.asarray(
        json.dumps({str(k): v for k, v in id2label.items()}))
    np.savez(path, **flat)
    return Path(path)


def load_model(path: Path):
    data = np.load(path, allow_pickle=False)
    id2label = {int(k): v for k, v in
                json.loads(str(data["labels"])).items()}
    params = []
    i = 0
    while f"w{i}" in data:
        params.append((data[f"w{i}"], data[f"b{i}"]))
        i += 1
    return params, id2label


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="voice-classifier")
    sub = p.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("train")
    t.add_argument("--data", required=True, help="directory of WAV clips")
    t.add_argument("--labels", required=True,
                   help="JSON {filename: label}")
    t.add_argument("--out", default="voice_classifier.npz")
    t.add_argument("--steps", type=int, default=300)
    t.add_argument("--hidden", type=int, default=128)
    i = sub.add_parser("infer")
    i.add_argument("--model", required=True)
    i.add_argument("clips", nargs="+")
    args = p.parse_args(argv)

    from whisperjav_tpu.modules.audio_io import load_audio

    if args.cmd == "train":
        label_map = json.loads(Path(args.labels).read_text(encoding="utf-8"))
        names = sorted(set(label_map.values()))
        label2id = {n: i for i, n in enumerate(names)}
        feats, ys = [], []
        for fname, label in sorted(label_map.items()):
            path = Path(args.data) / fname
            if not path.exists():
                logger.warning("missing clip %s; skipped", path)
                continue
            audio = load_audio(path, 16000)
            feats.append(clip_features(audio, 16000))
            ys.append(label2id[label])
        if not feats:
            logger.error("no usable clips")
            return 1
        params, loss = train(np.stack(feats), np.asarray(ys, np.int32),
                             n_classes=len(names),
                             hidden=args.hidden, steps=args.steps)
        out = save_model(Path(args.out), params,
                         {v: k for k, v in label2id.items()})
        print(json.dumps({"model": str(out), "clips": len(feats),
                          "classes": names, "final_loss": round(loss, 4)}))
        return 0

    params, id2label = load_model(Path(args.model))
    results = {}
    for clip in args.clips:
        audio = load_audio(clip, 16000)
        probs = predict(params, clip_features(audio, 16000)[None])[0]
        order = np.argsort(probs)[::-1]
        results[clip] = [(id2label[int(k)], round(float(probs[k]), 4))
                         for k in order]
    print(json.dumps(results, ensure_ascii=False, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
