"""Voice-type classifier tool (role of the reference's AkitoP utility)."""

import json

import numpy as np

from whisperjav_tpu.modules.audio_io import write_wav
from whisperjav_tpu.tools import voice_classifier as vc


def _tone(freq, seconds=1.0, sr=16000, noise=0.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    x = 0.4 * np.sin(2 * np.pi * freq * t)
    if noise:
        x = x + noise * rng.standard_normal(t.shape)
    return x.astype(np.float32)


def test_train_and_infer_separable_classes(tmp_path):
    """Two acoustically distinct classes train to separable predictions
    through the real CLI."""
    labels = {}
    for i in range(4):
        name = f"low{i}.wav"
        write_wav(tmp_path / name, _tone(150 + 10 * i, noise=0.02, seed=i),
                  16000)
        labels[name] = "low"
    for i in range(4):
        name = f"high{i}.wav"
        write_wav(tmp_path / name,
                  _tone(2000 + 100 * i, noise=0.02, seed=10 + i), 16000)
        labels[name] = "high"
    (tmp_path / "labels.json").write_text(json.dumps(labels))

    model = tmp_path / "clf.npz"
    rc = vc.main(["train", "--data", str(tmp_path),
                  "--labels", str(tmp_path / "labels.json"),
                  "--out", str(model), "--steps", "200"])
    assert rc == 0 and model.exists()

    probe = tmp_path / "probe.wav"
    write_wav(probe, _tone(160, noise=0.02, seed=99), 16000)
    params, id2label = vc.load_model(model)
    feats = vc.clip_features(
        _tone(160, noise=0.02, seed=99), 16000)[None]
    probs = vc.predict(params, feats)[0]
    top = id2label[int(np.argmax(probs))]
    assert top == "low"

    probs_hi = vc.predict(params, vc.clip_features(
        _tone(2100, noise=0.02, seed=98), 16000)[None])[0]
    assert id2label[int(np.argmax(probs_hi))] == "high"


def test_model_roundtrip(tmp_path):
    import jax
    params = vc.init_mlp(jax.random.PRNGKey(0), [6, 4, 2])
    path = vc.save_model(tmp_path / "m.npz", params, {0: "a", 1: "b"})
    restored, id2label = vc.load_model(path)
    assert id2label == {0: "a", 1: "b"}
    x = np.ones((1, 6), np.float32)
    np.testing.assert_allclose(
        np.asarray(vc.mlp_logits(params, x)),
        np.asarray(vc.mlp_logits(restored, x)), rtol=1e-6)
