"""Determinism suite: evidence for dropping the reference's safety caps.

The reference contains its CTranslate2 ensemble's intermittent
catastrophic truncation with safety caps + a failure-rate harness
(reference: tools/ensemble_failure_rate_suite.py, ensemble/safety_caps).
The TPU runtime's claim is that those caps are unnecessary because the
compiled XLA pipeline is deterministic. These tests prove the claim on
the 8-device CPU mesh (PARITY row 58 cites them):

  * repeated runs → byte-identical SRT;
  * batch size 1 vs 8 → identical per-window results (row
    independence of every program);
  * packed and unpacked window modes → each individually deterministic
    (cross-mode equality is NOT a determinism property: packing changes
    the audio presented to the model — ADR-001);
  * two-pass ensemble repeated → byte-identical merged SRT, zero
    degraded passes (the reference's failure-rate probe at N=2).
"""

import hashlib
from pathlib import Path

import numpy as np
import pytest

import jax

from whisperjav_tpu.config.presets import resolve_pipeline_config
from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.modules.audio_io import write_wav
from whisperjav_tpu.modules.media_discovery import probe
from whisperjav_tpu.modules.sanitize import SRTPostProcessor
from whisperjav_tpu.pipelines.factory import build_pipeline

TINY = WhisperConfig(name="det-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2)
SR = 16000


def _speech(duration_s, seed):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 180 * t) * (
        1 + 0.5 * np.sin(2 * np.pi * 4 * t))
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    parts = [_speech(4, 0), np.zeros(SR, np.float32), _speech(3, 1),
             np.zeros(SR * 2, np.float32), _speech(5, 2)]
    p = tmp_path_factory.mktemp("det") / "det.wav"
    write_wav(p, np.concatenate(parts), SR)
    return p


def _sha(path: Path) -> str:
    return hashlib.sha256(path.read_bytes()).hexdigest()


def _run(media_path, out_dir, batch_size=8, pack=True, seed=0):
    cfg = resolve_pipeline_config(mode="balanced", sensitivity="balanced",
                                  batch_size=batch_size)
    cfg.pack_windows = pack
    params = init_params(TINY, jax.random.PRNGKey(0))
    pipe = build_pipeline(cfg, model_config=TINY, params=params,
                          postprocessor=SRTPostProcessor())
    res = pipe.process(probe(media_path), out_dir, seed=seed)
    assert res.srt_path is not None and res.srt_path.exists()
    return res.srt_path


@pytest.mark.slow
def test_repeated_runs_byte_identical(media, tmp_path):
    """Fresh pipeline builds, same input/seed → byte-identical SRT."""
    a = _sha(_run(media, tmp_path / "a"))
    b = _sha(_run(media, tmp_path / "b"))
    assert a == b


@pytest.mark.slow
def test_batch_size_invariance(media, tmp_path):
    """Rows are independent: B=1 and B=8 decode identical results."""
    a = _sha(_run(media, tmp_path / "b1", batch_size=1))
    b = _sha(_run(media, tmp_path / "b8", batch_size=8))
    assert a == b


@pytest.mark.slow
def test_packed_and_unpacked_each_deterministic(media, tmp_path):
    packed = [_sha(_run(media, tmp_path / f"p{i}", pack=True))
              for i in range(2)]
    unpacked = [_sha(_run(media, tmp_path / f"u{i}", pack=False))
                for i in range(2)]
    assert packed[0] == packed[1]
    assert unpacked[0] == unpacked[1]


@pytest.mark.slow
def test_ensemble_failure_rate_zero(media, tmp_path, monkeypatch):
    """Two-pass ensemble repeated: identical merged SRT, no degraded
    passes — the reference's failure-rate probe, expected rate 0."""
    from whisperjav_tpu.ensemble.orchestrator import EnsembleOrchestrator
    from whisperjav_tpu.pipelines import factory as factory_mod

    params = init_params(TINY, jax.random.PRNGKey(0))

    real_load = factory_mod.load_model
    monkeypatch.setattr(
        factory_mod, "load_model",
        lambda name, checkpoint=None, dtype=None: (TINY, params))

    shas = []
    for i in range(2):
        orch = EnsembleOrchestrator(
            resolve_pipeline_config(mode="balanced",
                                    sensitivity="balanced", batch_size=4),
            resolve_pipeline_config(mode="fast", sensitivity="balanced",
                                    batch_size=4))
        report = orch.process_batch([probe(media)], tmp_path / f"ens{i}")
        assert report["degraded"] == 0 and report["failed"] == 0
        out = report["results"][0]["output"]
        assert out is not None
        shas.append(_sha(Path(out)))
    assert shas[0] == shas[1]
    monkeypatch.setattr(factory_mod, "load_model", real_load)


def test_determinism_suite_tool(media, tmp_path, monkeypatch):
    """The CLI harness itself: 2 runs, PASS verdict, JSONL written."""
    from whisperjav_tpu.pipelines import factory as factory_mod
    from whisperjav_tpu.tools import determinism_suite

    params = init_params(TINY, jax.random.PRNGKey(0))
    monkeypatch.setattr(
        factory_mod, "load_model",
        lambda name, checkpoint=None, dtype=None: (TINY, params))

    rc = determinism_suite.main([
        "--media", str(media), "--runs", "2", "--mode", "fast",
        "--batch-size", "4", "--catastrophic-floor", "0",
        "--output-root", str(tmp_path / "suite")])
    assert rc == 0
    assert (tmp_path / "suite" / "results.jsonl").exists()
    import json
    summary = json.loads((tmp_path / "suite" / "summary.json").read_text())
    assert summary["deterministic"] is True
    assert summary["verdict"] == "PASS"
