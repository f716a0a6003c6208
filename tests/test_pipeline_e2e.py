"""End-to-end pipeline tests on the virtual CPU mesh with a tiny model.

Mirrors the reference's integration-test strategy (SURVEY.md §4) at the
scale a CI box can run: synthetic speech-like audio through the FULL
path — scene detection → VAD → fixed-shape batched decode (sharded over
the 8-device CPU mesh) → stitch → sanitize → SRT on disk.
"""

import json
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
from whisperjav_tpu.modules.srt import load_srt

TINY = WhisperConfig(name="e2e-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2)

SR = 16000


def speech_like(duration_s, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))
    x += 0.05 * rng.standard_normal(n)
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def tiny_pipeline():
    cfg = resolve_pipeline_config(mode="balanced", sensitivity="balanced",
                                  batch_size=4)
    params = init_params(TINY, jax.random.PRNGKey(0))
    return build_pipeline(cfg, model_config=TINY, params=params,
                          postprocessor=SRTPostProcessor())


def _media_wav(tmp_path, name="clip.wav", pattern=((5, 0), (2, None), (4, 1))):
    parts = []
    for dur, seed in pattern:
        parts.append(np.zeros(int(dur * SR), np.float32) if seed is None
                     else speech_like(dur, seed))
    audio = np.concatenate(parts)
    p = tmp_path / name
    write_wav(p, audio, SR)
    return p


@pytest.mark.slow
def test_pipeline_end_to_end(tmp_path, tiny_pipeline):
    wav = _media_wav(tmp_path)
    out_dir = tmp_path / "out"
    result = tiny_pipeline.process(probe(wav), out_dir)

    assert result.srt_path is not None and result.srt_path.exists()
    assert result.srt_path.name == "clip.ja.whisperjav.srt"
    meta = json.loads((out_dir / "clip.whisperjav.json").read_text())
    assert meta["stats"]["windows"] >= 1
    assert meta["stats"]["scenes"] >= 1

    subs = load_srt(result.srt_path)
    # random weights: text is arbitrary, but structure must be valid
    for s in subs:
        assert s.end > s.start
        assert s.start >= 0
    # timestamps within the 11 s file (+pad tolerance)
    assert all(s.end <= 12.0 for s in subs)


@pytest.mark.slow
def test_pipeline_with_mesh(tmp_path, eight_device_mesh):
    """Same pipeline but with the batch sharded across 8 CPU devices."""
    cfg = resolve_pipeline_config(mode="fast", sensitivity="balanced",
                                  batch_size=8)
    params = init_params(TINY, jax.random.PRNGKey(0))
    pipe = build_pipeline(cfg, model_config=TINY, params=params,
                          mesh=eight_device_mesh)
    wav = _media_wav(tmp_path, "mesh.wav",
                     pattern=((6, 0), (2, None), (6, 1), (2, None), (5, 2)))
    result = pipe.process(probe(wav), tmp_path / "out")
    assert result.srt_path.exists()


def test_pipeline_empty_audio(tmp_path, tiny_pipeline):
    """Silent file: pipeline completes with an empty (or tiny) SRT."""
    p = tmp_path / "silent.wav"
    write_wav(p, np.zeros(SR * 3, np.float32), SR)
    result = tiny_pipeline.process(probe(p), tmp_path / "out")
    assert result.srt_path.exists()


@pytest.mark.slow
def test_artifacts_srt_written_e2e(tiny_pipeline, tmp_path, monkeypatch):
    """Removed cues land in a sidecar artifacts SRT with a summary cue
    (VERDICT item 7). A postprocessor wrapper injects a known
    hallucination cue so removal is deterministic with random weights."""
    from whisperjav_tpu.modules.srt import Subtitle

    orig = tiny_pipeline.postprocessor.process

    def with_injected_hallucination(subs, language="ja"):
        subs = list(subs) + [
            Subtitle(0, 0.2, 1.4, "ご視聴ありがとうございました")]
        return orig(subs, language=language)

    monkeypatch.setattr(tiny_pipeline.postprocessor, "process",
                        with_injected_hallucination)
    wav = _media_wav(tmp_path, "art.wav")
    res = tiny_pipeline.process(probe(wav), tmp_path / "out")
    art = tmp_path / "out" / "art.ja.whisperjav.artifacts.srt"
    assert art.exists()
    cues = load_srt(art)
    assert any("ご視聴ありがとうございました" in c.text for c in cues)
    assert any(c.text.startswith("[hallucination]") for c in cues)
    assert "summary" in cues[-1].text
    assert res.metadata["stats"]["artifacts_removed"] >= 1
