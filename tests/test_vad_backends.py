"""Tests for the JAX VAD model backends (silero-jax, whisperseg)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.modules.segmentation import create_segmenter
from whisperjav_tpu.modules.segmentation.silero_jax import (
    SileroJaxSegmenter, hysteresis_regions,
)
from whisperjav_tpu.modules.segmentation.whisperseg import WhisperSegSegmenter

SR = 16000


def speech_like(duration_s, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_hysteresis_state_machine():
    probs = np.array([0.1, 0.2, 0.6, 0.7, 0.3, 0.25, 0.1, 0.8, 0.9, 0.05])
    segs = hysteresis_regions(probs, 0.1, onset=0.5, release=0.28)
    # enters at idx2, stays through 0.3 (>= release 0.28), exits at 0.25
    assert len(segs) == 2
    assert segs[0].start == pytest.approx(0.2)
    assert segs[0].end == pytest.approx(0.5)
    assert segs[1].start == pytest.approx(0.7)
    assert segs[1].end == pytest.approx(0.9)


def test_silero_jax_energy_fallback_segments():
    audio = np.concatenate([np.zeros(SR, np.float32), speech_like(3),
                            np.zeros(SR, np.float32)])
    seg = create_segmenter("silero").segment(audio, SR)
    assert seg.backend == "silero-jax"
    assert seg.stats["model"] == "energy-prob"
    assert len(seg.segments) >= 1
    # detected speech roughly covers the 1..4 s region
    s = seg.segments[0]
    assert s.start < 1.5 and s.end > 3.0


def test_silero_jax_model_runs(tmp_path):
    """With random weights the model path runs end-to-end (probs in [0,1])."""
    from whisperjav_tpu.models.vad import silero_like
    params = silero_like.init_params(jax.random.PRNGKey(0))
    w = tmp_path / "vad.npz"
    silero_like.save_params(str(w), params)
    seg = SileroJaxSegmenter(weights=str(w))
    audio = speech_like(4)
    probs = seg.frame_probs(audio, SR)
    assert probs.shape[0] == int(4 / 0.04)
    assert ((probs >= 0) & (probs <= 1)).all()
    result = seg.segment(audio, SR)
    assert result.stats["model"] == "jax"


def test_whisperseg_energy_fallback():
    audio = np.concatenate([speech_like(2), np.zeros(SR, np.float32),
                            speech_like(2, seed=1)])
    seg = create_segmenter("whisperseg").segment(audio, SR)
    assert seg.backend == "whisperseg"
    assert len(seg.segments) >= 1
    assert seg.groups


@pytest.mark.slow
def test_whisperseg_model_runs(tmp_path):
    from whisperjav_tpu.models.vad import whisperseg
    params = whisperseg.init_params(jax.random.PRNGKey(0))
    w = tmp_path / "wseg.npz"
    whisperseg.save_params(str(w), params)
    seg = WhisperSegSegmenter(weights=str(w), batch_size=2)
    audio = speech_like(40)  # 2 windows
    probs = seg.frame_probs(audio, SR)
    assert probs.shape[0] == int(40 / 0.02)
    assert ((probs >= 0) & (probs <= 1)).all()
