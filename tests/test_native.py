"""Tests for the native C++ host kernels (and their numpy fallbacks)."""

import numpy as np
import pytest

from whisperjav_tpu import native


def test_native_builds():
    # g++ is part of the supported toolchain; library should build here
    assert native.available()


def test_pcm16_matches_numpy():
    rng = np.random.default_rng(0)
    raw = rng.integers(-32768, 32767, size=100_000).astype("<i2")
    out = native.pcm16_to_f32(raw)
    ref = raw.astype(np.float32) / 32768.0
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-7)


def test_frame_energy_matches_numpy():
    rng = np.random.default_rng(1)
    audio = (0.1 * rng.standard_normal(160_000)).astype(np.float32)
    hop = 160
    out = native.frame_energy_db(audio, hop)
    n = len(audio) // hop
    x = (audio[: n * hop].astype(np.float64) * 32768.0) ** 2
    ref = 10.0 * np.log10(x.reshape(-1, hop).mean(axis=1) + 1e-12)
    assert out.shape == (n,)
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-3)


def test_hysteresis_matches_python():
    probs = np.array([0.1, 0.2, 0.6, 0.7, 0.3, 0.25, 0.1, 0.8, 0.9, 0.05],
                     np.float32)
    regions = native.hysteresis(probs, onset=0.5, release=0.28)
    assert regions == [(2, 5), (7, 9)]


def test_hysteresis_open_at_end():
    probs = np.array([0.9, 0.9, 0.9], np.float32)
    assert native.hysteresis(probs, 0.5, 0.3) == [(0, 3)]


def test_empty_inputs():
    assert native.frame_energy_db(np.zeros(0, np.float32), 160).shape == (0,)
    assert native.hysteresis(np.zeros(0, np.float32), 0.5, 0.3) == []
