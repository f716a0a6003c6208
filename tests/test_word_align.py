"""Tests for cross-attention word-timestamp alignment."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import encode, init_params
from whisperjav_tpu.models.whisper.word_align import (
    cross_attention_maps, default_head_mask, word_timestamps,
)

TINY = WhisperConfig(name="wa-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2, n_audio_ctx=100)


@pytest.fixture(scope="module")
def model():
    params = init_params(TINY, jax.random.PRNGKey(3))
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((1, 80, 200)).astype(np.float32))
    xa = encode(params, TINY, mel)
    return params, xa


def test_head_mask_normalized():
    mask = default_head_mask(TINY)
    assert mask.shape == (2, 4)
    assert mask.sum() == pytest.approx(1.0)
    assert (mask[0] == 0).all()       # bottom half unused


def test_attention_maps_are_distributions(model):
    params, xa = model
    toks = jnp.asarray(np.array([[TINY.sot, 100, 200, 300]], np.int32))
    maps = np.asarray(cross_attention_maps(
        params, TINY, toks, xa, jnp.asarray(default_head_mask(TINY))))
    assert maps.shape == (1, 4, 100)
    assert (maps >= 0).all()
    # each row sums to ~1 (softmax mass × normalized head weights)
    np.testing.assert_allclose(maps.sum(-1), 1.0, atol=1e-3)


def test_word_timestamps_monotonic(model):
    params, xa = model
    generated = np.array([100, 200, 300, 400, TINY.eot, TINY.eot])
    spans = word_timestamps(params, TINY, xa, generated,
                            audio_duration=2.0)
    assert len(spans) == 4
    for a, b in zip(spans[:-1], spans[1:]):
        assert b.start >= a.start
    for s in spans:
        assert 0.0 <= s.start <= s.end <= 2.0
        assert s.end > s.start


def test_word_timestamps_empty_for_eot_only(model):
    params, xa = model
    assert word_timestamps(params, TINY, xa,
                           np.array([TINY.eot] * 4)) == []


def test_word_timestamps_skips_timestamp_tokens(model):
    params, xa = model
    generated = np.array([TINY.timestamp_begin, 100, 200,
                          TINY.timestamp_begin + 50, TINY.eot])
    spans = word_timestamps(params, TINY, xa, generated)
    assert len(spans) == 2   # only the text tokens


@pytest.mark.slow
def test_engine_word_timestamp_refinement():
    """Engine path with word_timestamps=True produces valid segments."""
    from whisperjav_tpu.models.whisper.decode import DecodeOptions
    from whisperjav_tpu.parallel.batching import Window
    from whisperjav_tpu.pipelines.engine import (
        QualityThresholds, TranscriptionEngine,
    )
    # full-window config: the engine always feeds 30 s windows (1500 ctx)
    cfg_full = WhisperConfig(name="wa-engine", n_audio_state=64,
                             n_audio_head=4, n_audio_layer=2,
                             n_text_state=64, n_text_head=4, n_text_layer=2)
    params = init_params(cfg_full, jax.random.PRNGKey(3))
    eng = TranscriptionEngine(
        cfg_full, params, options=DecodeOptions(max_new_tokens=12),
        thresholds=QualityThresholds(temperatures=(0.0,)),
        batch_size=2, word_timestamps=True)
    rng = np.random.default_rng(1)
    clips = [Window((0.2 * rng.standard_normal(16000 * 3)).astype(np.float32),
                    0.0, 3.0, 0, i) for i in range(2)]
    results = eng.transcribe_windows(clips)
    for w, segs in results:
        for s in segs:
            # engine contract: refinement keeps ordering and finiteness;
            # out-of-window segments are the PIPELINE's filter concern
            assert np.isfinite([s.start, s.end]).all()
            assert s.start <= s.end
            if s.start < w.duration:   # in-window: refinement stays inside
                assert s.end <= w.duration + 0.5 + 1e-6
