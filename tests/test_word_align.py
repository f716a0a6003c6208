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


# ---------------------------------------------------------------- heads
def test_alignment_heads_blob_roundtrip():
    """openai _ALIGNMENT_HEADS format: base85(gzip(bool (L, H) mask))."""
    from whisperjav_tpu.models.whisper.alignment_heads import (
        decode_alignment_heads_blob, encode_alignment_heads_blob,
    )
    heads = ((2, 2), (3, 0), (3, 5))
    blob = encode_alignment_heads_blob(heads, 4, 6)
    assert decode_alignment_heads_blob(blob, 4, 6) == heads
    # str input accepted too
    assert decode_alignment_heads_blob(blob.decode("ascii"), 4, 6) == heads
    with pytest.raises(ValueError):
        decode_alignment_heads_blob(blob, 8, 6)   # wrong architecture


def test_bundled_table_covers_all_sizes():
    from whisperjav_tpu.models.whisper.alignment_heads import (
        bundled_alignment_heads,
    )
    from whisperjav_tpu.models.whisper.config import WHISPER_SIZES
    for name, cfg in WHISPER_SIZES.items():
        heads = bundled_alignment_heads(name)
        assert heads, f"no bundled alignment heads for {name}"
        for l, h in heads:
            assert 0 <= l < cfg.n_text_layer, (name, l)
            assert 0 <= h < cfg.n_text_head, (name, h)


def test_bundled_table_name_normalization():
    from whisperjav_tpu.models.whisper.alignment_heads import (
        bundled_alignment_heads,
    )
    direct = bundled_alignment_heads("large-v2")
    assert bundled_alignment_heads("/ckpt/whisper-large-v2") == direct
    assert bundled_alignment_heads("openai/whisper-large-v2") == direct
    assert bundled_alignment_heads("not-a-model") is None


def test_resolution_order(tmp_path):
    """generation_config > checkpoint sidecar > bundled table."""
    import json

    from whisperjav_tpu.models.whisper.alignment_heads import (
        resolve_alignment_heads,
    )
    # 1. generation_config wins
    assert resolve_alignment_heads(
        "large-v2", 32, 20,
        generation_config_heads=[[1, 1]]) == ((1, 1),)
    # 2. sidecar file next
    (tmp_path / "alignment_heads.json").write_text(
        json.dumps({"alignment_heads": [[2, 3], [4, 5]]}))
    assert resolve_alignment_heads(
        "large-v2", 32, 20, checkpoint_dir=tmp_path) == ((2, 3), (4, 5))
    # 3. bundled table as fallback
    assert resolve_alignment_heads("large-v2", 32, 20)
    # out-of-range entries dropped, empty result -> None
    assert resolve_alignment_heads(
        "x", 2, 2, generation_config_heads=[[9, 9]]) is None


def test_load_model_attaches_bundled_heads():
    from whisperjav_tpu.pipelines.factory import load_model
    cfg, _ = load_model("tiny")
    assert cfg.alignment_heads
    mask = default_head_mask(cfg)
    # the mask follows the table, not the top-half fallback
    assert mask[2, 2] > 0 and mask[0, 0] == 0
