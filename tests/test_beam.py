"""Tests for beam-search decoding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.decode import (
    DecodeOptions, decode_beam, decode_greedy,
)
from whisperjav_tpu.models.whisper.model import encode, init_params

TINY = WhisperConfig(name="beam-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2, n_audio_ctx=100)


@pytest.fixture(scope="module")
def tiny_model():
    params = init_params(TINY, jax.random.PRNGKey(11))
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.standard_normal((2, 80, 200)).astype(np.float32))
    xa = encode(params, TINY, mel)
    return params, xa


def test_beam1_equals_greedy(tiny_model):
    params, xa = tiny_model
    opts = DecodeOptions(with_timestamps=False, max_new_tokens=10, beam_size=1)
    g = decode_greedy(params, TINY, xa, opts)
    b = decode_beam(params, TINY, xa, opts)
    np.testing.assert_array_equal(np.asarray(g.tokens), np.asarray(b.tokens))


def test_beam_score_at_least_greedy(tiny_model):
    """Beam-2 sum logprob of the winner ≥ greedy path's (same filters)."""
    params, xa = tiny_model
    for ts in (False, True):
        opts_g = DecodeOptions(with_timestamps=ts, max_new_tokens=12,
                               beam_size=1)
        opts_b = DecodeOptions(with_timestamps=ts, max_new_tokens=12,
                               beam_size=2)
        g = decode_greedy(params, TINY, xa, opts_g)
        b = decode_beam(params, TINY, xa, opts_b)
        # compare length-normalized scores as beam selection does
        def norm(res):
            return np.asarray(res.sum_logprob) / (
                ((5.0 + np.asarray(res.length)) / 6.0) ** 1.0)
        assert (norm(b) >= norm(g) - 1e-3).all()


def test_beam_outputs_valid(tiny_model):
    params, xa = tiny_model
    opts = DecodeOptions(max_new_tokens=16, beam_size=3)
    res = decode_beam(params, TINY, xa, opts)
    toks = np.asarray(res.tokens)
    assert toks.shape == (2, 16)
    assert np.isfinite(np.asarray(res.avg_logprob)).all()
    assert np.isfinite(np.asarray(res.no_speech_prob)).all()
    # eot padding invariant
    for row in toks:
        seen = False
        for t in row:
            if seen:
                assert t == TINY.eot
            if t == TINY.eot:
                seen = True
    # timestamp grammar holds for beam decodes too
    for row in toks:
        prev = None
        for t in row:
            if t == TINY.eot:
                break
            if t >= TINY.timestamp_begin:
                if prev is not None:
                    assert t >= prev
                prev = t
