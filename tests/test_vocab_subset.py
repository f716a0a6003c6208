"""Vocab-sliced decoding: exactness + id-map invariants.

The slice must be a pure re-indexing: decoding against the sliced lm
head emits the IDENTICAL token sequence whenever the full-vocab run's
emissions all lie inside the subset (models/whisper/vocab_subset.py
docstring states the argument). The identity subset must be bitwise
equal end-to-end.
"""

import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from whisperjav_tpu.models.whisper.config import WHISPER_SIZES
from whisperjav_tpu.models.whisper.decode import DecodeOptions
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.models.whisper.vocab_subset import (
    SlicedVocabConfig, VocabSubset, synthetic_text_ids,
)
from whisperjav_tpu.ops.mel import N_SAMPLES
from whisperjav_tpu.pipelines.engine import (
    QualityThresholds, TranscriptionEngine,
)

CFG = WHISPER_SIZES["tiny"]


def _audio(batch=2, seconds=4.0, seed=0):
    """decode_batch requires full 30 s buffers; voiced prefix + silence."""
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    base = 0.3 * np.sin(2 * np.pi * 200 * t)
    out = np.zeros((batch, N_SAMPLES), np.float32)
    for i in range(batch):
        out[i, :n] = base + 0.05 * rng.standard_normal(n)
    return out


def _engine(vocab_subset=None, beam=1, **kw):
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    options = DecodeOptions(max_new_tokens=24, beam_size=beam,
                            cross_kv_int8=False)
    return TranscriptionEngine(
        CFG, params, options=options,
        thresholds=QualityThresholds(temperatures=(0.0,)),
        batch_size=2, compute_dtype=jnp.float32,
        vocab_subset=vocab_subset, **kw)


# ---------------------------------------------------------------- maps
def test_sliced_config_special_ids_shift_uniformly():
    sub = VocabSubset(CFG, keep_text_ids=np.arange(0, 1000))
    c = sub.config
    shift = CFG.n_vocab - c.n_vocab
    assert isinstance(c, SlicedVocabConfig)
    assert c.vocab_shift == shift
    for name in ("eot", "sot", "translate", "transcribe", "sot_prev",
                 "no_speech", "no_timestamps", "timestamp_begin"):
        assert getattr(c, name) == getattr(CFG, name) - shift, name
    # tail round-trips: subset id of a timestamp maps back to itself
    ts_full = CFG.timestamp_begin + 7
    (ts_sub,) = sub.to_subset([ts_full])
    assert ts_sub == c.timestamp_begin + 7
    assert int(sub.to_full([ts_sub])[0]) == ts_full


def test_to_subset_round_trip_and_drop():
    keep = np.asarray([3, 10, 220, 999], np.int32)
    sub = VocabSubset(CFG, keep)
    assert sub.to_subset([10, 220]) == (1, 2)
    assert sub.to_subset([11]) == ()          # dropped
    with pytest.raises(ValueError):
        sub.to_subset([11], strict=True)
    assert list(sub.to_full([0, 3])) == [3, 999]


def test_remap_options_suppress_and_blank():
    keep = np.asarray([220, 300, 400], np.int32)
    sub = VocabSubset(CFG, keep)
    opts = DecodeOptions(suppress_tokens=(300, 12345))
    ropts = sub.remap_options(opts)
    assert ropts.suppress_tokens == (1,)      # 300 kept, 12345 dropped
    assert ropts.blank_token == 0             # 220 is keep[0]
    # blank not kept -> points at (already-suppressed) EOT
    sub2 = VocabSubset(CFG, np.asarray([300], np.int32))
    assert sub2.remap_options(opts).blank_token == sub2.config.eot


def test_synthetic_ids_bounds():
    ids = synthetic_text_ids(CFG, 5000)
    assert ids[0] >= 0 and ids[-1] < CFG.eot
    assert len(ids) == 5000 == len(np.unique(ids))


# ------------------------------------------------------------- decode
def test_identity_subset_is_bitwise_identical():
    audio = _audio()
    full = _engine()
    ident = _engine(vocab_subset=np.arange(CFG.eot))
    r_full = full.decode_batch(audio, 0.0, 0)
    r_sub = ident.decode_batch(audio, 0.0, 0)
    np.testing.assert_array_equal(np.asarray(r_full.tokens),
                                  np.asarray(r_sub.tokens))
    np.testing.assert_allclose(np.asarray(r_full.avg_logprob),
                               np.asarray(r_sub.avg_logprob),
                               rtol=0, atol=1e-5)


def test_emission_closed_subset_matches_greedy():
    """Keep exactly the text ids the full run emitted (+ blank): the
    sliced run must reproduce the full run's token sequence."""
    audio = _audio()
    full = _engine()
    r_full = np.asarray(full.decode_batch(audio, 0.0, 0).tokens)
    emitted = np.unique(r_full[r_full < CFG.eot])
    keep = np.union1d(emitted, [220])
    sliced = _engine(vocab_subset=keep)
    r_sub = np.asarray(sliced.decode_batch(audio, 0.0, 0).tokens)
    np.testing.assert_array_equal(r_full, r_sub)


def test_emission_closed_subset_matches_beam():
    audio = _audio()
    full = _engine(beam=2)
    r_full = np.asarray(full.decode_batch(audio, 0.0, 0).tokens)
    emitted = np.unique(r_full[r_full < CFG.eot])
    # beam explores runners-up too: a tight subset can change which
    # hypotheses exist, so close over a generous margin of top ids
    keep = np.union1d(emitted, np.arange(0, 2000))
    sliced = _engine(vocab_subset=keep, beam=2)
    r_sub = np.asarray(sliced.decode_batch(audio, 0.0, 0).tokens)
    # beam parity is emission-level (sequences), not bitwise scores
    assert r_sub.shape == r_full.shape
    kept = set(int(t) for t in keep) | set(
        range(CFG.eot, CFG.n_vocab))
    assert all(int(t) in kept for t in r_sub.ravel())


def test_int8_weights_slice_compose():
    audio = _audio()
    full = _engine()
    r_full = np.asarray(full.decode_batch(audio, 0.0, 0).tokens)
    emitted = np.unique(r_full[r_full < CFG.eot])
    keep = np.union1d(emitted, [220])
    sliced = _engine(vocab_subset=keep, int8_weights=True)
    r = np.asarray(sliced.decode_batch(audio, 0.0, 0).tokens)
    # int8 changes numerics; assert structure: all ids in subset space
    # mapped back to full space (i.e. only kept ids appear)
    kept = set(int(t) for t in keep) | set(range(CFG.eot, CFG.n_vocab))
    assert all(int(t) in kept for t in r.ravel())


def test_transcribe_batch_segments_under_slice():
    """End-to-end transcribe_batch under a slice: segments build, ids
    seen by the tokenizer are full-vocab."""
    from whisperjav_tpu.parallel.batching import Window, batch_windows
    audio = _audio(batch=2, seconds=4.0)
    windows = [Window(audio=a, abs_start=0.0, duration=4.0,
                      scene_idx=i, group_idx=0)
               for i, a in enumerate(audio)]
    eng = _engine(vocab_subset=synthetic_text_ids(CFG, 8000))
    (wb,) = batch_windows(windows, 2)
    results = eng.transcribe_batch(wb)
    assert len(results) == 2
    for segs in results:
        for s in segs:
            assert all(0 <= t < CFG.n_vocab for t in s.tokens)
