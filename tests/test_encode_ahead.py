"""Encode-ahead pipelining (ADR-002): transcribe_windows dispatches
batch i+1's encode between batch i's decode dispatch and its drain.

The lever reorders device work only — outputs must be bit-identical to
the sequential path, and every batch after the first must arrive at
transcribe_batch pre-encoded (device_xa) with the right cross-KV bucket.
Reference behavior anchor: the CTranslate2 engine serializes
encode/decode per scene (whisperjav/modules/faster_whisper_pro_asr.py:819-894);
the TPU redesign pipelines them across fixed-shape batches.
"""

import numpy as np
import pytest

import jax

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.decode import DecodeOptions
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.parallel.batching import Window
from whisperjav_tpu.pipelines.engine import (
    CROSS_KV_BUCKETS, QualityThresholds, TranscriptionEngine,
)

CFG = WhisperConfig(name="ea-tiny", n_audio_state=64, n_audio_head=4,
                    n_audio_layer=2, n_text_state=64, n_text_head=4,
                    n_text_layer=2)


def _engine(**kw):
    params = init_params(CFG, jax.random.PRNGKey(0))
    return TranscriptionEngine(
        CFG, params, options=DecodeOptions(max_new_tokens=12),
        thresholds=QualityThresholds(temperatures=(0.0, 0.4)),
        batch_size=2, **kw)


def _windows(n=5):
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        dur = [3.0, 8.0, 12.0, 3.0, 25.0][i % 5]
        x = (0.2 * rng.standard_normal(int(16000 * dur))).astype(np.float32)
        out.append(Window(x, 0.0, dur, 0, i))
    return out


def _flatten(results):
    return [(w.group_idx,
             [(tuple(s.tokens), round(s.start, 4), round(s.end, 4))
              for s in segs])
            for w, segs in results]


def test_encode_ahead_outputs_identical(monkeypatch):
    eng = _engine()
    wins = _windows()
    monkeypatch.setenv("WJAV_ENCODE_AHEAD", "0")
    base = _flatten(eng.transcribe_windows(wins, seed=3))
    monkeypatch.setenv("WJAV_ENCODE_AHEAD", "1")
    ahead = _flatten(eng.transcribe_windows(wins, seed=3))
    assert ahead == base
    assert any(segs for _, segs in base)   # non-degenerate comparison


def test_encode_ahead_passes_pre_encoded_batches(monkeypatch):
    """Every batch after the first arrives pre-encoded, and the ahead
    encode is dispatched AFTER the current batch's decode (ordering is
    the whole point of the lever)."""
    eng = _engine()
    wins = _windows()
    monkeypatch.setenv("WJAV_ENCODE_AHEAD", "1")
    # pin to the encode-ahead (callback) path — decode-ahead supersedes
    # it when HBM allows and never routes through transcribe_batch
    monkeypatch.setenv("WJAV_DECODE_AHEAD", "0")

    events = []
    orig_tb = TranscriptionEngine.transcribe_batch
    orig_de = TranscriptionEngine.decode_encoded
    orig_eb = TranscriptionEngine.encode_batch

    def spy_tb(self, batch, seed=0, device_audio=None, device_xa=None,
               on_decode_dispatched=None, trace=None, **kw):
        events.append(("batch", device_xa is not None))
        return orig_tb(self, batch, seed=seed, device_audio=device_audio,
                       device_xa=device_xa,
                       on_decode_dispatched=on_decode_dispatched,
                       trace=trace, **kw)

    def spy_de(self, xa, temperature=0.0, seed=0):
        events.append(("decode",))
        return orig_de(self, xa, temperature, seed)

    def spy_eb(self, audio=None, device_audio=None, max_duration=None):
        events.append(("encode", max_duration))
        return orig_eb(self, audio=audio, device_audio=device_audio,
                       max_duration=max_duration)

    monkeypatch.setattr(TranscriptionEngine, "transcribe_batch", spy_tb)
    monkeypatch.setattr(TranscriptionEngine, "decode_encoded", spy_de)
    monkeypatch.setattr(TranscriptionEngine, "encode_batch", spy_eb)
    eng.transcribe_windows(wins, seed=3)

    pre_encoded = [ok for kind, *rest in events if kind == "batch"
                   for ok in rest]
    assert pre_encoded[0] is False          # first batch encodes inline
    assert all(pre_encoded[1:])             # the rest are encode-ahead
    # ordering: each ahead-encode comes after at least one decode dispatch
    first_decode = next(i for i, e in enumerate(events) if e[0] == "decode")
    ahead_encodes = [i for i, e in enumerate(events)
                     if e[0] == "encode"][1:]   # skip batch 0's inline one
    assert ahead_encodes and all(i > first_decode for i in ahead_encodes)


def test_decode_ahead_outputs_identical(monkeypatch):
    """Decode-ahead (keep batch i+1's decode in flight while draining
    batch i) reorders device work only — outputs bit-identical to the
    sequential path."""
    eng = _engine()
    wins = _windows()
    monkeypatch.setenv("WJAV_ENCODE_AHEAD", "0")
    monkeypatch.setenv("WJAV_DECODE_AHEAD", "0")
    base = _flatten(eng.transcribe_windows(wins, seed=3))
    monkeypatch.setenv("WJAV_ENCODE_AHEAD", "1")
    monkeypatch.setenv("WJAV_DECODE_AHEAD", "1")
    ahead = _flatten(eng.transcribe_windows(wins, seed=3))
    assert ahead == base
    assert any(segs for _, segs in base)


def test_decode_ahead_dispatch_order(monkeypatch):
    """Batch i+1's encode AND first-rung decode are dispatched BEFORE
    batch i's drain (finish_batch) — that interleave is the lever."""
    eng = _engine()
    wins = _windows()
    monkeypatch.setenv("WJAV_ENCODE_AHEAD", "1")
    monkeypatch.setenv("WJAV_DECODE_AHEAD", "1")

    events = []
    orig_fb = TranscriptionEngine.finish_batch
    orig_de = TranscriptionEngine.decode_encoded

    def spy_fb(self, batch, xa, result, seed=0, trace=None, **kw):
        events.append("finish")
        return orig_fb(self, batch, xa, result, seed=seed, trace=trace,
                       **kw)

    def spy_de(self, xa, temperature=0.0, seed=0):
        events.append("decode")
        return orig_de(self, xa, temperature, seed)

    monkeypatch.setattr(TranscriptionEngine, "finish_batch", spy_fb)
    monkeypatch.setattr(TranscriptionEngine, "decode_encoded", spy_de)
    res = eng.transcribe_windows(wins, seed=3)
    assert len(res) == len(wins)

    # 5 windows at batch_size=2 → 3 batches: the first-rung dispatch
    # pattern must be decode,decode,finish,decode,finish,finish (ladder
    # rungs may add extra decodes between, but batch i+1's first decode
    # always precedes batch i's finish)
    assert events[:2] == ["decode", "decode"]
    assert events.count("finish") == 3
    # the first drain happens only after TWO first-rung dispatches (its
    # own + the next batch's) — i.e., exactly at index 2; ladder rungs
    # (random weights fail gates here) append decodes inside each finish
    assert events.index("finish") == 2


def test_decode_ahead_hbm_guard(monkeypatch):
    """Auto mode disables decode-ahead when two decode footprints would
    not leave HBM headroom (large-v2/B=64-class configs)."""
    eng = _engine()
    monkeypatch.setenv("WJAV_DECODE_AHEAD", "auto")
    assert eng._decode_ahead_enabled()          # tiny config: fits
    monkeypatch.setattr(TranscriptionEngine, "DECODE_AHEAD_BUDGET_BYTES", 1)
    assert not eng._decode_ahead_enabled()      # no headroom: sequential
    monkeypatch.setenv("WJAV_DECODE_AHEAD", "1")
    assert eng._decode_ahead_enabled()          # explicit override wins


def test_gate_fail_injection(monkeypatch):
    """WJAV_GATE_FAIL_PCT draws a deterministic ~N% of rows as rung-1
    failures (ladder-cost realism bench knob): 0 → content gates rule;
    100 → every row retries exactly once; draws are seed-stable."""
    eng = _engine()
    wins = _windows(4)
    calls = []
    orig_de = TranscriptionEngine.decode_encoded

    def spy_de(self, xa, temperature=0.0, seed=0):
        calls.append(float(temperature))
        return orig_de(self, xa, temperature, seed)

    monkeypatch.setattr(TranscriptionEngine, "decode_encoded", spy_de)
    monkeypatch.setenv("WJAV_DECODE_AHEAD", "0")
    monkeypatch.setenv("WJAV_GATE_FAIL_PCT", "100")
    eng.transcribe_windows(wins, seed=3)
    # 2 batches × (rung1 + exactly one injected retry) = 4 decodes
    assert calls.count(0.0) == 2 and len(calls) == 4
    calls.clear()
    monkeypatch.setenv("WJAV_GATE_FAIL_PCT", "0.0001")
    eng.transcribe_windows(wins, seed=3)
    # ~0% injection: no retries at all (content gates bypassed)
    assert calls == [0.0, 0.0]


def test_encode_batch_bucket_slice():
    eng = _engine()
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((2, 16000 * 30))).astype(np.float32)
    xa = eng.encode_batch(audio, max_duration=6.0)
    assert xa.shape[1] == CROSS_KV_BUCKETS[0]          # 448 bucket
    xa = eng.encode_batch(audio, max_duration=29.0)
    assert xa.shape[1] == min(CROSS_KV_BUCKETS[-1], CFG.n_audio_ctx)
    # no max_duration: untouched full context
    xa = eng.encode_batch(audio)
    assert xa.shape[1] == CFG.n_audio_ctx
