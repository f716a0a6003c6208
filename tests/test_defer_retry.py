"""Deferred row-level temperature-ladder retries (round 5).

The inline ladder re-decodes a WHOLE batch when any row fails the
rung-1 quality gates (reference semantics: the CTranslate2 ladder
re-runs the full transcribe per temperature,
whisperjav/modules/faster_whisper_pro_asr.py:939-967 +
config/components/asr/faster_whisper.py:236-356). At a realistic
production failure rate (~5% of rows) that fires on most batches. The
deferred mode collects failed rows file-wide and retries them in packed
batches at the END of transcribe_windows — same per-row semantics
(adopt-iff-logprob-improved, exit-on-gate-pass, bail-on-no-improvement),
~batch_size× fewer retry executions.
"""

import numpy as np
import pytest

import jax

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.decode import DecodeOptions
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.parallel.batching import Window
from whisperjav_tpu.pipelines.engine import (
    QualityThresholds, TranscriptionEngine,
)

CFG = WhisperConfig(name="dr-tiny", n_audio_state=64, n_audio_head=4,
                    n_audio_layer=2, n_text_state=64, n_text_head=4,
                    n_text_layer=2)


def _engine(temps=(0.0, 0.4), **kw):
    params = init_params(CFG, jax.random.PRNGKey(0))
    return TranscriptionEngine(
        CFG, params, options=DecodeOptions(max_new_tokens=12),
        thresholds=QualityThresholds(temperatures=temps),
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


def test_no_failures_paths_identical(monkeypatch):
    """With every row passing rung-1 gates, deferred and inline modes
    must produce identical output (the pool stays empty)."""
    eng = _engine()
    monkeypatch.setattr(TranscriptionEngine, "_row_needs_fallback",
                        lambda self, *a, **k: False)
    wins = _windows()
    monkeypatch.setenv("WJAV_DEFER_RETRY", "0")
    base = _flatten(eng.transcribe_windows(wins, seed=3))
    monkeypatch.setenv("WJAV_DEFER_RETRY", "1")
    defer = _flatten(eng.transcribe_windows(wins, seed=3))
    assert base == defer


def test_all_windows_covered_under_injection(monkeypatch):
    """Every input window appears exactly once in the results even when
    some rows detour through the deferred pool."""
    eng = _engine()
    monkeypatch.setenv("WJAV_DEFER_RETRY", "1")
    monkeypatch.setenv("WJAV_GATE_FAIL_PCT", "50")
    wins = _windows(7)
    results = eng.transcribe_windows(wins, seed=3)
    got = sorted(w.group_idx for w, _ in results)
    assert got == list(range(7))
    for _, segs in results:
        assert isinstance(segs, list)


def test_deferred_runs_fewer_decodes(monkeypatch):
    """At a failure rate that touches most batches, deferred mode must
    execute fewer ladder decodes than inline whole-batch retries."""
    wins = _windows(8)     # 4 batches at B=2
    calls = {"n": 0}
    orig = TranscriptionEngine.decode_encoded

    def counting(self, xa, temperature=0.0, seed=0):
        if temperature > 0.0:
            calls["n"] += 1
        return orig(self, xa, temperature, seed)

    monkeypatch.setattr(TranscriptionEngine, "decode_encoded", counting)
    monkeypatch.setenv("WJAV_GATE_FAIL_PCT", "40")

    eng = _engine()
    monkeypatch.setenv("WJAV_DEFER_RETRY", "0")
    eng.transcribe_windows(wins, seed=3)
    inline_calls = calls["n"]

    calls["n"] = 0
    monkeypatch.setenv("WJAV_DEFER_RETRY", "1")
    eng.transcribe_windows(wins, seed=3)
    deferred_calls = calls["n"]

    assert deferred_calls < inline_calls
    assert deferred_calls >= 1      # injection guarantees some failures


def test_adopt_iff_improved(monkeypatch):
    """A deferred row keeps its rung-1 tokens when the retry's avg
    logprob is not better, and adopts the retry when it is."""
    eng = _engine()
    wins = _windows(2)
    monkeypatch.setenv("WJAV_DEFER_RETRY", "1")
    monkeypatch.setenv("WJAV_GATE_FAIL_PCT", "100")

    orig = TranscriptionEngine.decode_encoded
    mode = {"better": False}

    def rigged(self, xa, temperature=0.0, seed=0):
        res = orig(self, xa, 0.0, 0)      # deterministic payload
        if temperature > 0.0:
            import numpy as _np
            from whisperjav_tpu.models.whisper.decode import DecodeResult
            tok = _np.asarray(res.tokens).copy()
            tok[:, -1] = 42                        # visible marker
            avg = _np.asarray(res.avg_logprob)
            avg = avg + (1.0 if mode["better"] else -1.0)
            return DecodeResult(tok, _np.asarray(res.length),
                                _np.asarray(res.sum_logprob), avg,
                                _np.asarray(res.no_speech_prob))
        return res

    monkeypatch.setattr(TranscriptionEngine, "decode_encoded", rigged)

    mode["better"] = False
    keep = _flatten(eng.transcribe_windows(wins, seed=3))
    mode["better"] = True
    adopt = _flatten(eng.transcribe_windows(wins, seed=3))

    def any_marker(flat):
        return any(42 in toks for _, segs in flat for toks, _, _ in segs)

    assert not any_marker(keep)
    assert any_marker(adopt)


def test_single_temperature_disables_pool(monkeypatch):
    """A 1-rung ladder never defers (nothing to retry with)."""
    eng = _engine(temps=(0.0,))
    monkeypatch.setenv("WJAV_DEFER_RETRY", "1")
    monkeypatch.setenv("WJAV_GATE_FAIL_PCT", "100")
    wins = _windows(3)
    results = eng.transcribe_windows(wins, seed=3)
    assert sorted(w.group_idx for w, _ in results) == [0, 1, 2]
