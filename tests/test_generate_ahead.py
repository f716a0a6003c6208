"""Generate-ahead pipelining in the Qwen generator (ADR-002):
`QwenGenerator.generate_batch` dispatches batch i+1's `generate` before
draining batch i's tokens — the same bubble-removal class as the
whisper engine's encode-ahead, applied to the decoupled pipeline's
generator stage.

The lever reorders host/device work only — results must be identical
in content AND order to the serial path. Reference behavior anchor:
the reference's qwen generator transcribes segment batches serially
(whisperjav/modules/qwen_asr.py); the TPU redesign overlaps the next
dispatch with the current drain/detokenize.
"""

import numpy as np

from whisperjav_tpu.modules.subtitle_pipeline.components import QwenGenerator

SR = 16000


def _clips(n):
    rng = np.random.default_rng(3)
    return [
        (0.2 * np.sin(2 * np.pi * (150 + 40 * i)
                      * np.arange(int((0.8 + 0.3 * i) * SR)) / SR)
         + 0.02 * rng.standard_normal(int((0.8 + 0.3 * i) * SR))
         ).astype(np.float32)
        for i in range(n)
    ]


def _run(monkeypatch, ahead: str, clips):
    monkeypatch.setenv("WJAV_GENERATE_AHEAD", ahead)
    gen = QwenGenerator(model_size="qwen3-asr-test", batch_size=2)
    gen.load()
    return gen.generate_batch(clips, SR)


def test_generate_ahead_identical_results(monkeypatch):
    """Odd clip count (partial last batch) + multiple batches: the
    pipelined path returns the same frames, texts, and logprobs in the
    same order as the serial path."""
    clips = _clips(5)
    ahead = _run(monkeypatch, "1", clips)
    serial = _run(monkeypatch, "0", clips)
    assert len(ahead) == len(serial) == 5
    for a, s in zip(ahead, serial):
        assert a.frame_index == s.frame_index
        assert a.text == s.text
        np.testing.assert_allclose(a.avg_logprob, s.avg_logprob,
                                   rtol=1e-6, atol=1e-6)


def test_generate_ahead_single_batch(monkeypatch):
    """One batch (the pending slot drains after the loop)."""
    clips = _clips(2)
    ahead = _run(monkeypatch, "1", clips)
    serial = _run(monkeypatch, "0", clips)
    assert [r.text for r in ahead] == [r.text for r in serial]
    assert [r.frame_index for r in ahead] == [0, 1]
