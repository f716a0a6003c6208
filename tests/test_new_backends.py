"""Tests for whisper-vad segmenter, silero scene backend, fuzzy matching."""

import numpy as np
import pytest

import jax

from whisperjav_tpu.modules.sanitize.hallucinations import HallucinationRemover
from whisperjav_tpu.modules.scene_detection import create_scene_detector
from whisperjav_tpu.modules.segmentation import create_segmenter

SR = 16000


def speech_like(duration_s, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_fuzzy_hallucination_matching():
    hr = HallucinationRemover("ja")
    # near-miss of a blacklisted phrase (one char changed)
    assert hr.is_hallucination("ご視聴ありがとうございましたあ")
    assert hr.is_hallucination("ご視聴ありがとうごさいました")
    # unrelated text of similar length is NOT matched
    assert not hr.is_hallucination("今日は東京タワーに行きました")


def test_silero_scene_backend():
    audio = np.concatenate([speech_like(4), np.zeros(3 * SR, np.float32),
                            speech_like(35, 1)])
    det = create_scene_detector("silero-scene", max_scene_duration_s=29.0)
    result = det.detect(audio, SR)
    assert result.backend == "silero-scene"
    assert all(s.duration <= 29.01 for s in result.scenes)
    assert len(result.scenes) >= 2


@pytest.mark.slow
def test_whisper_vad_segmenter():
    """Tiny random whisper as VAD: plumbing + shapes (probs are random)."""
    from whisperjav_tpu.models.whisper.config import WhisperConfig
    from whisperjav_tpu.models.whisper.decode import DecodeOptions
    from whisperjav_tpu.models.whisper.model import init_params
    from whisperjav_tpu.modules.segmentation.whisper_vad import (
        WhisperVadSegmenter,
    )
    from whisperjav_tpu.pipelines.engine import (
        QualityThresholds, TranscriptionEngine,
    )

    TINY = WhisperConfig(name="wv-tiny", n_audio_state=64, n_audio_head=4,
                         n_audio_layer=2, n_text_state=64, n_text_head=4,
                         n_text_layer=2)
    engine = TranscriptionEngine(
        TINY, init_params(TINY, jax.random.PRNGKey(0)),
        options=DecodeOptions(max_new_tokens=1, with_timestamps=False),
        thresholds=QualityThresholds(temperatures=(0.0,)), batch_size=4)
    seg = WhisperVadSegmenter(engine=engine, batch_size=4)
    audio = speech_like(12)
    probs = seg.window_speech_probs(audio, SR)
    assert probs.shape[0] >= 3
    assert ((probs >= 0) & (probs <= 1)).all()
    result = seg.segment(audio, SR)
    assert result.backend == "whisper-vad"
    assert result.stats["windows_scored"] == len(probs)
