"""Golden tests: JAX log-mel frontend vs transformers WhisperFeatureExtractor.

The feature extractor in `transformers` reimplements openai-whisper's
log_mel_spectrogram in numpy, making it a hermetic (no-network) oracle.
"""

import numpy as np
import pytest

from whisperjav_tpu.ops.mel import (
    N_SAMPLES, log_mel_spectrogram, mel_filterbank, pad_or_trim,
)


@pytest.fixture(scope="module")
def oracle():
    from transformers import WhisperFeatureExtractor
    return WhisperFeatureExtractor(feature_size=80)


def _rand_audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    # speech-ish: filtered noise + tones
    x = rng.standard_normal(n) * 0.1
    t = np.arange(n) / 16000
    x += 0.2 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 3 * t) > 0)
    return x.astype(np.float32)


def test_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank
    ref = mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=80, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney",
    )
    ours = mel_filterbank(80)
    assert ours.shape == (80, 201)
    np.testing.assert_allclose(ours, ref.T.astype(np.float32), atol=2e-6)


def test_log_mel_matches_whisper_feature_extractor(oracle):
    audio = pad_or_trim(_rand_audio(11.3), N_SAMPLES)
    ref = oracle(audio, sampling_rate=16000, return_tensors="np",
                 padding="max_length").input_features[0]  # (80, 3000)
    ours = np.asarray(log_mel_spectrogram(audio))
    assert ours.shape == ref.shape == (80, 3000)
    # float32 STFT vs the extractor's float64 numpy path: near-null spectral
    # bins deviate after log10 (the reference's own torch float32 STFT does
    # too), so the contract is tight-on-aggregate, loose-on-pointwise-max.
    d = np.abs(ours - ref)
    assert d.mean() < 1e-3
    assert np.quantile(d, 0.999) < 5e-3
    assert d.max() < 0.1
    c = np.corrcoef(ours.ravel(), ref.ravel())[0, 1]
    assert c > 0.9999


def test_log_mel_128_bins_shape():
    audio = pad_or_trim(_rand_audio(2.0), N_SAMPLES)
    out = np.asarray(log_mel_spectrogram(audio, n_mels=128))
    assert out.shape == (128, 3000)
    assert np.isfinite(out).all()


def test_log_mel_batched_matches_single(oracle):
    a = pad_or_trim(_rand_audio(5.0, seed=1), N_SAMPLES)
    b = pad_or_trim(_rand_audio(8.0, seed=2), N_SAMPLES)
    batch = np.stack([a, b])
    out = np.asarray(log_mel_spectrogram(batch))
    single_a = np.asarray(log_mel_spectrogram(a))
    np.testing.assert_allclose(out[0], single_a, atol=1e-5)


def test_pad_or_trim():
    x = np.ones(100, np.float32)
    assert pad_or_trim(x, 50).shape == (50,)
    y = pad_or_trim(x, 200)
    assert y.shape == (200,)
    assert y[150] == 0.0
