"""Tests for native WAV codec + resampling."""

import numpy as np
import pytest

from whisperjav_tpu.modules.audio_io import (
    audio_duration, read_wav, resample, wav_info, write_wav, load_audio,
)


@pytest.mark.parametrize("subtype", ["pcm16", "float32"])
def test_wav_roundtrip(tmp_path, subtype):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, sr, subtype=subtype)
    y, rate = read_wav(p)
    assert rate == sr
    assert y.shape == x.shape
    tol = 1e-4 if subtype == "pcm16" else 1e-7
    assert np.max(np.abs(y - x)) < tol


def test_wav_info_duration(tmp_path):
    sr = 8000
    x = np.zeros(sr * 3, dtype=np.float32)
    p = tmp_path / "b.wav"
    write_wav(p, x, sr)
    info = wav_info(p)
    assert info.sample_rate == sr
    assert abs(info.duration - 3.0) < 1e-6
    assert abs(audio_duration(p) - 3.0) < 1e-6


def test_stereo_downmix(tmp_path):
    sr = 16000
    left = np.ones(sr, dtype=np.float32) * 0.5
    right = np.ones(sr, dtype=np.float32) * -0.5
    stereo = np.stack([left, right], axis=1)
    p = tmp_path / "c.wav"
    write_wav(p, stereo, sr)
    y, rate = read_wav(p, mono=True)
    assert y.shape == (sr,)
    assert np.max(np.abs(y)) < 1e-4  # L+R cancel


def test_resample_preserves_frequency():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert len(y) == sr_out
    # Dominant FFT bin should still be 1 kHz
    spec = np.abs(np.fft.rfft(y))
    freq = np.argmax(spec) * sr_out / len(y)
    assert abs(freq - 1000) < 5


def test_load_audio_resamples(tmp_path):
    sr = 44100
    x = np.zeros(sr, dtype=np.float32)
    p = tmp_path / "d.wav"
    write_wav(p, x, sr)
    y = load_audio(p, sample_rate=16000)
    assert abs(len(y) - 16000) <= 2
