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


def _build_extensible(payload, fmt_code, bits, sr=16000, ch=1):
    import struct
    guid_rest = bytes.fromhex("000000001000800000aa00389b71")
    ext = struct.pack("<HI", bits, 0x4) + struct.pack("<H", fmt_code) + guid_rest
    fmt = (struct.pack("<HHIIHH", 0xFFFE, ch, sr, sr * ch * bits // 8,
                       ch * bits // 8, bits)
           + struct.pack("<H", len(ext)) + ext)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)


def test_wave_format_extensible_float_and_pcm(tmp_path):
    """EXTENSIBLE WAVs must decode via the SubFormat GUID: float32 bits
    interpreted as int32 silently corrupt audio otherwise."""
    x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
         ).astype(np.float32)
    fp = tmp_path / "ext_f32.wav"
    fp.write_bytes(_build_extensible(x.astype("<f4").tobytes(), 3, 32))
    y, rate = read_wav(fp)
    assert rate == 16000
    np.testing.assert_allclose(y, x, atol=1e-7)
    assert wav_info(fp).audio_format == 3

    pcm = np.clip(np.round(x.astype(np.float64) * 2147483647),
                  -2**31, 2**31 - 1).astype("<i4")
    ip = tmp_path / "ext_i32.wav"
    ip.write_bytes(_build_extensible(pcm.tobytes(), 1, 32))
    y2, _ = read_wav(ip)
    np.testing.assert_allclose(y2, x, atol=1e-6)
