"""Tests for STFT/ISTFT ops and the enhancement framework."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.modules.enhancement import (
    create_enhancer, enhance_scenes, get_extraction_sample_rate,
    is_passthrough_backend,
)
from whisperjav_tpu.ops.stft import istft, stft

SR = 16000


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, SR)).astype(np.float32) * 0.3
    r, i = stft(jnp.asarray(x), 400, 100)
    y = np.asarray(istft(r, i, SR, 400, 100))
    assert y.shape == x.shape
    # perfect reconstruction away from the edges
    err = np.abs(y[:, 400:-400] - x[:, 400:-400]).max()
    assert err < 1e-4


def test_stft_matches_scipy():
    from scipy.signal import stft as sp_stft
    rng = np.random.default_rng(1)
    x = rng.standard_normal(SR).astype(np.float32)
    r, i = stft(jnp.asarray(x[None]), 400, 100)
    ours = np.asarray(r)[0] + 1j * np.asarray(i)[0]
    _, _, ref = sp_stft(x, fs=SR, window="hann", nperseg=400, noverlap=300,
                        boundary="even", padded=False)
    # scipy normalizes by window sum; compare shapes + correlation instead
    n = min(ours.shape[1], ref.shape[1])
    c = np.corrcoef(np.abs(ours[:, :n]).ravel(), np.abs(ref[:, :n]).ravel())[0, 1]
    assert c > 0.999


def test_passthrough_and_negotiation():
    assert is_passthrough_backend("none")
    assert is_passthrough_backend(None)
    assert not is_passthrough_backend("zipenhancer")
    assert get_extraction_sample_rate("none") == 16000
    assert get_extraction_sample_rate("zipenhancer") == 16000
    enh = create_enhancer("none")
    res = enh.enhance(np.zeros(100, np.float32), SR)
    assert res.success


def test_dsp_enhancer_runs():
    rng = np.random.default_rng(2)
    t = np.arange(SR * 2) / SR
    x = (0.2 * np.sin(2 * np.pi * 200 * t)
         + 0.05 * np.sin(2 * np.pi * 50 * t)       # rumble to remove
         + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    enh = create_enhancer("dsp")
    res = enh.enhance(x, SR)
    assert res.success
    assert res.audio.shape == x.shape
    # highpass removed the 50 Hz rumble
    spec_in = np.abs(np.fft.rfft(x))
    spec_out = np.abs(np.fft.rfft(res.audio))
    bin50 = int(50 * len(t) / SR)
    assert spec_out[bin50] < spec_in[bin50] * 0.5


def test_zip_jax_graceful_without_weights():
    enh = create_enhancer("zipenhancer")
    x = np.zeros(SR, np.float32)
    res = enh.enhance(x, SR)
    assert not res.success           # degradation contract
    assert np.array_equal(res.audio, x)


def test_zip_jax_with_random_weights(tmp_path):
    from whisperjav_tpu.models.enhancement import zipnet
    params = zipnet.init_params(jax.random.PRNGKey(0), width=16)
    w = tmp_path / "zip.npz"
    zipnet.save_params(str(w), params)
    enh = create_enhancer("zipenhancer", weights=str(w), chunk_s=1.0,
                          crossfade_s=0.2)
    rng = np.random.default_rng(3)
    x = (0.1 * rng.standard_normal(int(SR * 2.5))).astype(np.float32)
    res = enh.enhance(x, SR)
    assert res.success
    assert res.audio.shape == x.shape
    assert np.isfinite(res.audio).all()


def test_enhance_scenes_never_raises():
    class Broken:
        name = "broken"
        is_lightweight = True
        def get_preferred_sample_rate(self):
            return SR
        def enhance(self, audio, sr):
            raise RuntimeError("boom")

    scenes = [np.ones(100, np.float32)]
    results = enhance_scenes(Broken(), scenes, SR)
    assert len(results) == 1
    assert not results[0].success
    assert np.array_equal(results[0].audio, scenes[0])


def test_zipnet_param_count():
    from whisperjav_tpu.models.enhancement import zipnet
    params = zipnet.init_params(jax.random.PRNGKey(0), width=48)
    count = zipnet.param_count(params)
    assert 1_000_000 < count < 4_000_000   # ZipEnhancer class (~2 M)


def test_enhance_for_vad_keeps_raw_asr_track():
    """Dual-track (--enhance-for-vad): the enhanced audio drives VAD only;
    decode windows slice the ORIGINAL samples (reference: main.py:551,
    1056-1057 enhance_for_vad pipeline kwarg)."""
    import numpy as np
    from whisperjav_tpu.pipelines.transcribe import TranscribePipeline

    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(6 * sr) / sr
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.standard_normal(6 * sr)).astype(np.float32)

    class _Eng:  # collect_windows never touches the engine
        pass

    def windows_for(enhance_for_vad):
        p = TranscribePipeline(
            _Eng(), scene_backend="none", vad_backend="energy",
            enhancer_backend="dsp", enhance_for_vad=enhance_for_vad,
            pack=False)
        return p.collect_windows(audio.copy(), sr)[0]

    dual = windows_for(True)
    assert dual, "expected at least one window"
    for w in dual:
        a = int(round(w.abs_start * sr))
        np.testing.assert_array_equal(
            w.audio[: int(w.duration * sr)],
            audio[a: a + int(w.duration * sr)])

    # sanity: the in-place (non-dual) path DOES alter the decoded samples
    inplace = windows_for(False)
    changed = any(
        not np.array_equal(
            w.audio[: int(w.duration * sr)],
            audio[int(round(w.abs_start * sr)):
                  int(round(w.abs_start * sr)) + int(w.duration * sr)])
        for w in inplace)
    assert changed
