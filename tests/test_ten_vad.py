"""TEN-class VAD: model semantics (torch twin), post-chain, backend."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.vad import ten
from whisperjav_tpu.modules.segmentation.base import create_segmenter
from whisperjav_tpu.modules.segmentation.ten_jax import TenJaxSegmenter

SR = 16000


def speech_like(duration_s, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))
    x += 0.05 * rng.standard_normal(n)
    return x.astype(np.float32)


def test_model_shapes_and_range():
    params = ten.init_params(jax.random.PRNGKey(0))
    audio = jnp.asarray(speech_like(2.0)[None, :ten.HOP * 100])
    probs = np.asarray(ten.apply(params, audio))
    assert probs.shape == (1, 100)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_pitch_feature_discriminates():
    """The pitch-salience feature is high for periodic (voiced) frames and
    low for white noise — the signal the model family is built on."""
    params = ten.init_params(jax.random.PRNGKey(0))
    t = np.arange(SR) / SR
    voiced = (0.5 * np.sin(2 * np.pi * 150 * t)).astype(np.float32)
    noise = (0.5 * np.random.default_rng(0).standard_normal(SR)
             ).astype(np.float32)
    fv = np.asarray(ten.frame_features(jnp.asarray(voiced[None])))
    fn = np.asarray(ten.frame_features(jnp.asarray(noise[None])))
    assert fv[0, 10:-10, -1].mean() > fn[0, 10:-10, -1].mean() + 0.3


def test_lstm_matches_torch_cell():
    """The recurrent core follows torch LSTMCell semantics so a trained
    torch checkpoint ports layer-exactly."""
    torch = pytest.importorskip("torch")

    params = ten.init_params(jax.random.PRNGKey(1))
    cell = torch.nn.LSTMCell(ten.HIDDEN, ten.HIDDEN)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(params["lstm_wi"])))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(params["lstm_wh"])))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(params["lstm_bi"])))
        cell.bias_hh.copy_(torch.from_numpy(np.asarray(params["lstm_bh"])))

    rng = np.random.default_rng(2)
    xs = rng.standard_normal((5, 1, ten.HIDDEN)).astype(np.float32)

    h = torch.zeros(1, ten.HIDDEN)
    c = torch.zeros(1, ten.HIDDEN)
    with torch.no_grad():
        torch_hs = []
        for x in xs:
            h, c = cell(torch.from_numpy(x), (h, c))
            torch_hs.append(h.numpy().copy())

    wi = np.asarray(params["lstm_wi"])
    wh = np.asarray(params["lstm_wh"])
    bias = np.asarray(params["lstm_bi"]) + np.asarray(params["lstm_bh"])
    hj = np.zeros((1, ten.HIDDEN), np.float32)
    cj = np.zeros((1, ten.HIDDEN), np.float32)
    for x, th in zip(xs, torch_hs):
        gates = x @ wi.T + hj @ wh.T + bias
        i, f, g, o = np.split(gates, 4, axis=-1)
        sig = lambda v: 1 / (1 + np.exp(-v))   # noqa: E731
        cj = sig(f) * cj + sig(i) * np.tanh(g)
        hj = sig(o) * np.tanh(cj)
        np.testing.assert_allclose(hj, th, atol=1e-5)


def test_backend_energy_fallback_and_post_chain():
    audio = np.concatenate([speech_like(2), np.zeros(SR, np.float32),
                            speech_like(2, seed=1)])
    seg = create_segmenter("ten").segment(audio, SR)
    assert seg.backend == "ten-jax"
    assert len(seg.segments) >= 1
    assert seg.groups


def test_split_at_probability_minima():
    """An overlong segment splits at the smoothed-probability minimum,
    not evenly (reference ten.py:448-515)."""
    seg = TenJaxSegmenter(max_speech_duration_s=4.0)
    # 8 s of strictly-rising probs (no spurious minima) with a dip at 4.5 s
    n = int(8.0 / 0.016)
    probs = np.linspace(0.6, 0.95, n).astype(np.float32)
    dip = int(4.5 / 0.016)
    probs[dip - 8:dip + 8] = 0.2
    out = seg._split_at_minima([(0.0, 8.0)], probs)
    assert len(out) == 2
    assert abs(out[0][1] - 4.5) < 0.4          # split lands on the dip


def test_model_backend_runs(tmp_path):
    params = ten.init_params(jax.random.PRNGKey(3))
    w = tmp_path / "ten.npz"
    ten.save_params(str(w), params)
    seg = TenJaxSegmenter(weights=str(w))
    audio = speech_like(3.0)
    res = seg.segment(audio, SR)
    assert res.stats["model"] == "jax"
