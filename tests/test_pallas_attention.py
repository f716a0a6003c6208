"""Pallas encoder-attention kernel vs the XLA reference (interpret mode
on CPU; the TPU path is exercised by bench/production)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.whisper.model import attention as xla_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    # CPU test runner: run the pallas kernel in interpreter mode
    import jax._src.pallas.pallas_call as pc
    monkeypatch.setenv("JAX_PALLAS_USE_INTERPRET", "1")
    yield


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed)
                       .standard_normal(shape).astype(np.float32) * 0.3)


@pytest.mark.parametrize("t", [256, 1500])
def test_matches_xla_attention(t):
    from jax.experimental import pallas as pl
    from whisperjav_tpu.ops.pallas import attention as pa

    b, h, hd = 2, 4, 64
    q = _rand((b, t, h, hd), 0)
    k = _rand((b, t, h, hd), 1)
    v = _rand((b, t, h, hd), 2)

    ref = np.asarray(xla_attention(q, k, v))
    with pltpu_interpret():
        out = np.asarray(pa.encoder_attention(q, k, v))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3)


def pltpu_interpret():
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.force_tpu_interpret_mode()


def test_decode_cross_attention_matches_einsum_path():
    """Pallas decode cross-attention (int8 K/V, scales folded) == the
    XLA einsum path in models.whisper.model.cross_attention."""
    from whisperjav_tpu.models.whisper.model import cross_attention
    from whisperjav_tpu.ops.pallas.decode_attention import (
        decode_cross_attention,
    )
    b, h, hd, t = 2, 4, 64, 256
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((b, 1, h, hd)).astype(np.float32))
    kf = rng.standard_normal((b, h, hd, t)).astype(np.float32)
    vf = rng.standard_normal((b, h, hd, t)).astype(np.float32)
    ks = (np.abs(kf).max(axis=(2, 3), keepdims=True) / 127.0 + 1e-9)
    vs = (np.abs(vf).max(axis=(2, 3), keepdims=True) / 127.0 + 1e-9)
    k8 = jnp.asarray(np.clip(np.round(kf / ks), -127, 127).astype(np.int8))
    v8 = jnp.asarray(np.clip(np.round(vf / vs), -127, 127).astype(np.int8))
    ksj = jnp.asarray(ks.astype(np.float32))
    vsj = jnp.asarray(vs.astype(np.float32))

    ref = np.asarray(cross_attention(q, k8, v8, ksj, vsj))  # (B,1,H,hd)

    scale = hd ** -0.25
    qf = (q[:, 0] * (scale * scale) * ksj[:, :, 0, 0][..., None])
    with pltpu_interpret():
        out = np.asarray(decode_cross_attention(qf, k8, v8,
                                                interpret=True))
    out = out * np.asarray(vsj)[:, :, 0, 0][..., None]
    np.testing.assert_allclose(out[:, None], ref, atol=2e-3, rtol=2e-3)


def test_pallas_decode_path_matches_einsum_decode(monkeypatch):
    """Full decode with WJAV_PALLAS_DECODE (interpret mode) == the XLA
    einsum decode: same tokens, same logprobs."""
    import whisperjav_tpu.models.whisper.model as wm
    from whisperjav_tpu.models.whisper.config import WhisperConfig
    from whisperjav_tpu.models.whisper.decode import (
        DecodeOptions, decode_greedy,
    )
    from whisperjav_tpu.models.whisper.model import encode, init_params

    cfg = WhisperConfig(name="pd-tiny", n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2, n_text_state=64, n_text_head=4,
                        n_text_layer=2, n_audio_ctx=100)
    params = init_params(cfg, jax.random.PRNGKey(11))
    mel = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 80, 200)).astype(np.float32))
    xa = encode(params, cfg, mel)
    opts = DecodeOptions(max_new_tokens=10, cross_kv_int8=True)

    ref = decode_greedy(params, cfg, xa, opts)
    monkeypatch.setattr(wm, "_PALLAS_DECODE", True)
    # the flag is read at trace time but is not part of the jit cache
    # key — clear caches so the pallas graph actually traces
    jax.clear_caches()
    from whisperjav_tpu.ops.pallas import decode_attention as da
    calls = {"n": 0}
    real = da.decode_cross_attention_stacked

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(da, "decode_cross_attention_stacked", spy)
    with pltpu_interpret():
        out = decode_greedy(params, cfg, xa, opts)
    assert calls["n"] > 0, "pallas decode path was never traced"
    assert np.array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))
    np.testing.assert_allclose(np.asarray(ref.avg_logprob),
                               np.asarray(out.avg_logprob),
                               atol=1e-3, rtol=1e-3)
    jax.clear_caches()   # don't leak pallas-traced executables
