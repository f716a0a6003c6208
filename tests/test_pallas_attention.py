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
