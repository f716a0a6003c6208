"""Fused per-layer pallas decode kernels (WJAV_PALLAS_FUSE): parity.

Each sub-kernel (self-attention block / cross-attention block / MLP
block — ops/pallas/fused_decode.py) must reproduce the XLA column-cache
path's decode exactly in tokens and to float epsilon in logprobs, per
sub-kernel and combined. Runs in pallas interpret mode on the CPU
backend (the kernels auto-select interpret there); the on-chip numbers
live in docs/ADR-002.

NOTE on methodology: ``_greedy_loop`` is jitted on shapes/statics only,
so flipping module flags between same-shaped calls would silently reuse
the previous executable — every variant here clears the jit cache
first. Reference role anchor: CTranslate2's fused C++ decoder ops
(whisperjav/modules/faster_whisper_pro_asr.py:14).
"""

import numpy as np
import pytest

import jax

from whisperjav_tpu.models.whisper import model as wmodel
from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.decode import DecodeOptions, decode_greedy
from whisperjav_tpu.models.whisper.model import encode, init_params
from whisperjav_tpu.models.whisper.quant import (
    fuse_qkv_weights, quantize_decoder_weights,
)

CFG = WhisperConfig(name="fuse-tiny", n_audio_state=64, n_audio_head=4,
                    n_audio_layer=2, n_text_state=64, n_text_head=4,
                    n_text_layer=3)


@pytest.fixture(scope="module")
def setup():
    # the production decode representation the fused path requires:
    # fused-QKV int8 weights + int8 cross-KV (set per decode below)
    params = quantize_decoder_weights(
        fuse_qkv_weights(init_params(CFG, jax.random.PRNGKey(0))))
    mel = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                  (2, CFG.n_mels, CFG.n_audio_ctx * 2))
    xa = encode(params, CFG, mel)
    return params, xa


def _decode(params, xa, fuse, monkeypatch):
    monkeypatch.setattr(wmodel, "_PALLAS_FUSE", wmodel._parse_fuse(fuse))
    jax.clear_caches()      # module flags are not part of the jit key
    opts = DecodeOptions(max_new_tokens=8, cross_kv_int8=True)
    res = decode_greedy(params, CFG, xa, opts)
    return np.asarray(res.tokens), np.asarray(res.sum_logprob)


def test_parse_fuse():
    assert wmodel._parse_fuse("") == frozenset()
    assert wmodel._parse_fuse("0") == frozenset()
    assert wmodel._parse_fuse("1") == {"self", "cross", "mlp"}
    assert wmodel._parse_fuse("all") == {"self", "cross", "mlp"}
    assert wmodel._parse_fuse("cross") == {"cross"}
    assert wmodel._parse_fuse("self, mlp") == {"self", "mlp"}


@pytest.mark.parametrize("fuse", ["self", "cross", "mlp", "all"])
def test_fused_subset_parity(setup, monkeypatch, fuse):
    params, xa = setup
    t0, lp0 = _decode(params, xa, "", monkeypatch)
    t1, lp1 = _decode(params, xa, fuse, monkeypatch)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_allclose(lp0, lp1, rtol=1e-4, atol=1e-4)


def test_fused_requires_production_representation(setup, monkeypatch):
    """bf16/f32 (non-quantized) weights or bf16 cross-KV fall back to
    the XLA path rather than erroring."""
    params_plain = fuse_qkv_weights(init_params(CFG, jax.random.PRNGKey(0)))
    mel = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                  (2, CFG.n_mels, CFG.n_audio_ctx * 2))
    xa = encode(params_plain, CFG, mel)
    monkeypatch.setattr(wmodel, "_PALLAS_FUSE",
                        frozenset({"self", "cross", "mlp"}))
    jax.clear_caches()
    # non-quantized weights → gate off (would raise inside the kernel
    # call on the dict access if the gate were wrong)
    opts = DecodeOptions(max_new_tokens=4, cross_kv_int8=True)
    res = decode_greedy(params_plain, CFG, xa, opts)
    assert np.asarray(res.tokens).shape[0] == 2
    # quantized weights but bf16 cross-KV → gate off
    params, xa_q = setup
    opts = DecodeOptions(max_new_tokens=4, cross_kv_int8=False)
    res = decode_greedy(params, CFG, xa_q, opts)
    assert np.asarray(res.tokens).shape[0] == 2
    jax.clear_caches()
