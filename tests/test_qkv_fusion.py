"""Fused QKV projection + layer-scan unroll: exact-parity levers.

Both reorder device work only (docs/ADR-002 per-layer kernel-count
attribution); outputs must match the separate-projection / plain-scan
paths exactly. Reference role anchor: CTranslate2 fuses qkv into one
GEMM internally (the reference gets this for free via faster-whisper);
the JAX rebuild does it at weight-prep time.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

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
    params = init_params(CFG, jax.random.PRNGKey(0))
    mel = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                  (2, CFG.n_mels, CFG.n_audio_ctx * 2))
    xa = encode(params, CFG, mel.astype(params["decoder"]["tok_emb"].dtype))
    return params, xa


def _decode(params, xa, **opt_kw):
    # module flags (_COLUMN_CACHE/_SCAN_UNROLL/...) are not part of the
    # jit key: without clearing, a monkeypatched flag flip between
    # same-shaped calls would silently reuse the previous executable and
    # the parity assertion would compare an executable against itself
    jax.clear_caches()
    opts = DecodeOptions(max_new_tokens=10, **opt_kw)
    res = decode_greedy(params, CFG, xa, opts)
    return np.asarray(res.tokens), np.asarray(res.sum_logprob)


def test_fused_qkv_exact_parity(setup):
    params, xa = setup
    fused = fuse_qkv_weights(params)
    assert "wqkv" in fused["decoder"]["blocks"]
    assert "wq" not in fused["decoder"]["blocks"]
    d = CFG.n_text_state
    assert fused["decoder"]["blocks"]["wqkv"].shape == (
        CFG.n_text_layer, d, 3 * d)
    t0, lp0 = _decode(params, xa)
    t1, lp1 = _decode(fused, xa)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(lp0, lp1)


def test_fused_qkv_bitwise_weight_columns(setup):
    """The fused matmul's column blocks ARE the original projections."""
    params, _ = setup
    blocks = params["decoder"]["blocks"]
    fused = fuse_qkv_weights(params)["decoder"]["blocks"]
    d = CFG.n_text_state
    np.testing.assert_array_equal(fused["wqkv"][..., :d], blocks["wq"])
    np.testing.assert_array_equal(fused["wqkv"][..., d:2 * d], blocks["wk"])
    np.testing.assert_array_equal(fused["wqkv"][..., 2 * d:], blocks["wv"])
    np.testing.assert_array_equal(fused["bqkv"][..., d:2 * d],
                                  np.zeros_like(blocks["bq"]))


def test_quantize_after_fuse_matches_fuse_after_quantize(setup):
    """Per-output-channel scales commute with the column concat."""
    params, _ = setup
    qf = quantize_decoder_weights(fuse_qkv_weights(params))
    fq_blocks = quantize_decoder_weights(params)["decoder"]["blocks"]
    qf_blocks = qf["decoder"]["blocks"]
    d = CFG.n_text_state
    np.testing.assert_array_equal(
        np.asarray(qf_blocks["wqkv"]["q"][..., :d]),
        np.asarray(fq_blocks["wq"]["q"]))
    np.testing.assert_array_equal(
        np.asarray(qf_blocks["wqkv"]["q"][..., 2 * d:]),
        np.asarray(fq_blocks["wv"]["q"]))
    np.testing.assert_array_equal(
        np.asarray(qf_blocks["wqkv"]["s"][..., :d]),
        np.asarray(fq_blocks["wq"]["s"]))


def test_fused_int8_decode_parity(setup):
    params, xa = setup
    a = quantize_decoder_weights(params)
    b = quantize_decoder_weights(fuse_qkv_weights(params))
    t0, lp0 = _decode(a, xa)
    t1, lp1 = _decode(b, xa)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(lp0, lp1)


def test_scan_unroll_exact_parity(setup, monkeypatch):
    params, xa = setup
    t0, lp0 = _decode(params, xa)
    monkeypatch.setattr(wmodel, "_SCAN_UNROLL", 3)   # odd, n_layer=3
    t1, lp1 = _decode(params, xa)
    monkeypatch.setattr(wmodel, "_SCAN_UNROLL", 2)   # non-divisor unroll
    t2, lp2 = _decode(params, xa)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(t0, t2)
    np.testing.assert_array_equal(lp0, lp1)
    np.testing.assert_array_equal(lp0, lp2)


def test_engine_prepare_fuses_by_default(setup, monkeypatch):
    from whisperjav_tpu.pipelines.engine import (
        QualityThresholds, TranscriptionEngine,
    )
    params, _ = setup
    monkeypatch.delenv("WJAV_FUSE_QKV", raising=False)
    eng = TranscriptionEngine(
        CFG, params, options=DecodeOptions(max_new_tokens=8),
        thresholds=QualityThresholds(temperatures=(0.0,)), batch_size=2)
    assert "wqkv" in eng.params["decoder"]["blocks"]
    monkeypatch.setenv("WJAV_FUSE_QKV", "0")
    eng_off = TranscriptionEngine(
        CFG, params, options=DecodeOptions(max_new_tokens=8),
        thresholds=QualityThresholds(temperatures=(0.0,)), batch_size=2)
    assert "wq" in eng_off.params["decoder"]["blocks"]
    # identical transcriptions through the full engine
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal((2, 16000 * 30))).astype(np.float32)
    r1 = eng.decode_batch(audio)
    r0 = eng_off.decode_batch(audio)
    np.testing.assert_array_equal(np.asarray(r1.tokens),
                                  np.asarray(r0.tokens))


def test_column_cache_exact_parity(setup, monkeypatch):
    """Column-cache decode (WJAV_COLUMN_CACHE): same logit set — the new
    key's logit is concatenated instead of written-then-read — so tokens
    are identical and logprobs agree to float epsilon."""
    params, xa = setup
    monkeypatch.setattr(wmodel, "_COLUMN_CACHE", False)
    t0, lp0 = _decode(params, xa)
    monkeypatch.setattr(wmodel, "_COLUMN_CACHE", True)
    t1, lp1 = _decode(params, xa)
    # composed with fusion + unroll
    monkeypatch.setattr(wmodel, "_SCAN_UNROLL", 2)
    from whisperjav_tpu.models.whisper.quant import fuse_qkv_weights
    t2, lp2 = _decode(fuse_qkv_weights(params), xa)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_array_equal(t0, t2)
    np.testing.assert_allclose(lp0, lp1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(lp0, lp2, rtol=1e-5, atol=1e-5)


def test_column_cache_int8_kv_parity(setup, monkeypatch):
    """Column mode composes with the int8 weight tree + int8 cross-KV
    (the production bench configuration)."""
    params, xa = setup
    q = quantize_decoder_weights(params)
    monkeypatch.setattr(wmodel, "_COLUMN_CACHE", False)
    t0, lp0 = _decode(q, xa, cross_kv_int8=True)
    monkeypatch.setattr(wmodel, "_COLUMN_CACHE", True)
    t1, lp1 = _decode(q, xa, cross_kv_int8=True)
    np.testing.assert_array_equal(t0, t1)
    np.testing.assert_allclose(lp0, lp1, rtol=1e-5, atol=1e-5)
