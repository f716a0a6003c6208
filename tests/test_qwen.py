"""Tests for the Qwen3-ASR-class model and ForcedAligner."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.qwen.aligner import (
    AlignerConfig, ForcedAligner, merge_master_with_timestamps,
    monotonic_align,
)
from whisperjav_tpu.models.qwen.model import (
    QWEN_SIZES, QwenASRConfig, encode_audio, generate, init_params,
    lm_step, LMCache, token_budget,
)

CFG = QwenASRConfig()   # test-size config


@pytest.fixture(scope="module")
def qwen_model():
    return init_params(CFG, jax.random.PRNGKey(0))


def test_audio_tower_shapes(qwen_model):
    mel = jnp.zeros((2, 128, 400), jnp.float32)
    emb = encode_audio(qwen_model, CFG, mel)
    # AuT: 200-frame chunks → 25 tokens each (×8 downsampling)
    assert emb.shape == (2, CFG.audio_tokens_for(400), CFG.d_model)
    assert emb.shape[1] == 50
    assert bool(jnp.isfinite(emb).all())


def test_lm_incremental_matches_full(qwen_model):
    """KV-cached chunked LM forward == one full pass."""
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 10)).astype(np.int32))
    emb = qwen_model["tok_emb"][ids]
    cache = LMCache.zeros(CFG, 2, 10, jnp.float32)
    full, _ = lm_step(qwen_model, CFG, emb, 0, cache)

    cache = LMCache.zeros(CFG, 2, 10, jnp.float32)
    l1, cache = lm_step(qwen_model, CFG, emb[:, :4], 0, cache)
    l2, cache = lm_step(qwen_model, CFG, emb[:, 4:], 4, cache)
    stepped = jnp.concatenate([l1, l2], axis=1)
    assert float(jnp.max(jnp.abs(stepped - full))) < 1e-3


def test_generate_structure(qwen_model):
    mel = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 128, 400)).astype(np.float32))
    res = generate(qwen_model, CFG, mel, max_new=12, audio_len=50,
                   repetition_penalty=1.3)
    toks = np.asarray(res.tokens)
    assert toks.shape == (2, 12)
    assert np.isfinite(np.asarray(res.avg_logprob)).all()
    # eos padding invariant
    for row in toks:
        seen = False
        for t in row:
            if seen:
                assert t == CFG.eos_id
            if t == CFG.eos_id:
                seen = True


def test_token_budget():
    assert token_budget(CFG, 10.0) == 120
    assert token_budget(CFG, 1.0) == CFG.min_token_budget   # floor


def test_sizes_registry():
    assert "qwen3-asr-1.7b" in QWEN_SIZES
    big = QWEN_SIZES["qwen3-asr-1.7b"]
    assert big.n_kv_heads < big.n_heads   # GQA


class TestMonotonicAlign:
    def test_diagonal_preference(self):
        # log-probs strongly diagonal → near-even spans
        n, t = 4, 12
        lp = np.full((n, t), -10.0)
        for i in range(n):
            lp[i, i * 3:(i + 1) * 3] = 0.0
        spans = monotonic_align(lp)
        assert len(spans) == 4
        assert spans[0][0] == 0
        assert spans[-1][1] == t
        # monotonic non-overlapping coverage
        for (a1, b1), (a2, b2) in zip(spans[:-1], spans[1:]):
            assert b1 == a2
            assert b1 > a1

    def test_degenerate_fewer_frames(self):
        spans = monotonic_align(np.zeros((5, 3)))
        assert len(spans) == 5
        assert all(b > a for a, b in spans)

    def test_empty(self):
        assert monotonic_align(np.zeros((0, 10))) == []


class TestDeviceAlign:
    """The fused on-device Viterbi (align_spans/_dp_backtrack) must
    match the host monotonic_align DP exactly."""

    def test_dp_backtrack_matches_host(self):
        from whisperjav_tpu.models.qwen.aligner import _dp_backtrack
        rng = np.random.default_rng(7)
        n_pad, t_pad = 24, 40
        for n, t in [(1, 1), (1, 9), (3, 3), (5, 24), (17, 40),
                     (24, 40), (2, 37)]:
            # integer-valued log-probs are exact in float32, so the
            # f32 device DP and the f64 host DP take identical branches
            lp = rng.integers(-8, 0, (n_pad, t_pad)).astype(np.float32)
            lp[:, t:] = -1e30
            starts, ends = _dp_backtrack(
                jnp.asarray(lp), jnp.int32(t), jnp.int32(n))
            got = list(zip(np.asarray(starts)[:n].tolist(),
                           np.asarray(ends)[:n].tolist()))
            want = monotonic_align(lp[:n, :t].astype(np.float64))
            assert got == want, (n, t)

    def test_align_batch_audio_matches_split_path(self):
        from whisperjav_tpu.ops.mel import log_mel_spectrogram
        cfg = AlignerConfig(n_layers=2, d_model=64, n_heads=4)
        aligner = ForcedAligner(cfg)
        rng = np.random.default_rng(3)
        sr = 16000
        t_samples = 2 * sr                       # 2 s bucket
        lens = [t_samples, sr, sr // 2]
        audio = np.zeros((4, t_samples), np.float32)
        for r, ln in enumerate(lens):
            audio[r, :ln] = rng.standard_normal(ln).astype(np.float32) * 0.1
        # quantize once so both paths see identical samples
        a16 = (np.clip(audio, -1, 1) * 32767).astype(np.int16)
        af = a16.astype(np.float32) / 32767.0
        token_rows = [[5, 17, 99], [3, 2], [1], []]
        got = aligner.align_batch_audio(af, token_rows, lens + [0],
                                        n_pad=8)
        mels = np.asarray(log_mel_spectrogram(jnp.asarray(af),
                                              n_mels=cfg.n_mels))
        mel_valid = [-(-ln // 160) for ln in lens] + [0]
        want = aligner.align_batch(mels, token_rows, mel_valid, n_pad=8)
        assert got == want

    def test_align_batch_audio_degenerate_row(self):
        cfg = AlignerConfig(n_layers=2, d_model=64, n_heads=4)
        aligner = ForcedAligner(cfg)
        sr = 16000
        audio = np.zeros((1, sr), np.float32)
        valid = 800                               # 5 mel → 2 conv frames
        tokens = [[9, 8, 7, 6, 5]]                # 5 tokens > 2 frames
        spans = aligner.align_batch_audio(audio, tokens, [valid])[0]
        assert len(spans) == 5
        assert all(s.end > s.start for s in spans)
        assert spans[0].start == 0.0


def test_forced_aligner_end_to_end():
    aligner = ForcedAligner(AlignerConfig(n_layers=2, d_model=64, n_heads=4))
    mel = np.random.default_rng(2).standard_normal((128, 200)).astype(np.float32)
    spans = aligner.align(mel, [5, 17, 99, 3])
    assert len(spans) == 4
    # monotonic, inside the audio
    for s in spans:
        assert 0 <= s.start <= s.end <= 200 / 4 * 0.04 + 1e-6
    for a, b in zip(spans[:-1], spans[1:]):
        assert b.start >= a.start


def test_merge_master_with_timestamps():
    from whisperjav_tpu.models.qwen.aligner import TokenSpan
    master = "こんにちは、世界！"
    aligned = [TokenSpan(1, 0.0, 0.5), TokenSpan(2, 0.6, 1.0)]
    token_texts = ["こんにちは", "世界"]
    pieces = merge_master_with_timestamps(master, aligned, token_texts)
    joined = "".join(p[0] for p in pieces)
    assert joined == master
    # punctuation got timestamps between/after the word spans
    assert pieces[0] == ("こんにちは", 0.0, 0.5)
    assert pieces[1][0] == "、"
    assert pieces[-1][0] == "！"


def test_generate_with_context_prefix(qwen_model):
    """ctx_ids insert between audio prefix and BOS (reference:
    main.py:676-681 --context contextual biasing); generation stays
    structurally valid and DIFFERS from the unconditioned decode."""
    mel = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 128, 400)).astype(np.float32))
    ctx = jnp.asarray(
        np.random.default_rng(3).integers(
            0, CFG.vocab_size, (1, 7)).astype(np.int32))
    res = generate(qwen_model, CFG, mel, max_new=10, audio_len=50,
                   repetition_penalty=1.0, ctx_ids=ctx)
    base = generate(qwen_model, CFG, mel, max_new=10, audio_len=50,
                    repetition_penalty=1.0)
    toks = np.asarray(res.tokens)
    assert toks.shape == (2, 10)
    assert np.isfinite(np.asarray(res.avg_logprob)).all()
    assert not np.array_equal(toks, np.asarray(base.tokens))


def test_fused_lm_qkv_exact_parity(qwen_model):
    """fuse_lm_qkv is a pure weight re-layout: generate() tokens are
    identical (logprobs to float epsilon — XLA may re-block the wider
    reduction), the op is idempotent, and the column blocks are the
    original projections (GQA: q is nh*hd wide, k/v are nkv*hd)."""
    from whisperjav_tpu.models.qwen.model import fuse_lm_qkv
    fused = fuse_lm_qkv(qwen_model)
    assert fused is not fuse_lm_qkv(fused) or "wqkv" in fused["blocks"]
    assert "wq" not in fused["blocks"]
    qd = CFG.n_heads * CFG.head_dim
    kvd = CFG.n_kv_heads * CFG.head_dim
    assert fused["blocks"]["wqkv"].shape[-1] == qd + 2 * kvd
    np.testing.assert_array_equal(fused["blocks"]["wqkv"][..., :qd],
                                  qwen_model["blocks"]["wq"])
    np.testing.assert_array_equal(
        fused["blocks"]["wqkv"][..., qd + kvd:],
        qwen_model["blocks"]["wv"])

    rng = np.random.default_rng(5)
    mel = jnp.asarray(0.1 * rng.standard_normal((1, 128, 400)),
                      jnp.float32)
    a = generate(qwen_model, CFG, mel, max_new=10, audio_len=40,
                 repetition_penalty=1.1)
    b = generate(fused, CFG, mel, max_new=10, audio_len=40,
                 repetition_penalty=1.1)
    np.testing.assert_array_equal(np.asarray(a.tokens),
                                  np.asarray(b.tokens))
    # XLA may re-block the wider matmul's reduction: same math, float-
    # epsilon rounding drift allowed on the summed logprob
    np.testing.assert_allclose(np.asarray(a.avg_logprob),
                               np.asarray(b.avg_logprob),
                               rtol=1e-5, atol=1e-5)


def test_int8_lm_weights_track_fp(qwen_model):
    """int8 LM weights+head (quantize_lm_weights) stay close to the fp
    generate on a tiny model — same lever and tolerance class as
    whisper's int8 decoder weights (test_decode.py). Measured on
    hardware 2026-08-19: +22% RTF (135.8x vs 111.7x, docs/ADR-002),
    default ON in the generator/bench (WJAV_QWEN_INT8=0 ablates)."""
    from whisperjav_tpu.models.qwen.model import (
        fuse_lm_qkv, quantize_lm_weights,
    )
    fused = fuse_lm_qkv(qwen_model)
    q = quantize_lm_weights(fused)
    assert "lm_head_q" not in fused and "lm_head" in fused
    assert isinstance(q["blocks"]["wqkv"], dict)
    assert q["blocks"]["wqkv"]["q"].dtype == jnp.int8
    assert "lm_head" not in q and q["lm_head_q"]["q"].dtype == jnp.int8
    # idempotent: already-quantized leaves are skipped
    q2 = quantize_lm_weights(q)
    assert q2["blocks"]["wqkv"] is q["blocks"]["wqkv"]

    # teacher-forced single-pass logits (no free-running compounding —
    # random-init logits are near-flat, so sequential token agreement
    # only measures the first tie-flip, not quantization error)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 10)
                                   ).astype(np.int32))
    cache_a = LMCache.zeros(CFG, 2, 10, jnp.float32)
    cache_b = LMCache.zeros(CFG, 2, 10, jnp.float32)
    la, _ = lm_step(fused, CFG, fused["tok_emb"][ids], 0, cache_a)
    lb, _ = lm_step(q, CFG, q["tok_emb"][ids], 0, cache_b)
    la, lb = np.asarray(la, np.float32), np.asarray(lb, np.float32)
    cos = np.sum(la * lb, -1) / (
        np.linalg.norm(la, axis=-1) * np.linalg.norm(lb, axis=-1))
    assert float(cos.min()) > 0.99, f"int8 logits diverged: {cos.min()}"
    top1 = float(np.mean(la.argmax(-1) == lb.argmax(-1)))
    assert top1 > 0.7, f"int8 top-1 agreement {top1:.2f}"
