"""Parity tests: JAX Whisper vs transformers torch-CPU with shared weights.

A random-initialized HF WhisperForConditionalGeneration is the numeric
oracle: its state dict is converted to our scan-stacked pytree, and
encoder states / teacher-forced logits must match to float32 tolerance.
This validates every layer (convs, attention, LN, MLP, tying) without any
network access or pretrained checkpoint.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import (
    KVCache, decode_step, decode_train, encode, forward, init_params,
    precompute_cross_kv,
)


def tiny_hf_config():
    import transformers
    return transformers.WhisperConfig(
        vocab_size=1000,
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        encoder_attention_heads=4,
        decoder_layers=2,
        decoder_attention_heads=4,
        encoder_ffn_dim=256,
        decoder_ffn_dim=256,
        max_source_positions=1500,
        max_target_positions=448,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3,
    )


@pytest.fixture(scope="module")
def hf_and_ours():
    import torch
    import transformers
    from whisperjav_tpu.models.whisper.convert import (
        config_from_hf, params_from_hf_state_dict,
    )

    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(tiny_hf_config())
    hf.eval()
    config = config_from_hf(hf.config)
    params = params_from_hf_state_dict(hf.model.state_dict(), config)
    return hf, config, params


@pytest.fixture(scope="module")
def mel_input():
    rng = np.random.default_rng(42)
    return rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.5


def test_encoder_parity(hf_and_ours, mel_input):
    import torch
    hf, config, params = hf_and_ours
    with torch.no_grad():
        ref = hf.model.encoder(torch.from_numpy(mel_input)).last_hidden_state.numpy()
    ours = np.asarray(encode(params, config, jnp.asarray(mel_input)))
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 2e-4


def test_decoder_teacher_forced_logits_parity(hf_and_ours, mel_input):
    import torch
    hf, config, params = hf_and_ours
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 1000, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        out = hf(input_features=torch.from_numpy(mel_input),
                 decoder_input_ids=torch.from_numpy(tokens.astype(np.int64)))
        ref = out.logits.numpy()
    ours = np.asarray(forward(params, config, jnp.asarray(mel_input),
                              jnp.asarray(tokens)))
    assert ours.shape == ref.shape
    assert np.max(np.abs(ours - ref)) < 5e-3  # logit scale ~±20
    # argmax agreement everywhere
    assert (ours.argmax(-1) == ref.argmax(-1)).mean() == 1.0


def test_incremental_decode_matches_teacher_forced(hf_and_ours, mel_input):
    """KV-cached step-by-step decode must equal the full-sequence pass."""
    hf, config, params = hf_and_ours
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, 1000, size=(2, 9)).astype(np.int32))
    xa = encode(params, config, jnp.asarray(mel_input))

    full = decode_train(params, config, tokens, xa)

    cross = precompute_cross_kv(params, config, xa)
    cache = KVCache.zeros(config, 2, 16, jnp.float32)
    # prefill 4 tokens, then 5 single steps
    logits_p, cache = decode_step(params, config, tokens[:, :4], 0, cache, cross)
    step_logits = [logits_p]
    for i in range(4, 9):
        li, cache = decode_step(params, config, tokens[:, i:i + 1], i, cache, cross)
        step_logits.append(li)
    stepped = jnp.concatenate(step_logits, axis=1)
    assert np.max(np.abs(np.asarray(stepped) - np.asarray(full))) < 1e-3


def test_init_params_shapes():
    config = WhisperConfig()
    params = init_params(config, jax.random.PRNGKey(0))
    assert params["encoder"]["blocks"]["wq"].shape == (4, 384, 384)
    assert params["decoder"]["tok_emb"].shape == (51865, 384)
    # forward runs on random params
    mel = jnp.zeros((1, 80, 3000), jnp.float32)
    toks = jnp.zeros((1, 4), jnp.int32)
    logits = forward(params, config, mel, toks)
    assert logits.shape == (1, 4, 51865)
    assert bool(jnp.isfinite(logits).all())
