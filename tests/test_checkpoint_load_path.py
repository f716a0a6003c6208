"""On-disk checkpoint load chain: save_pretrained → load_pretrained.

The converter parity suites exercise in-memory state dicts; these tests
exercise the PRODUCTION ``--checkpoint <dir>`` path end-to-end — a real
HF directory on disk, loaded through transformers' local-files-only
loader into our converters — for both Whisper ASR and the Qwen3 text LM
(the tpu-local translation backend's load path).
"""

import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def _tiny_whisper_hf():
    cfg = transformers.WhisperConfig(
        vocab_size=1000, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3)
    torch.manual_seed(0)
    return transformers.WhisperForConditionalGeneration(cfg).eval()


@pytest.mark.slow
def test_whisper_checkpoint_dir_roundtrip(tmp_path):
    """save_pretrained dir → factory.load_model → logit parity vs the
    torch model that wrote the directory."""
    hf = _tiny_whisper_hf()
    ckpt = tmp_path / "whisper-tiny-test"
    hf.save_pretrained(ckpt)

    from whisperjav_tpu.pipelines.factory import load_model
    config, params = load_model("ignored", str(ckpt))
    assert config.n_audio_state == 64
    assert config.n_text_layer == 2

    from whisperjav_tpu.models.whisper.model import forward
    rng = np.random.default_rng(0)
    mel = np.pad(rng.standard_normal((1, 80, 200)).astype(np.float32),
                 ((0, 0), (0, 0), (0, 3000 - 200)))
    toks = np.array([[3, 5, 7, 9]], np.int64)
    ours = np.asarray(forward(params, config, jnp.asarray(mel),
                              jnp.asarray(toks.astype(np.int32))))
    with torch.no_grad():
        theirs = hf(input_features=torch.tensor(mel),
                    decoder_input_ids=torch.tensor(toks)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=2e-3)


def test_qwen_lm_checkpoint_dir_roundtrip(tmp_path):
    """save_pretrained dir → convert.load_lm → generate_text runs and
    the prefill logits match the torch model."""
    cfg = transformers.Qwen3Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, rope_theta=1e6,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        attention_bias=False, max_position_embeddings=256,
        bos_token_id=1, eos_token_id=2)
    torch.manual_seed(1)
    hf = transformers.Qwen3ForCausalLM(cfg).eval()
    ckpt = tmp_path / "qwen3-tiny-test"
    hf.save_pretrained(ckpt)

    from whisperjav_tpu.models.qwen.convert import load_lm
    our_cfg, params = load_lm(str(ckpt))
    assert our_cfg.n_layers == 2 and our_cfg.d_model == 64

    ids = np.array([[5, 9, 17, 33, 65]], np.int32)
    from whisperjav_tpu.models.qwen.model import LMCache, lm_step
    emb = params["tok_emb"][jnp.asarray(ids)]
    cache = LMCache.zeros(our_cfg, 1, ids.shape[1], jnp.float32)
    ours, _ = lm_step(params, our_cfg, emb, 0, cache)
    with torch.no_grad():
        theirs = hf(torch.tensor(ids.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               atol=2e-3, rtol=2e-3)

    # the translation backend's decode loop runs on the loaded params
    from whisperjav_tpu.models.qwen.model import generate_text
    buf = np.full((1, 8), our_cfg.eos_id, np.int32)
    buf[0, :5] = ids[0]
    res = generate_text(params, our_cfg, jnp.asarray(buf),
                        jnp.asarray([5], jnp.int32), max_new=4)
    assert np.asarray(res.tokens).shape == (1, 4)
