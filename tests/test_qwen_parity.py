"""Qwen3-ASR weight-portability: layer-exact parity vs transformers.

Two hermetic oracles with shared random weights through
models/qwen/convert.py (mirroring tests/test_whisper_model.py):

- the text model vs ``transformers.Qwen3ForCausalLM`` — exercises GQA,
  per-head q/k RMSNorm, rotary embeddings, SwiGLU, and an explicit
  ``head_dim`` decoupled from d_model/n_heads;
- the audio tower vs ``Qwen3OmniMoeAudioEncoder`` (the AuT encoder
  family the qwen-asr checkpoints ship; reference binding:
  whisperjav/modules/qwen_asr.py:388-390) — exercises the conv2d
  downsampling stack, per-chunk positions, block-windowed attention,
  and the proj1/proj2 adapter.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from whisperjav_tpu.models.qwen import convert
from whisperjav_tpu.models.qwen.model import (
    LMCache, QwenASRConfig, encode_audio, lm_step,
)

LM_SMALL = QwenASRConfig(
    name="lm-small", vocab_size=512, d_model=64, n_layers=2, n_heads=4,
    n_kv_heads=2, d_ff=128, lm_head_dim=24,
)

# n_window=50 (100-frame chunks → 13 tokens): the one chunking the HF
# module executes self-consistently — its _get_feat_extract_output_lengths
# hardcodes 13 tokens per 100 mel frames, so n_window=100 crashes the
# oracle itself. Our implementation derives token counts from the conv
# arithmetic and is consistent for any n_window.
AUT_SMALL = QwenASRConfig(
    name="aut-small", vocab_size=512, d_model=48, n_layers=1, n_heads=4,
    n_kv_heads=2, d_ff=96, n_mels=32, d_audio=64, audio_layers=2,
    audio_heads=4, audio_ffn=128, audio_downsample_hidden=16,
    n_window=50, n_window_infer=400,
)


def _build_torch_lm():
    cfg = transformers.Qwen3Config(
        vocab_size=LM_SMALL.vocab_size, hidden_size=LM_SMALL.d_model,
        intermediate_size=LM_SMALL.d_ff,
        num_hidden_layers=LM_SMALL.n_layers,
        num_attention_heads=LM_SMALL.n_heads,
        num_key_value_heads=LM_SMALL.n_kv_heads,
        head_dim=LM_SMALL.lm_head_dim,
        rope_theta=LM_SMALL.rope_theta,
        rms_norm_eps=LM_SMALL.rms_eps,
        tie_word_embeddings=False,
        attention_bias=False,
        max_position_embeddings=256,
    )
    torch.manual_seed(0)
    return transformers.Qwen3ForCausalLM(cfg).eval()


def test_lm_logits_match_qwen3_oracle():
    oracle = _build_torch_lm()
    params = convert.params_from_hf_state_dict(
        oracle.state_dict(), LM_SMALL, audio_fallback={})

    rng = np.random.default_rng(0)
    ids = rng.integers(0, LM_SMALL.vocab_size, (2, 12)).astype(np.int64)
    with torch.no_grad():
        theirs = oracle(input_ids=torch.from_numpy(ids)).logits.numpy()

    emb = jnp.asarray(params["tok_emb"])[jnp.asarray(ids.astype(np.int32))]
    cache = LMCache.zeros(LM_SMALL, 2, 12, jnp.float32)
    ours, _ = lm_step(params, LM_SMALL, emb, 0, cache)
    np.testing.assert_allclose(np.asarray(ours), theirs,
                               atol=2e-3, rtol=1e-3)


def test_lm_tied_embeddings_fallback():
    """lm_head falls back to embed_tokens when the checkpoint ties them."""
    oracle = _build_torch_lm()
    sd = {k: v for k, v in oracle.state_dict().items()
          if k != "lm_head.weight"}
    params = convert.params_from_hf_state_dict(sd, LM_SMALL,
                                               audio_fallback={})
    np.testing.assert_allclose(
        np.asarray(params["lm_head"]),
        oracle.model.embed_tokens.weight.detach().numpy().T)


def _build_torch_aut():
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe \
        import Qwen3OmniMoeAudioEncoderConfig
    from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe \
        import Qwen3OmniMoeAudioEncoder

    cfg = Qwen3OmniMoeAudioEncoderConfig(
        num_mel_bins=AUT_SMALL.n_mels,
        encoder_layers=AUT_SMALL.audio_layers,
        encoder_attention_heads=AUT_SMALL.audio_heads,
        encoder_ffn_dim=AUT_SMALL.audio_ffn,
        d_model=AUT_SMALL.d_audio,
        downsample_hidden_size=AUT_SMALL.audio_downsample_hidden,
        n_window=AUT_SMALL.n_window,
        n_window_infer=AUT_SMALL.n_window_infer,
        output_dim=AUT_SMALL.d_model,
        max_source_positions=1500,
        dropout=0.0, attention_dropout=0.0,
    )
    torch.manual_seed(1)
    model = Qwen3OmniMoeAudioEncoder(cfg).eval()
    try:  # prefer the eager path: block mask comparison is exact there
        model.set_attn_implementation("eager")
    except Exception:
        pass
    return model


@pytest.mark.parametrize("n_frames", [400, 800])
def test_audio_tower_matches_aut_oracle(n_frames):
    oracle = _build_torch_aut()
    sd = {f"audio_tower.{k}": v for k, v in oracle.state_dict().items()}
    # Route through the public converter by pairing the tower with a
    # minimal all-zeros LM (the LM side is covered by the oracle above).
    fake_lm = {"model.embed_tokens.weight": torch.zeros(4, AUT_SMALL.d_model),
               "model.norm.weight": torch.ones(AUT_SMALL.d_model)}
    for i in range(AUT_SMALL.n_layers):
        hd = AUT_SMALL.head_dim
        fake_lm.update({
            f"model.layers.{i}.input_layernorm.weight":
                torch.ones(AUT_SMALL.d_model),
            f"model.layers.{i}.self_attn.q_proj.weight":
                torch.zeros(AUT_SMALL.n_heads * hd, AUT_SMALL.d_model),
            f"model.layers.{i}.self_attn.k_proj.weight":
                torch.zeros(AUT_SMALL.n_kv_heads * hd, AUT_SMALL.d_model),
            f"model.layers.{i}.self_attn.v_proj.weight":
                torch.zeros(AUT_SMALL.n_kv_heads * hd, AUT_SMALL.d_model),
            f"model.layers.{i}.self_attn.o_proj.weight":
                torch.zeros(AUT_SMALL.d_model, AUT_SMALL.n_heads * hd),
            f"model.layers.{i}.self_attn.q_norm.weight": torch.ones(hd),
            f"model.layers.{i}.self_attn.k_norm.weight": torch.ones(hd),
            f"model.layers.{i}.post_attention_layernorm.weight":
                torch.ones(AUT_SMALL.d_model),
            f"model.layers.{i}.mlp.gate_proj.weight":
                torch.zeros(AUT_SMALL.d_ff, AUT_SMALL.d_model),
            f"model.layers.{i}.mlp.up_proj.weight":
                torch.zeros(AUT_SMALL.d_ff, AUT_SMALL.d_model),
            f"model.layers.{i}.mlp.down_proj.weight":
                torch.zeros(AUT_SMALL.d_model, AUT_SMALL.d_ff),
        })
    tree = convert.params_from_hf_state_dict({**sd, **fake_lm}, AUT_SMALL)

    rng = np.random.default_rng(2)
    mel = rng.standard_normal(
        (AUT_SMALL.n_mels, n_frames)).astype(np.float32) * 0.5

    with torch.no_grad():
        out = oracle(
            input_features=torch.from_numpy(mel),
            feature_lens=torch.tensor([n_frames], dtype=torch.long),
        ).last_hidden_state.numpy()

    ours = np.asarray(encode_audio(tree, AUT_SMALL,
                                   jnp.asarray(mel[None])))[0]
    assert ours.shape == out.shape
    np.testing.assert_allclose(ours, out, atol=3e-3, rtol=1e-3)


def test_tokenizer_fallback_round_trip():
    from whisperjav_tpu.models.qwen.tokenizer import QwenTokenizer
    tok = QwenTokenizer()
    assert not tok.is_real
    text = tok.decode([5, 9, tok.eos_id, 12])
    assert isinstance(text, str) and len(text) == 3
