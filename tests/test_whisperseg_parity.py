"""WhisperSeg weight-portability: layer-exact parity vs torch oracle.

Mirrors tests/test_whisper_model.py's recipe: build the published
checkpoint's architecture (Whisper encoder + 2-layer decoder + (1, d)
frame head — reference: whisperjav/modules/speech_segmentation/
backends/whisperseg.py:42-43) in transformers with random weights,
convert the torch state dict through
models/vad/whisperseg.params_from_hf_state_dict, and require the JAX
frame logits to match the torch forward pass.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.vad import whisperseg

N_FRAMES = 100  # small decoder context for a fast CPU test

SMALL = WhisperConfig(
    name="seg-small", n_mels=80, n_audio_ctx=1500, n_audio_state=64,
    n_audio_head=4, n_audio_layer=2, n_vocab=128, n_text_ctx=N_FRAMES,
    n_text_state=64, n_text_head=4, n_text_layer=2,
)


def _build_torch_oracle():
    hf_config = transformers.WhisperConfig(
        vocab_size=SMALL.n_vocab, num_mel_bins=SMALL.n_mels,
        d_model=SMALL.n_audio_state,
        encoder_layers=SMALL.n_audio_layer,
        encoder_attention_heads=SMALL.n_audio_head,
        decoder_layers=SMALL.n_text_layer,
        decoder_attention_heads=SMALL.n_text_head,
        encoder_ffn_dim=4 * SMALL.n_audio_state,
        decoder_ffn_dim=4 * SMALL.n_text_state,
        max_source_positions=SMALL.n_audio_ctx,
        max_target_positions=SMALL.n_text_ctx,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    trunk = transformers.WhisperModel(hf_config).eval()
    head = torch.nn.Linear(SMALL.n_text_state, 1)
    with torch.no_grad():
        head.weight.normal_(0, 0.1)
        head.bias.normal_(0, 0.1)
    return trunk, head


def _torch_frame_logits(trunk, head, mel: np.ndarray) -> np.ndarray:
    b = mel.shape[0]
    ids = torch.full((b, N_FRAMES), whisperseg.QUERY_TOKEN_ID,
                     dtype=torch.long)
    with torch.no_grad():
        out = trunk(input_features=torch.from_numpy(mel),
                    decoder_input_ids=ids)
        logits = head(out.last_hidden_state)[..., 0]
    return logits.numpy()


def test_frame_logits_match_torch_oracle():
    trunk, head = _build_torch_oracle()
    sd = {f"model.{k}": v for k, v in trunk.state_dict().items()}
    sd["head.weight"] = head.weight.detach()
    sd["head.bias"] = head.bias.detach()
    params = whisperseg.params_from_hf_state_dict(sd, SMALL)

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 80, 3000)).astype(np.float32) * 0.5

    # JAX side: bypass the audio→mel stage (covered by tests/test_mel.py)
    # and feed the identical mel to both trunks.
    from whisperjav_tpu.models.whisper.model import (
        KVCache, decode_hidden, encode, precompute_cross_kv,
    )
    xa = encode(params, SMALL, jnp.asarray(mel))
    cross = precompute_cross_kv(params, SMALL, xa)
    tokens = jnp.full((2, N_FRAMES), whisperseg.QUERY_TOKEN_ID, jnp.int32)
    cache = KVCache.zeros(SMALL, 2, N_FRAMES, jnp.float32)
    hidden, _ = decode_hidden(params, SMALL, tokens, 0, cache, cross)
    ours = np.asarray(
        hidden.astype(jnp.float32) @ params["head"]["w"]
        + params["head"]["b"])[..., 0]

    theirs = _torch_frame_logits(trunk, head, mel)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)


def test_converter_head_fallback_by_shape():
    """The (1, d) head is found even under an unexpected name."""
    trunk, head = _build_torch_oracle()
    sd = {f"model.{k}": v for k, v in trunk.state_dict().items()}
    sd["some_vendor_name.weight"] = head.weight.detach()
    sd["some_vendor_name.bias"] = head.bias.detach()
    params = whisperseg.params_from_hf_state_dict(sd, SMALL)
    np.testing.assert_allclose(np.asarray(params["head"]["w"]),
                               head.weight.detach().numpy().T)


def test_apply_shapes_and_range():
    """apply() end-to-end on audio with a tiny config."""
    import jax

    params = whisperseg.init_params(jax.random.PRNGKey(0), config=SMALL)
    audio = jnp.zeros((1, whisperseg.N_SAMPLES), jnp.float32)
    probs = np.asarray(whisperseg.apply(params, audio, SMALL))
    assert probs.shape == (1, N_FRAMES)
    assert ((probs >= 0) & (probs <= 1)).all()
