"""Silero v5/v6 weight-portability: parity vs a torch oracle.

The oracle is the published 16 kHz silero-vad graph rebuilt in torch.nn
(Conv1d / LSTMCell — real torch semantics, incl. the i,f,g,o gate order)
with random weights, exported as a ``_model.``-prefixed state dict the
way the JIT model names its tensors (reference binding:
whisperjav/modules/speech_segmentation/backends/silero.py:199). The
converter maps it to the JAX tree; outputs must match per chunk.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from whisperjav_tpu.models.vad import silero


class _TorchSilero(nn.Module):
    """Published silero-vad v5/v6 16 kHz architecture (random weights)."""

    def __init__(self):
        super().__init__()
        self.stft_basis = torch.from_numpy(silero._stft_basis())
        self.enc = nn.ModuleList([
            nn.Conv1d(129, 128, 3, stride=1, padding=1),
            nn.Conv1d(128, 64, 3, stride=2, padding=1),
            nn.Conv1d(64, 64, 3, stride=2, padding=1),
            nn.Conv1d(64, 128, 3, stride=1, padding=1),
        ])
        self.rnn = nn.LSTMCell(128, 128)
        self.head = nn.Conv1d(128, 1, 1)

    def forward(self, audio: torch.Tensor) -> torch.Tensor:
        """audio (B, T) → probs (B, T/512). Sequential per-chunk loop —
        deliberately naive so it cross-checks the vectorized JAX framing."""
        b, t = audio.shape
        n_chunks = t // silero.CHUNK
        h = torch.zeros(b, 128)
        c = torch.zeros(b, 128)
        probs = []
        context = torch.zeros(b, silero.CONTEXT)
        for j in range(n_chunks):
            chunk = audio[:, j * silero.CHUNK:(j + 1) * silero.CHUNK]
            x = torch.cat([context, chunk], dim=1)[:, None, :]  # (B,1,576)
            context = chunk[:, -silero.CONTEXT:]
            x = F.pad(x, (0, silero.CONTEXT), mode="reflect")
            spec = F.conv1d(x, self.stft_basis, stride=silero._HOP)
            mag = torch.sqrt(spec[:, :129] ** 2 + spec[:, 129:] ** 2 + 1e-12)
            e = mag
            for conv in self.enc:
                e = torch.relu(conv(e))
            feat = e[:, :, 0]                                   # (B, 128)
            h, c = self.rnn(feat, (h, c))
            logit = self.head(torch.relu(h)[:, :, None])[:, 0, 0]
            probs.append(torch.sigmoid(logit))
        return torch.stack(probs, dim=1)

    def jit_style_state_dict(self):
        sd = {"_model.stft.forward_basis_buffer": self.stft_basis}
        for i, conv in enumerate(self.enc):
            sd[f"_model.encoder.{i}.reparam_conv.weight"] = conv.weight
            sd[f"_model.encoder.{i}.reparam_conv.bias"] = conv.bias
        sd["_model.decoder.rnn.weight_ih"] = self.rnn.weight_ih
        sd["_model.decoder.rnn.weight_hh"] = self.rnn.weight_hh
        sd["_model.decoder.rnn.bias_ih"] = self.rnn.bias_ih
        sd["_model.decoder.rnn.bias_hh"] = self.rnn.bias_hh
        sd["_model.decoder.decoder.2.weight"] = self.head.weight
        sd["_model.decoder.decoder.2.bias"] = self.head.bias
        return sd


def test_probs_match_torch_oracle():
    torch.manual_seed(0)
    oracle = _TorchSilero().eval()
    params = silero.params_from_torch_state_dict(
        oracle.jit_style_state_dict())

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, silero.CHUNK * 20)) * 0.3
             ).astype(np.float32)
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(audio)).numpy()
    ours = np.asarray(silero.apply(params, jnp.asarray(audio)))
    assert ours.shape == theirs.shape == (2, 20)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_random_init_shapes():
    import jax

    params = silero.init_params(jax.random.PRNGKey(0))
    audio = jnp.zeros((1, silero.CHUNK * 5), jnp.float32)
    probs = np.asarray(silero.apply(params, audio))
    assert probs.shape == (1, 5)
    assert ((probs >= 0) & (probs <= 1)).all()


def test_npz_round_trip(tmp_path):
    import jax

    params = silero.init_params(jax.random.PRNGKey(1))
    path = tmp_path / "silero.npz"
    silero.save_params(str(path), params)
    loaded = silero.load_params(str(path))
    audio = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (1, silero.CHUNK * 4)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(silero.apply(params, audio)),
                               np.asarray(silero.apply(loaded, audio)))


def test_segmenter_autodetects_v5_tree(tmp_path):
    import jax

    from whisperjav_tpu.modules.segmentation.silero_jax import (
        SileroJaxSegmenter,
    )

    params = silero.init_params(jax.random.PRNGKey(3))
    path = tmp_path / "silero_v5.npz"
    silero.save_params(str(path), params)
    seg = SileroJaxSegmenter(weights=str(path))
    assert seg.config.frame_s == silero.FRAME_S
    audio = (np.random.default_rng(0).standard_normal(16000 * 4) * 0.2
             ).astype(np.float32)
    result = seg.segment(audio, 16000)
    assert result.stats["model"] == "jax"


# Exact tensor manifest of the published silero-vad v5/v6 16 kHz JIT
# graph (reference: whisperjav/modules/speech_segmentation/backends/
# silero.py loads these checkpoints via torch.hub). Pinning name→shape
# here makes the converter's vendor contract explicit and diffable
# against a real checkpoint, independent of the torch twin above.
SILERO_V5_MANIFEST = {
    "_model.stft.forward_basis_buffer": (258, 1, 256),
    "_model.encoder.0.reparam_conv.weight": (128, 129, 3),
    "_model.encoder.0.reparam_conv.bias": (128,),
    "_model.encoder.1.reparam_conv.weight": (64, 128, 3),
    "_model.encoder.1.reparam_conv.bias": (64,),
    "_model.encoder.2.reparam_conv.weight": (64, 64, 3),
    "_model.encoder.2.reparam_conv.bias": (64,),
    "_model.encoder.3.reparam_conv.weight": (128, 64, 3),
    "_model.encoder.3.reparam_conv.bias": (128,),
    "_model.decoder.rnn.weight_ih": (512, 128),
    "_model.decoder.rnn.weight_hh": (512, 128),
    "_model.decoder.rnn.bias_ih": (512,),
    "_model.decoder.rnn.bias_hh": (512,),
    "_model.decoder.decoder.2.weight": (1, 128, 1),
    "_model.decoder.decoder.2.bias": (1,),
}


def test_converter_consumes_exact_vendor_manifest():
    """A state dict with EXACTLY the published names/shapes loads, every
    param lands with the right shape, and the forward pass runs."""
    rng = np.random.default_rng(7)
    sd = {k: torch.from_numpy(
        (rng.standard_normal(v) * 0.1).astype(np.float32))
        for k, v in SILERO_V5_MANIFEST.items()}
    params = silero.params_from_torch_state_dict(sd)
    assert params["stft_basis"].shape == (258, 1, 256)
    assert params["lstm_wi"].shape == (512, 128)
    assert params["head_w"].shape in ((1, 128, 1), (1, 128))
    audio = np.random.default_rng(1).standard_normal(
        (2, silero.CHUNK * 6)).astype(np.float32) * 0.2
    probs = np.asarray(silero.apply(params, jnp.asarray(audio)))
    assert probs.shape == (2, 6)
    assert np.all((probs >= 0) & (probs <= 1))


def test_twin_state_dict_matches_vendor_manifest():
    """The torch twin used for parity emits the manifest EXACTLY —
    names and shapes — so twin-based parity is parity vs the published
    graph layout, not vs a private re-reading of it."""
    twin_sd = _TorchSilero().jit_style_state_dict()
    assert {k: tuple(v.shape) for k, v in twin_sd.items()} == \
        SILERO_V5_MANIFEST
