"""BS-RoFormer parity vs a torch twin of the lucidrains module.

The twin below reconstructs the vendor ``bs_roformer/bs_roformer.py``
module hierarchy in torch — same attribute names, same math (RMSNorm,
interleaved-pair rotary, gated attention, GLU mask heads, torch.stft
round trip) — so its ``state_dict()`` carries the REAL published tensor
names.  The converter must load that dict and the JAX forward must match
the twin's audio output.  This guards both the architecture and the
vendor name-map (reference backend:
whisperjav/modules/speech_enhancement/backends/bs_roformer.py:100-125).
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from whisperjav_tpu.models.enhancement.bs_roformer import (
    BSR_TEST, BSRoformerConfig, config_from_state_dict, init_params,
    isolate_vocals, params_from_torch_state_dict, separate,
)


# ------------------------------------------------------------------ twin
class RMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = dim ** 0.5
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return F.normalize(x, dim=-1) * self.scale * self.gamma


class RotaryEmbedding(nn.Module):
    def __init__(self, dim, theta=10000.0):
        super().__init__()
        freqs = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
        self.freqs = nn.Parameter(freqs, requires_grad=False)

    @staticmethod
    def _rotate_half(x):
        x1, x2 = x[..., 0::2], x[..., 1::2]
        return torch.stack((-x2, x1), dim=-1).reshape(x.shape)

    def rotate_queries_or_keys(self, t):
        n = t.shape[-2]
        angles = torch.outer(torch.arange(n).float(), self.freqs)
        angles = angles.repeat_interleave(2, dim=-1)
        return t * angles.cos() + self._rotate_half(t) * angles.sin()


class Attention(nn.Module):
    def __init__(self, dim, heads, dim_head, rotary_embed):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        inner = heads * dim_head
        self.rotary_embed = [rotary_embed]      # shared, not re-registered
        self.norm = RMSNorm(dim)
        self.to_qkv = nn.Linear(dim, inner * 3, bias=False)
        self.to_gates = nn.Linear(dim, heads)
        self.to_out = nn.Sequential(nn.Linear(inner, dim, bias=False))

    def forward(self, x):
        h, dh = self.heads, self.dim_head
        y = self.norm(x)
        qkv = self.to_qkv(y)
        b, n, _ = qkv.shape
        qkv = qkv.view(b, n, 3, h, dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        rot = self.rotary_embed[0]
        q, k = rot.rotate_queries_or_keys(q), rot.rotate_queries_or_keys(k)
        att = torch.softmax(q @ k.transpose(-1, -2) * dh ** -0.5, dim=-1)
        out = att @ v
        gates = self.to_gates(y)
        out = out * gates.transpose(1, 2).unsqueeze(-1).sigmoid()
        out = out.transpose(1, 2).reshape(b, n, h * dh)
        return self.to_out(out)


class FeedForward(nn.Module):
    def __init__(self, dim, mult):
        super().__init__()
        inner = dim * mult
        self.net = nn.Sequential(RMSNorm(dim), nn.Linear(dim, inner),
                                 nn.GELU(), nn.Dropout(0.0),
                                 nn.Linear(inner, dim), nn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class Transformer(nn.Module):
    def __init__(self, dim, depth, heads, dim_head, ff_mult, rotary_embed):
        super().__init__()
        self.layers = nn.ModuleList([
            nn.ModuleList([Attention(dim, heads, dim_head, rotary_embed),
                           FeedForward(dim, ff_mult)])
            for _ in range(depth)])

    def forward(self, x):
        for attn, ff in self.layers:
            x = attn(x) + x
            x = ff(x) + x
        return x


class BandSplit(nn.Module):
    def __init__(self, dim, dim_inputs):
        super().__init__()
        self.dim_inputs = dim_inputs
        self.to_features = nn.ModuleList([
            nn.Sequential(RMSNorm(d), nn.Linear(d, dim))
            for d in dim_inputs])

    def forward(self, x):
        xs = x.split(self.dim_inputs, dim=-1)
        return torch.stack([f(v) for f, v in zip(self.to_features, xs)],
                           dim=-2)


def MLP(dim_in, dim_out, dim_hidden, depth):
    dims = (dim_in, *((dim_hidden,) * depth), dim_out)
    net = []
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        net.append(nn.Linear(a, b))
        if i < len(dims) - 2:
            net.append(nn.Tanh())
    return nn.Sequential(*net)


class MaskEstimator(nn.Module):
    def __init__(self, dim, dim_inputs, depth, mlp_expansion_factor):
        super().__init__()
        hidden = dim * mlp_expansion_factor
        self.dim_inputs = dim_inputs
        self.to_freqs = nn.ModuleList([
            nn.Sequential(MLP(dim, d * 2, hidden, depth), nn.GLU(dim=-1))
            for d in dim_inputs])

    def forward(self, x):
        return torch.cat([f(x[..., i, :])
                          for i, f in enumerate(self.to_freqs)], dim=-1)


class BSRoformerTwin(nn.Module):
    def __init__(self, cfg: BSRoformerConfig):
        super().__init__()
        self.cfg = cfg
        self.time_rotary_embed = RotaryEmbedding(cfg.dim_head)
        self.freq_rotary_embed = RotaryEmbedding(cfg.dim_head)
        self.layers = nn.ModuleList([
            nn.ModuleList([
                Transformer(cfg.dim, cfg.time_transformer_depth, cfg.heads,
                            cfg.dim_head, cfg.ff_mult,
                            self.time_rotary_embed),
                Transformer(cfg.dim, cfg.freq_transformer_depth, cfg.heads,
                            cfg.dim_head, cfg.ff_mult,
                            self.freq_rotary_embed)])
            for _ in range(cfg.depth)])
        self.final_norm = RMSNorm(cfg.dim)
        self.band_split = BandSplit(cfg.dim, list(cfg.dim_inputs))
        self.mask_estimators = nn.ModuleList([
            MaskEstimator(cfg.dim, list(cfg.dim_inputs),
                          cfg.mask_estimator_depth,
                          cfg.mlp_expansion_factor)
            for _ in range(cfg.num_stems)])

    def forward(self, raw_audio):
        """raw_audio (B, C, T) → (B, stems, C, T)."""
        cfg = self.cfg
        b, s, length = raw_audio.shape
        window = torch.hann_window(cfg.n_fft)
        spec = torch.stft(raw_audio.reshape(b * s, length), cfg.n_fft,
                          cfg.hop, cfg.n_fft, window=window, center=True,
                          normalized=False, return_complex=True)
        f, t = spec.shape[-2], spec.shape[-1]
        stft_repr = torch.view_as_real(spec).view(b, s, f, t, 2)
        stft_repr = stft_repr.permute(0, 2, 1, 3, 4).reshape(b, f * s, t, 2)

        x = stft_repr.permute(0, 2, 1, 3).reshape(b, t, f * s * 2)
        x = self.band_split(x)
        for time_tr, freq_tr in self.layers:
            nb = x.shape[2]
            y = x.permute(0, 2, 1, 3).reshape(b * nb, t, cfg.dim)
            y = time_tr(y)
            x = y.view(b, nb, t, cfg.dim).permute(0, 2, 1, 3)
            y = x.reshape(b * t, nb, cfg.dim)
            y = freq_tr(y)
            x = y.view(b, t, nb, cfg.dim)
        x = self.final_norm(x)

        masks = torch.stack([est(x) for est in self.mask_estimators], dim=1)
        masks = masks.view(b, cfg.num_stems, t, f * s, 2).permute(
            0, 1, 3, 2, 4)
        cplx = torch.view_as_complex(stft_repr.contiguous())
        out = cplx.unsqueeze(1) * torch.view_as_complex(masks.contiguous())
        out = out.view(b, cfg.num_stems, f, s, t).permute(
            0, 1, 3, 2, 4).reshape(b * cfg.num_stems * s, f, t)
        audio = torch.istft(out, cfg.n_fft, cfg.hop, cfg.n_fft,
                            window=window, center=True, length=length)
        return audio.view(b, cfg.num_stems, s, length)


# ----------------------------------------------------------------- tests
@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(11)
    m = BSRoformerTwin(BSR_TEST)
    m.eval()
    return m


def test_vendor_names_exact(twin):
    sd = twin.state_dict()
    expected = [
        "band_split.to_features.0.0.gamma",
        "band_split.to_features.0.1.weight",
        "layers.0.0.layers.0.0.norm.gamma",
        "layers.0.0.layers.0.0.to_qkv.weight",
        "layers.0.0.layers.0.0.to_gates.bias",
        "layers.0.0.layers.0.0.to_out.0.weight",
        "layers.1.1.layers.0.1.net.1.weight",
        "layers.1.1.layers.0.1.net.4.bias",
        "final_norm.gamma",
        "mask_estimators.0.to_freqs.0.0.0.weight",
        "time_rotary_embed.freqs",
        "freq_rotary_embed.freqs",
    ]
    for name in expected:
        assert name in sd, name


def test_config_inference(twin):
    cfg = config_from_state_dict(twin.state_dict())
    assert cfg.dim == BSR_TEST.dim
    assert cfg.depth == BSR_TEST.depth
    assert cfg.heads == BSR_TEST.heads
    assert cfg.dim_head == BSR_TEST.dim_head
    assert cfg.freqs_per_bands == BSR_TEST.freqs_per_bands
    assert cfg.n_fft == BSR_TEST.n_fft
    assert cfg.stereo == BSR_TEST.stereo
    assert cfg.mask_estimator_depth == BSR_TEST.mask_estimator_depth


def test_audio_parity_mono(twin):
    cfg = BSR_TEST
    params = params_from_torch_state_dict(twin.state_dict(), cfg)
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((2, 1, 320)) * 0.4).astype(np.float32)
    with torch.no_grad():
        ref = twin(torch.from_numpy(audio)).numpy()
    ours = np.asarray(separate(params, cfg, audio))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_audio_parity_stereo_two_stems():
    cfg = BSRoformerConfig(
        dim=16, depth=1, stereo=True, num_stems=2, heads=2, dim_head=8,
        ff_mult=2, freqs_per_bands=(2, 2, 4, 9), n_fft=32, hop=8,
        mask_estimator_depth=1, mlp_expansion_factor=2, sample_rate=16_000)
    torch.manual_seed(4)
    tw = BSRoformerTwin(cfg)
    tw.eval()
    params = params_from_torch_state_dict(tw.state_dict(), cfg)
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal((1, 2, 160)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref = tw(torch.from_numpy(audio)).numpy()
    ours = np.asarray(separate(params, cfg, audio))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_isolate_vocals_shapes(twin):
    params = init_params(BSR_TEST, jax.random.PRNGKey(0))
    mono = np.zeros((2, 320), np.float32)
    out = isolate_vocals(params, BSR_TEST, mono)
    assert out.shape == (2, 320)
