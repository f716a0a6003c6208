"""MossFormer2_SE_48K weight-portability: parity vs a torch twin.

The twin rebuilds the ClearerVoice-Studio MossFormer2 SE mask net with
real torch modules under the vendor's canonical names (MaskNet →
Computation_Block → MossFormerM → MossformerBlock_GFSMN with
FLASH_ShareA_FFConvM attention + Gated_FSMN_Block memory), so every
torch convention the converter must handle is exercised with actual
torch semantics (reference: whisperjav/modules/speech_enhancement/
backends/clearvoice.py:42-47 — MossFormer2_SE_48K is the default).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.enhancement import mossformer2 as mf

CFG = mf.MF2_TEST


# ------------------------------------------------------------- torch twin

class ScaleNorm(nn.Module):
    def __init__(self, dim, eps=1e-5):
        super().__init__()
        self.scale = dim ** -0.5
        self.eps = eps
        self.g = nn.Parameter(torch.ones(1))

    def forward(self, x):
        n = torch.norm(x, dim=-1, keepdim=True) * self.scale
        return x / n.clamp(min=self.eps) * self.g


class Transpose(nn.Module):
    def forward(self, x):
        return x.transpose(1, 2)


class DepthwiseConv1d(nn.Module):
    def __init__(self, c, kernel):
        super().__init__()
        self.conv = nn.Conv1d(c, c, kernel, groups=c,
                              padding=(kernel - 1) // 2, bias=False)

    def forward(self, x):
        return self.conv(x)


class ConvModule(nn.Module):
    def __init__(self, c, kernel=17):
        super().__init__()
        self.sequential = nn.Sequential(Transpose(),
                                        DepthwiseConv1d(c, kernel))

    def forward(self, x):
        return x + self.sequential(x).transpose(1, 2)


class FFConvM(nn.Module):
    def __init__(self, d_in, d_out, norm_klass=nn.LayerNorm):
        super().__init__()
        self.mdl = nn.Sequential(norm_klass(d_in), nn.Linear(d_in, d_out),
                                 nn.SiLU(), ConvModule(d_out),
                                 nn.Dropout(0.0))

    def forward(self, x):
        return self.mdl(x)


class OffsetScale(nn.Module):
    def __init__(self, dim, heads=4):
        super().__init__()
        self.gamma = nn.Parameter(torch.randn(heads, dim) * 0.02)
        self.beta = nn.Parameter(torch.zeros(heads, dim))

    def forward(self, x):
        out = torch.einsum("...d,hd->...hd", x, self.gamma) + self.beta
        return out.unbind(dim=-2)


def _rotary(t, rope_dim):
    freqs = 1.0 / (10000.0 ** (torch.arange(0, rope_dim, 2).float()
                               / rope_dim))
    n = t.shape[-2]
    ang = torch.arange(n).float()[:, None] * freqs[None, :]
    ang = ang.repeat_interleave(2, dim=-1)
    head, tail = t[..., :rope_dim], t[..., rope_dim:]
    x1, x2 = head[..., 0::2], head[..., 1::2]
    rot = torch.stack([-x2, x1], dim=-1).reshape(head.shape)
    out = head * ang.cos() + rot * ang.sin()
    return torch.cat([out, tail], dim=-1)


class FLASH_ShareA_FFConvM(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, h = cfg.d_model, cfg.hidden
        self.cfg = cfg
        self.to_hidden = FFConvM(d, 2 * h, norm_klass=ScaleNorm)
        self.to_qk = FFConvM(d, cfg.qk_dim, norm_klass=ScaleNorm)
        self.qk_offset_scale = OffsetScale(cfg.qk_dim, heads=4)
        self.to_out = FFConvM(h, d, norm_klass=ScaleNorm)

    def forward(self, x):
        cfg = self.cfg
        b, n, d = x.shape
        g = cfg.group_size
        x_shift, x_pass = x.chunk(2, dim=-1)
        x_shift = F.pad(x_shift, (0, 0, 1, -1), value=0.0)
        normed = torch.cat((x_shift, x_pass), dim=-1)

        v, u = self.to_hidden(normed).chunk(2, dim=-1)
        qk = self.to_qk(normed)
        quad_q, lin_q, quad_k, lin_k = self.qk_offset_scale(qk)
        quad_q, lin_q, quad_k, lin_k = (
            _rotary(t, cfg.rope_dim) for t in (quad_q, lin_q,
                                               quad_k, lin_k))
        pad = (-n) % g
        if pad:
            quad_q, lin_q, quad_k, lin_k, vg, ug = (
                F.pad(t, (0, 0, 0, pad))
                for t in (quad_q, lin_q, quad_k, lin_k, v, u))
        else:
            vg, ug = v, u
        grp = lambda t: t.reshape(b, -1, g, t.shape[-1])   # noqa: E731
        quad_q, lin_q, quad_k, lin_k, vg, ug = map(
            grp, (quad_q, lin_q, quad_k, lin_k, vg, ug))

        sim = torch.einsum("bgid,bgjd->bgij", quad_q, quad_k) / g
        attn = F.relu(sim) ** 2
        quad_v = torch.einsum("bgij,bgjd->bgid", attn, vg)
        quad_u = torch.einsum("bgij,bgjd->bgid", attn, ug)
        lin_kv = torch.einsum("bgnd,bgne->bde", lin_k, vg) / n
        lin_v = torch.einsum("bgnd,bde->bgne", lin_q, lin_kv)
        lin_ku = torch.einsum("bgnd,bgne->bde", lin_k, ug) / n
        lin_u = torch.einsum("bgnd,bde->bgne", lin_q, lin_ku)

        att_v = (quad_v + lin_v).reshape(b, -1, v.shape[-1])[:, :n]
        att_u = (quad_u + lin_u).reshape(b, -1, u.shape[-1])[:, :n]
        out = (att_u * v) * torch.sigmoid(att_v * u)
        return x + self.to_out(out)


class UniDeepFsmn(nn.Module):
    def __init__(self, c, lorder):
        super().__init__()
        self.linear = nn.Linear(c, c)
        self.project = nn.Linear(c, c, bias=False)
        self.lorder = lorder
        self.conv1 = nn.Conv2d(c, c, (2 * lorder - 1, 1), groups=c,
                               bias=False)

    def forward(self, x):                                  # (B, T, C)
        f1 = F.relu(self.linear(x))
        p1 = self.project(f1)
        y = p1.unsqueeze(1).permute(0, 3, 2, 1)            # (B, C, T, 1)
        y_pad = F.pad(y, [0, 0, self.lorder - 1, self.lorder - 1])
        out = y + self.conv1(y_pad)
        return x + out.permute(0, 3, 2, 1).squeeze(1)


class Gated_FSMN(nn.Module):
    def __init__(self, c, lorder):
        super().__init__()
        self.to_u = FFConvM(c, c)
        self.to_v = FFConvM(c, c)
        self.fsmn = UniDeepFsmn(c, lorder)

    def forward(self, x):
        x_u = self.fsmn(self.to_u(x))
        return self.to_v(x) * x_u + x


class CLayerNorm(nn.LayerNorm):
    def forward(self, x):                                  # (B, C, T)
        return super().forward(x.transpose(1, 2)).transpose(1, 2)


class Gated_FSMN_Block(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d, inner = cfg.d_model, cfg.fsmn_inner
        self.conv1 = nn.Sequential(nn.Conv1d(d, inner, 1), nn.PReLU())
        self.norm1 = CLayerNorm(inner)
        self.gated_fsmn = Gated_FSMN(inner, cfg.lorder)
        self.norm2 = CLayerNorm(inner)
        self.conv2 = nn.Conv1d(inner, d, 1)

    def forward(self, x):                                  # (B, T, D)
        y = self.conv1(x.transpose(2, 1))
        y = self.norm1(y)
        y = self.gated_fsmn(y.transpose(2, 1))
        y = self.norm2(y.transpose(2, 1))
        return self.conv2(y).transpose(2, 1) + x


class MossformerBlock_GFSMN(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.layers = nn.ModuleList(
            [FLASH_ShareA_FFConvM(cfg) for _ in range(cfg.num_blocks)])
        self.fsmn = nn.ModuleList(
            [Gated_FSMN_Block(cfg) for _ in range(cfg.num_blocks)])

    def forward(self, x):
        for att, fsmn in zip(self.layers, self.fsmn):
            x = att(x)
            x = fsmn(x)
        return x


class MossFormerM(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.mossformerM = MossformerBlock_GFSMN(cfg)
        self.norm = nn.LayerNorm(cfg.d_model, eps=1e-6)

    def forward(self, x):
        return self.norm(self.mossformerM(x))


class Computation_Block(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.intra_mdl = MossFormerM(cfg)
        self.intra_norm = nn.GroupNorm(1, cfg.d_model, eps=1e-8)

    def forward(self, x):                                  # (B, N, S)
        intra = self.intra_mdl(x.permute(0, 2, 1)).permute(0, 2, 1)
        return self.intra_norm(intra) + x


class ScaledSinuEmbedding(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = nn.Parameter(torch.ones(1))
        inv = 1.0 / (10000 ** (torch.arange(0, dim, 2).float() / dim))
        self.register_buffer("inv_freq", inv)

    def forward(self, x):                                  # (B, S, N)
        t = torch.arange(x.shape[1]).float()
        sinu = torch.einsum("i,j->ij", t, self.inv_freq)
        return torch.cat((sinu.sin(), sinu.cos()), dim=-1) * self.scale


class MossFormer_MaskNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.norm = nn.GroupNorm(1, cfg.n_mels, eps=1e-8)
        self.conv1d_encoder = nn.Conv1d(cfg.n_mels, cfg.d_model, 1,
                                        bias=False)
        self.pos_enc = ScaledSinuEmbedding(cfg.d_model)
        self.mdl = Computation_Block(cfg)
        self.conv1d_out = nn.Conv1d(cfg.d_model, cfg.d_model, 1)
        self.conv1_decoder = nn.Conv1d(cfg.d_model, cfg.n_freqs, 1,
                                       bias=False)
        self.prelu = nn.PReLU()
        self.output = nn.Sequential(nn.Conv1d(cfg.d_model, cfg.d_model, 1),
                                    nn.Tanh())
        self.output_gate = nn.Sequential(
            nn.Conv1d(cfg.d_model, cfg.d_model, 1), nn.Sigmoid())

    def forward(self, x):                                  # (B, mels, S)
        x = self.norm(x)
        x = self.conv1d_encoder(x)
        emb = self.pos_enc(x.transpose(1, -1)).transpose(0, -1)
        x = x + emb
        x = self.mdl(x)
        x = self.prelu(x)
        x = self.conv1d_out(x)
        x = self.output(x) * self.output_gate(x)
        x = self.conv1_decoder(x)
        return F.relu(x)                                   # (B, F, S)


# ------------------------------------------------------------------ tests

@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    m = MossFormer_MaskNet(CFG).eval()
    # break the degenerate init symmetry of norm/gate params
    with torch.no_grad():
        for p in m.parameters():
            p.add_(0.05 * torch.randn_like(p))
    return m


def test_mask_parity_vs_twin(twin):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, CFG.n_mels, 20)).astype(np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(feats)).numpy()       # (B, F, S)

    params, cfg = mf.params_from_torch_state_dict(
        {f"model.mossformer.{k}": v for k, v in
         twin.state_dict().items()}, CFG)
    got = mf.forward_mask(params, cfg,
                          jnp.asarray(np.moveaxis(feats, 1, 2)))
    got = np.moveaxis(np.asarray(got), 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_config_inference_from_state_dict(twin):
    params, cfg = mf.params_from_torch_state_dict(twin.state_dict())
    assert cfg.num_blocks == CFG.num_blocks
    assert cfg.d_model == CFG.d_model
    assert cfg.n_mels == CFG.n_mels
    assert cfg.n_freqs == CFG.n_freqs
    assert cfg.qk_dim == CFG.qk_dim
    assert cfg.fsmn_inner == CFG.fsmn_inner
    assert cfg.lorder == CFG.lorder
    assert params["blocks"]["flash"]["gamma"].shape == (
        CFG.num_blocks, 4, CFG.qk_dim)


def test_group_padding_parity(twin):
    """Sequence NOT a multiple of group_size exercises the pad path."""
    rng = np.random.default_rng(1)
    s = CFG.group_size + 3
    feats = rng.standard_normal((1, CFG.n_mels, s)).astype(np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(feats)).numpy()
    params, cfg = mf.params_from_torch_state_dict(twin.state_dict(), CFG)
    got = mf.forward_mask(params, cfg,
                          jnp.asarray(np.moveaxis(feats, 1, 2)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(got), 1, 2), want,
                               atol=2e-4, rtol=2e-3)


def test_enhance_end_to_end_shapes():
    params = mf.init_params(CFG, jax.random.PRNGKey(0))
    audio = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 400)).astype(np.float32))
    out = mf.enhance(params, CFG, audio, 400)
    assert out.shape == (2, 400)
    assert np.all(np.isfinite(np.asarray(out)))


def test_stft_istft_roundtrip():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 1000)).astype(np.float32))
    r, i = mf.stft_hamming(x, 64, 16)
    y = mf.istft_hamming(r, i, 1000, 64, 16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def test_converter_rejects_unknown_dict():
    with pytest.raises(ValueError):
        mf.params_from_torch_state_dict({"foo.bar": np.zeros((3,))})
