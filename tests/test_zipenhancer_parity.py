"""ZipEnhancer weight-portability: parity vs a torch twin + STFT math.

The twin rebuilds the dual-path generator with real torch modules
(Conv2d / ConvTranspose2d / InstanceNorm2d / PReLU / MultiheadAttention
with packed in_proj / LayerNorm) under the converter's canonical names,
so every torch convention the converter must handle is exercised with
actual torch semantics. Separately, mag_pha_stft/istft are checked
against torch.stft/istft with the modelscope parameters (reference:
whisperjav/modules/speech_enhancement/backends/zipenhancer.py:438-503).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax.numpy as jnp

from whisperjav_tpu.models.enhancement import zipenhancer as zz

CFG = zz.ZipConfig(width=8, n_blocks=2, n_heads=2, ffn_mult=2,
                   dense_depth=2, n_freqs=zz.N_FREQS)


class _DenseLayer(nn.Module):
    def __init__(self, c, i):
        super().__init__()
        self.conv = nn.Conv2d(c * (i + 1), c, 3, padding=(2 ** i, 1),
                              dilation=(2 ** i, 1))
        self.norm = nn.InstanceNorm2d(c, affine=True)
        self.prelu = nn.PReLU(c)


class _DenseBlock(nn.ModuleList):
    def __init__(self, cfg):
        super().__init__([_DenseLayer(cfg.width, i)
                          for i in range(cfg.dense_depth)])

    def forward(self, x):
        feats = x
        for layer in self:
            h = layer.prelu(layer.norm(layer.conv(feats)))
            feats = torch.cat([feats, h], dim=1)
            x = h
        return x


class _DPSub(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.width
        self.ln1 = nn.LayerNorm(d)
        self.attn = nn.MultiheadAttention(d, cfg.n_heads, batch_first=True)
        self.ln2 = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, d * cfg.ffn_mult)
        self.fc2 = nn.Linear(d * cfg.ffn_mult, d)

    def forward(self, x):
        h = self.ln1(x)
        a, _ = self.attn(h, h, h, need_weights=False)
        x = x + a
        h = self.ln2(x)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(h)))


class _Block(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.time = _DPSub(cfg)
        self.freq = _DPSub(cfg)


class _Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.width
        self.conv1 = nn.Conv2d(2, c, 1)
        self.norm1 = nn.InstanceNorm2d(c, affine=True)
        self.prelu1 = nn.PReLU(c)
        self.dense = _DenseBlock(cfg)
        self.conv2 = nn.Conv2d(c, c, (1, 3), stride=(1, 2), padding=(0, 1))
        self.norm2 = nn.InstanceNorm2d(c, affine=True)
        self.prelu2 = nn.PReLU(c)


class _MaskDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.width
        self.dense = _DenseBlock(cfg)
        self.up = nn.ConvTranspose2d(c, c, (1, 3), stride=(1, 2),
                                     padding=(0, 1))
        self.conv = nn.Conv2d(c, 1, 1)
        self.beta = nn.Parameter(torch.full((cfg.n_freqs,), 2.0))


class _PhaseDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.width
        self.dense = _DenseBlock(cfg)
        self.up = nn.ConvTranspose2d(c, c, (1, 3), stride=(1, 2),
                                     padding=(0, 1))
        self.conv_r = nn.Conv2d(c, 1, 1)
        self.conv_i = nn.Conv2d(c, 1, 1)


class _TorchZip(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.dense_encoder = _Encoder(cfg)
        self.blocks = nn.ModuleList([_Block(cfg)
                                     for _ in range(cfg.n_blocks)])
        self.mask_decoder = _MaskDecoder(cfg)
        self.phase_decoder = _PhaseDecoder(cfg)

    def forward(self, mag, pha):
        b, f, t = mag.shape
        cfg, enc = self.cfg, self.dense_encoder
        x = torch.stack([mag, pha], dim=1).permute(0, 1, 3, 2)
        x = enc.prelu1(enc.norm1(enc.conv1(x)))
        x = enc.dense(x)
        x = enc.prelu2(enc.norm2(enc.conv2(x)))
        c, fd = cfg.width, x.shape[-1]
        for blk in self.blocks:
            h = x.permute(0, 3, 2, 1).reshape(b * fd, t, c)
            h = blk.time(h)
            x = h.reshape(b, fd, t, c).permute(0, 3, 2, 1)
            h = x.permute(0, 2, 3, 1).reshape(b * t, fd, c)
            h = blk.freq(h)
            x = h.reshape(b, t, fd, c).permute(0, 3, 1, 2)
        md = self.mask_decoder
        m = md.conv(md.up(md.dense(x)))[:, 0].permute(0, 2, 1)
        mask = 1.2 * torch.sigmoid(md.beta[None, :, None] * m)
        mag_out = mag * mask
        pd = self.phase_decoder
        ph = pd.up(pd.dense(x))
        r = pd.conv_r(ph)[:, 0]
        i = pd.conv_i(ph)[:, 0]
        pha_out = torch.atan2(i, r).permute(0, 2, 1)
        return mag_out, pha_out


def test_forward_matches_torch_twin():
    torch.manual_seed(0)
    twin = _TorchZip(CFG).eval()
    params = zz.params_from_torch_state_dict(twin.state_dict(), CFG)

    rng = np.random.default_rng(0)
    t_frames = 21
    mag = (np.abs(rng.standard_normal((1, zz.N_FREQS, t_frames))) * 0.5
           ).astype(np.float32)
    pha = (rng.uniform(-np.pi, np.pi, (1, zz.N_FREQS, t_frames))
           ).astype(np.float32)

    with torch.no_grad():
        mag_t, pha_t = twin(torch.from_numpy(mag), torch.from_numpy(pha))
    mag_j, pha_j = zz.forward(params, CFG, jnp.asarray(mag),
                              jnp.asarray(pha))
    np.testing.assert_allclose(np.asarray(mag_j), mag_t.numpy(),
                               atol=2e-4, rtol=1e-3)
    # compare phases on the unit circle (atan2 branch-cut safe)
    np.testing.assert_allclose(np.cos(np.asarray(pha_j)),
                               np.cos(pha_t.numpy()), atol=2e-3)
    np.testing.assert_allclose(np.sin(np.asarray(pha_j)),
                               np.sin(pha_t.numpy()), atol=2e-3)


def test_mag_pha_stft_matches_torch():
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((1, 4000)) * 0.3).astype(np.float32)
    mag_j, pha_j = zz.mag_pha_stft(jnp.asarray(audio))

    spec = torch.stft(torch.from_numpy(audio), zz.N_FFT, zz.HOP, zz.N_FFT,
                      window=torch.hann_window(zz.N_FFT),
                      center=True, pad_mode="reflect", return_complex=True)
    mag_t = torch.abs(spec) ** zz.COMPRESS
    pha_t = torch.angle(spec)
    np.testing.assert_allclose(np.asarray(mag_j), mag_t.numpy(),
                               atol=2e-3, rtol=1e-2)
    big = mag_t.numpy() > 1e-2   # phase is meaningless in null bins
    np.testing.assert_allclose(np.cos(np.asarray(pha_j))[big],
                               np.cos(pha_t.numpy())[big], atol=1e-2)


def test_denoise_round_trip_identity_mask():
    """With a unity mask and noisy phase, denoise ≈ identity (ISTFT/WOLA
    reconstruction), using hand-built params that force mask=1."""
    import jax

    params = zz.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((1, 4000)) * 0.2).astype(np.float32)
    mag, pha = zz.mag_pha_stft(jnp.asarray(audio))
    rec = zz.mag_pha_istft(mag, pha, 4000)
    np.testing.assert_allclose(np.asarray(rec), audio, atol=1e-3)


def test_npz_round_trip(tmp_path):
    import jax

    params = zz.init_params(jax.random.PRNGKey(1), CFG)
    path = str(tmp_path / "zip.npz")
    zz.save_params(path, params, CFG)
    loaded, cfg = zz.load_params(path)
    assert cfg == CFG
    rng = np.random.default_rng(3)
    mag = jnp.asarray(np.abs(rng.standard_normal(
        (1, zz.N_FREQS, 11))).astype(np.float32))
    pha = jnp.zeros_like(mag)
    a = zz.forward(params, CFG, mag, pha)
    b = zz.forward(loaded, CFG, mag, pha)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))


def test_backend_uses_dual_path_tree(tmp_path):
    import jax

    from whisperjav_tpu.modules.enhancement.zip_jax import ZipJaxEnhancer

    params = zz.init_params(jax.random.PRNGKey(2), CFG)
    path = str(tmp_path / "zip_dp.npz")
    zz.save_params(path, params, CFG)
    enh = ZipJaxEnhancer(weights=path, chunk_s=0.5, crossfade_s=0.1)
    assert not enh._legacy and enh._model_cfg == CFG
    audio = (np.random.default_rng(4).standard_normal(16000) * 0.1
             ).astype(np.float32)
    res = enh.enhance(audio, 16000)
    assert res.success and res.audio.shape == audio.shape
    assert np.isfinite(res.audio).all()


def test_vendor_prefixed_state_dict_loads_identically():
    """ModelScope wrapper prefixes (generator./model.generator./module.)
    strip transparently: params_from_vendor on a prefixed dict equals
    the direct conversion, through to identical forward outputs."""
    torch.manual_seed(1)
    twin = _TorchZip(CFG).eval()
    sd = twin.state_dict()
    direct = zz.params_from_torch_state_dict(sd, CFG)

    rng = np.random.default_rng(3)
    mag = (np.abs(rng.standard_normal((1, zz.N_FREQS, 9))) * 0.5
           ).astype(np.float32)
    pha = rng.uniform(-np.pi, np.pi, (1, zz.N_FREQS, 9)).astype(np.float32)
    want_mag, want_pha = zz.forward(direct, CFG, jnp.asarray(mag),
                                    jnp.asarray(pha))

    for prefix in ("generator.", "model.generator.", "module."):
        vend = zz.params_from_vendor(
            {prefix + k: v for k, v in sd.items()}, CFG)
        got_mag, got_pha = zz.forward(vend, CFG, jnp.asarray(mag),
                                      jnp.asarray(pha))
        np.testing.assert_allclose(np.asarray(got_mag),
                                   np.asarray(want_mag), atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_pha),
                                   np.asarray(want_pha), atol=1e-6)
