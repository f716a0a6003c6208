"""FRCRN (ClearVoice FRCRN_SE_16K) parity vs a torch twin.

The twin is built from the vendor module list the converter documents —
ComplexConv2d (conv_re/conv_im), deep-complex-networks ComplexBatchNorm2d
(whitening, running stats), ComplexUniDeepFsmn (fsmn_re_L1/fsmn_im_L1:
linear→ReLU→project→depthwise frequency-memory conv, residual),
cascaded dual U-Nets with tanh cIRM masks — so
``params_from_torch_state_dict`` is exercised against real torch tensors
under the exact canonical names.  Reference consumer:
whisperjav/modules/speech_enhancement/backends/clearvoice.py:36-41.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from whisperjav_tpu.models.enhancement import frcrn  # noqa: E402

CFG = frcrn.FRCRN_TEST
LEAK = 0.1


# ------------------------------------------------------------------ twin
class ComplexConv2d(nn.Module):
    def __init__(self, c_in, c_out, kernel, stride, padding,
                 transpose=False):
        super().__init__()
        if transpose:
            # output_padding (1, 0): one extra computed frequency row,
            # matching the JAX kernels' asymmetric padding window
            self.conv_re = nn.ConvTranspose2d(c_in, c_out, kernel,
                                              stride, padding,
                                              output_padding=(1, 0))
            self.conv_im = nn.ConvTranspose2d(c_in, c_out, kernel,
                                              stride, padding,
                                              output_padding=(1, 0))
        else:
            self.conv_re = nn.Conv2d(c_in, c_out, kernel, stride, padding)
            self.conv_im = nn.Conv2d(c_in, c_out, kernel, stride, padding)

    def forward(self, xr, xi):
        yr = self.conv_re(xr) - self.conv_im(xi)
        yi = self.conv_re(xi) + self.conv_im(xr)
        return yr, yi


class ComplexBatchNorm2d(nn.Module):
    """deep-complex-networks inference BN with running stats."""

    def __init__(self, c):
        super().__init__()
        w = torch.zeros(c, 3)
        w[:, 0] = w[:, 2] = 1 / np.sqrt(2.0)
        self.weight = nn.Parameter(w)
        self.bias = nn.Parameter(torch.zeros(c, 2))
        rc = torch.zeros(c, 3)
        rc[:, 0] = rc[:, 1] = 1 / np.sqrt(2.0)
        self.register_buffer("running_mean", torch.zeros(c, 2))
        self.register_buffer("running_covar", rc)

    def forward(self, xr, xi, eps=1e-5):
        mr = self.running_mean[:, 0][None, :, None, None]
        mi = self.running_mean[:, 1][None, :, None, None]
        vrr = self.running_covar[:, 0] + eps
        vii = self.running_covar[:, 1] + eps
        vri = self.running_covar[:, 2]
        s = torch.sqrt(vrr * vii - vri * vri)
        t = torch.sqrt(vrr + vii + 2 * s)
        inv = 1.0 / (s * t)
        rrr = ((vii + s) * inv)[None, :, None, None]
        rii = ((vrr + s) * inv)[None, :, None, None]
        rri = (-vri * inv)[None, :, None, None]
        xr_h, xi_h = xr - mr, xi - mi
        wr = rrr * xr_h + rri * xi_h
        wi = rri * xr_h + rii * xi_h
        w_rr = self.weight[:, 0][None, :, None, None]
        w_ri = self.weight[:, 1][None, :, None, None]
        w_ii = self.weight[:, 2][None, :, None, None]
        br = self.bias[:, 0][None, :, None, None]
        bi = self.bias[:, 1][None, :, None, None]
        return (w_rr * wr + w_ri * wi + br,
                w_ri * wr + w_ii * wi + bi)


class UniDeepFsmn(nn.Module):
    def __init__(self, c, lorder):
        super().__init__()
        self.linear = nn.Linear(c, c)
        self.project = nn.Linear(c, c, bias=False)
        self.conv1 = nn.Conv2d(c, c, (2 * lorder - 1, 1), (1, 1),
                               groups=c, bias=False)
        self.lorder = lorder

    def forward(self, x):                   # (B, C, F, T)
        h = x.permute(0, 2, 3, 1)           # (B, F, T, C)
        f1 = F.relu(self.linear(h))
        p1 = self.project(f1).permute(0, 3, 1, 2)
        mem = self.conv1(F.pad(p1, (0, 0, self.lorder - 1,
                                    self.lorder - 1)))
        return x + p1 + mem


class ComplexUniDeepFsmn(nn.Module):
    def __init__(self, c, lorder):
        super().__init__()
        self.fsmn_re_L1 = UniDeepFsmn(c, lorder)
        self.fsmn_im_L1 = UniDeepFsmn(c, lorder)

    def forward(self, xr, xi):
        rr = self.fsmn_re_L1(xr)
        ri = self.fsmn_re_L1(xi)
        ir = self.fsmn_im_L1(xr)
        ii = self.fsmn_im_L1(xi)
        return rr - ii, ri + ir


class Encoder(nn.Module):
    def __init__(self, geom, lorder):
        super().__init__()
        self.conv = ComplexConv2d(geom.c_in, geom.c_out, geom.kernel,
                                  geom.stride, geom.padding)
        self.bn = ComplexBatchNorm2d(geom.c_out)
        if geom.fsmn:
            self.fsmn = ComplexUniDeepFsmn(geom.c_out, lorder)

    def forward(self, xr, xi):
        xr, xi = self.conv(xr, xi)
        xr, xi = self.bn(xr, xi)
        xr = F.leaky_relu(xr, LEAK)
        xi = F.leaky_relu(xi, LEAK)
        if hasattr(self, "fsmn"):
            xr, xi = self.fsmn(xr, xi)
        return xr, xi


class Decoder(nn.Module):
    def __init__(self, geom, lorder, last):
        super().__init__()
        self.conv = ComplexConv2d(geom.c_in, geom.c_out, geom.kernel,
                                  geom.stride, geom.padding,
                                  transpose=True)
        if not last:
            self.bn = ComplexBatchNorm2d(geom.c_out)
        if geom.fsmn:
            self.fsmn = ComplexUniDeepFsmn(geom.c_out, lorder)
        self.last = last

    def forward(self, xr, xi, f_tgt, t_tgt):
        xr, xi = self.conv(xr, xi)
        xr, xi = xr[:, :, :f_tgt, :t_tgt], xi[:, :, :f_tgt, :t_tgt]
        if not self.last:
            xr, xi = self.bn(xr, xi)
            xr = F.leaky_relu(xr, LEAK)
            xi = F.leaky_relu(xi, LEAK)
            if hasattr(self, "fsmn"):
                xr, xi = self.fsmn(xr, xi)
        return xr, xi


class UNet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoders = nn.ModuleList(
            [Encoder(g, cfg.lorder) for g in cfg.encoders])
        self.decoders = nn.ModuleList(
            [Decoder(g, cfg.lorder, i == len(cfg.decoders) - 1)
             for i, g in enumerate(cfg.decoders)])
        self.cfg = cfg

    def forward(self, xr, xi):
        skips = []
        for enc in self.encoders:
            xr, xi = enc(xr, xi)
            skips.append((xr, xi))
        n = len(self.decoders)
        for i, dec in enumerate(self.decoders):
            if i > 0:
                sr, si = skips[n - 1 - i]
                xr = torch.cat([xr, sr], dim=1)
                xi = torch.cat([xi, si], dim=1)
            if i < n - 1:
                f_tgt, t_tgt = skips[n - 2 - i][0].shape[2:]
            else:
                f_tgt, t_tgt = self.cfg.n_freqs, skips[0][0].shape[3] - 1
            xr, xi = dec(xr, xi, f_tgt, t_tgt)
        return xr, xi


class TorchFRCRN(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.unet = UNet(cfg)
        self.unet2 = UNet(cfg)

    def forward(self, spec_r, spec_i):
        xr, xi = spec_r[:, None], spec_i[:, None]
        u1r, u1i = self.unet(xr, xi)
        u2r, u2i = self.unet2(u1r, u1i)
        mr = torch.tanh(u1r) + torch.tanh(u2r)
        mi = torch.tanh(u1i) + torch.tanh(u2i)
        return mr[:, 0], mi[:, 0]


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(11)
    m = TorchFRCRN(CFG)
    m.eval()
    # nonzero running stats so the whitening path is nontrivial
    with torch.no_grad():
        for name, buf in m.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(0.05 * torch.randn_like(buf))
            if name.endswith("running_covar"):
                buf[:, :2] = buf[:, :2] * (1 + 0.2 * torch.rand_like(
                    buf[:, :2]))
                buf[:, 2] = 0.1 * torch.randn_like(buf[:, 2])
    return m


def test_converter_infers_geometry(twin):
    params, cfg = frcrn.params_from_torch_state_dict(twin.state_dict())
    assert len(cfg.encoders) == len(CFG.encoders)
    assert len(cfg.decoders) == len(CFG.decoders)
    for got, want in zip(cfg.encoders, CFG.encoders):
        assert (got.c_in, got.c_out, got.kernel) == \
            (want.c_in, want.c_out, want.kernel)
    assert cfg.lorder == CFG.lorder


def test_forward_matches_torch_twin(twin):
    params, _ = frcrn.params_from_torch_state_dict(twin.state_dict())
    rng = np.random.default_rng(0)
    sr = rng.standard_normal((2, CFG.n_freqs, 12)).astype(np.float32)
    si = rng.standard_normal((2, CFG.n_freqs, 12)).astype(np.float32)
    with torch.no_grad():
        ref_r, ref_i = twin(torch.from_numpy(sr), torch.from_numpy(si))
    got_r, got_i = frcrn.forward_spec(params, CFG, jnp.asarray(sr),
                                      jnp.asarray(si))
    np.testing.assert_allclose(np.asarray(got_r), ref_r.numpy(),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_i), ref_i.numpy(),
                               atol=2e-5)


def test_vendor_prefix_stripped(twin):
    sd = {f"model.{k}": v for k, v in twin.state_dict().items()}
    params, cfg = frcrn.params_from_torch_state_dict(sd)
    assert len(cfg.encoders) == len(CFG.encoders)


def test_onnx_roundtrip(twin, tmp_path):
    from whisperjav_tpu.utils.onnx_io import OnnxGraph, write_onnx

    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()}
    path = tmp_path / "frcrn.onnx"
    write_onnx(str(path), OnnxGraph(initializers=sd))
    p_ref, _ = frcrn.params_from_torch_state_dict(sd)
    p_got, _ = frcrn.params_from_onnx(str(path))
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a))


def test_denoise_shapes_and_masking():
    """End-to-end denoise: identity mask ≈ pass-through reconstruction."""
    params = frcrn.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    audio = rng.standard_normal((1, 1600)).astype(np.float32) * 0.1
    out = frcrn.denoise(params, jnp.asarray(audio), CFG)
    assert out.shape == audio.shape
    assert np.isfinite(np.asarray(out)).all()


def test_full_size_config_plumbs():
    """The published-size geometry builds and counts params sanely."""
    cfg = frcrn.FRCRN_SE_16K
    assert cfg.n_freqs == 321
    assert len(cfg.encoders) == 7 and len(cfg.decoders) == 7
    assert cfg.encoders[0].c_in == 1 and cfg.decoders[-1].c_out == 1
    # channel ladder mirrors: decoder outs = reversed encoder ins
    enc_outs = [g.c_out for g in cfg.encoders]
    dec_outs = [g.c_out for g in cfg.decoders]
    assert dec_outs == enc_outs[:-1][::-1] + [1]
