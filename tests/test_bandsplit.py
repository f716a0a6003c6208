"""Tests for the band-split dual-path model and heavy enhancement
backends, plus cross-subtitle processing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from whisperjav_tpu.models.enhancement.bandsplit import (
    BandSplitConfig, apply, band_edges, init_params, load_params,
    param_count, save_params,
)
from whisperjav_tpu.modules.enhancement import create_enhancer

SMALL = BandSplitConfig(sample_rate=16_000, n_fft=512, hop=128, n_bands=8,
                        d_model=32, n_heads=2, n_layers=1)


def test_band_edges_partition():
    edges = band_edges(257, 8)
    assert len(edges) == 8
    assert edges[0][0] == 0
    assert edges[-1][1] == 257
    # contiguous, non-empty
    for (a1, b1), (a2, b2) in zip(edges[:-1], edges[1:]):
        assert b1 == a2
        assert b1 > a1


def test_bandsplit_forward_shapes():
    params = init_params(SMALL, jax.random.PRNGKey(0))
    n = 4096
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, n)).astype(np.float32) * 0.2)
    y = apply(params, SMALL, x, n)
    assert y.shape == (2, n)
    assert bool(jnp.isfinite(y).all())


def test_bandsplit_param_roundtrip(tmp_path):
    params = init_params(SMALL, jax.random.PRNGKey(1))
    p = tmp_path / "bs.npz"
    save_params(str(p), params)
    loaded = load_params(str(p))
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((1, 2048)).astype(np.float32))
    a = np.asarray(apply(params, SMALL, x, 2048))
    b = np.asarray(apply(loaded, SMALL, x, 2048))
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert param_count(params) > 10_000


def test_heavy_backends_graceful_without_weights():
    for name in ("bs-roformer", "clearvoice"):
        enh = create_enhancer(name)
        assert not enh.is_lightweight
        res = enh.enhance(np.zeros(1000, np.float32), 16000)
        assert not res.success
        assert np.array_equal(res.audio, np.zeros(1000, np.float32))
    assert create_enhancer("bs-roformer").get_preferred_sample_rate() == 44100
    assert create_enhancer("clearvoice").get_preferred_sample_rate() == 48000


def test_bs_roformer_backend_checkpoint_roundtrip(tmp_path):
    """Backend loads an .npz checkpoint of the checkpoint-faithful
    model and enhances through resample/chunk plumbing."""
    from whisperjav_tpu.models.enhancement import bs_roformer

    cfg = bs_roformer.BSR_TEST
    params = bs_roformer.init_params(cfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "bsr.npz"
    bs_roformer.save_params(str(ckpt), params, cfg)

    enh = create_enhancer("bs-roformer", weights=str(ckpt),
                          chunk_s=0.05, crossfade_s=0.01)
    assert enh.get_preferred_sample_rate() == cfg.sample_rate
    audio = (np.random.default_rng(0).standard_normal(3200)
             .astype(np.float32) * 0.1)
    res = enh.enhance(audio, 16_000)
    assert res.success and res.stats["engine"] == "bs_roformer"
    assert res.audio.shape == audio.shape
    assert np.isfinite(res.audio).all()


def test_clearvoice_frcrn_backend(tmp_path):
    """model=FRCRN_SE_16K binds the checkpoint-faithful FRCRN engine."""
    from whisperjav_tpu.models.enhancement import frcrn

    cfg = frcrn.FRCRN_TEST
    params = frcrn.init_params(cfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "frcrn.npz"
    frcrn.save_params(str(ckpt), params, cfg)

    enh = create_enhancer("clearvoice", model="FRCRN_SE_16K",
                          weights=str(ckpt), chunk_s=0.1,
                          crossfade_s=0.02)
    assert enh.get_preferred_sample_rate() == 16_000
    audio = (np.random.default_rng(1).standard_normal(3200)
             .astype(np.float32) * 0.1)
    res = enh.enhance(audio, 16_000)
    assert res.success and res.stats["engine"] == "frcrn"
    assert res.audio.shape == audio.shape
    assert np.isfinite(res.audio).all()


def test_clearvoice_mossformer2_backend(tmp_path):
    """The default model (MossFormer2_SE_48K) binds the checkpoint-
    faithful MossFormer2 engine from an .npz checkpoint."""
    from whisperjav_tpu.models.enhancement import mossformer2

    cfg = mossformer2.MF2_TEST
    params = mossformer2.init_params(cfg, jax.random.PRNGKey(0))
    ckpt = tmp_path / "mf2.npz"
    mossformer2.save_params(str(ckpt), params, cfg)

    enh = create_enhancer("clearvoice", weights=str(ckpt),
                          chunk_s=0.05, crossfade_s=0.01)
    # backend adopts the checkpoint's native rate (test cfg: 16 kHz)
    assert enh.get_preferred_sample_rate() == cfg.sample_rate
    audio = (np.random.default_rng(2).standard_normal(3200)
             .astype(np.float32) * 0.1)
    res = enh.enhance(audio, 16_000)
    assert res.success and res.stats["engine"] == "mossformer2"
    assert res.audio.shape == audio.shape
    assert np.isfinite(res.audio).all()


def test_clearvoice_mossformer2_torch_checkpoint(tmp_path):
    """A vendor-named torch state dict (.pt) binds through the
    converter, config inferred from the tensors."""
    torch = pytest.importorskip("torch")
    from test_mossformer2_parity import CFG, MossFormer_MaskNet
    from whisperjav_tpu.models.enhancement import mossformer2

    torch.manual_seed(1)
    twin = MossFormer_MaskNet(CFG).eval()
    ckpt = tmp_path / "mf2.pt"
    torch.save({f"model.mossformer.{k}": v
                for k, v in twin.state_dict().items()}, ckpt)

    params, cfg = mossformer2.load_checkpoint(str(ckpt))
    assert cfg.num_blocks == CFG.num_blocks
    enh = create_enhancer("clearvoice", weights=str(ckpt),
                          chunk_s=0.05, crossfade_s=0.01)
    res = enh.enhance(np.random.default_rng(3).standard_normal(1600)
                      .astype(np.float32) * 0.1, 16_000)
    assert res.success and res.stats["engine"] == "mossformer2"


def test_cross_subtitle_processor():
    from whisperjav_tpu.modules.sanitize.cross_subtitle import (
        CrossSubtitleProcessor,
    )
    from whisperjav_tpu.modules.srt import Subtitle
    subs = [
        Subtitle(1, 0.0, 2.0, "気持ちいいですよ"),
        Subtitle(2, 2.2, 3.0, "気持ちいいですよ"),      # identical run…
        Subtitle(9, 3.2, 4.0, "気持ちいいですよ"),      # …of three merges
        Subtitle(3, 5.0, 7.0, "それは違うと思う。"),
        Subtitle(4, 6.5, 7.0, "違うと思う。"),         # contained in 3
        Subtitle(5, 9.0, 10.0, "まさか"),
        Subtitle(6, 10.2, 12.0, "まさかそんなこと"),   # stutter pair
        Subtitle(7, 14.0, 15.0, "全然関係ない台詞"),   # must NOT merge
        Subtitle(8, 15.1, 16.0, "別の話題です"),
    ]
    out, stats = CrossSubtitleProcessor().process(subs)
    texts = [s.text for s in out]
    assert sum("気持ちいい" in t for t in texts) == 1   # run collapsed
    assert stats["continuations_merged"] == 2
    assert "違うと思う。" not in texts
    assert "まさかそんなこと" in texts
    assert "まさか" not in texts
    assert "全然関係ない台詞" in texts and "別の話題です" in texts
    assert stats["containment_removed"] == 1
    assert stats["stutters_collapsed"] == 1


def test_high_density_cross_subtitle_analysis():
    from whisperjav_tpu.modules.sanitize.cross_subtitle import (
        CrossSubtitleProcessor,
    )
    from whisperjav_tpu.modules.srt import Subtitle
    # "気持ちいい" saturates 6 cues; filler varies so merges don't collapse
    subs = [Subtitle(i + 1, i * 4.0, i * 4.0 + 2.0,
                     f"気持ちいい{'そこ' * (i % 3 + 1)}ですか{i}")
            for i in range(6)]
    _, stats = CrossSubtitleProcessor().process(subs)
    recs = stats["high_density_phrases"]
    assert recs and any("気持" in r["phrase"] for r in recs)
    assert all(len(r["affected"]) > 3 for r in recs)
