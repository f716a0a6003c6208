"""whisperjav-verify-checkpoint: detection + conversion + audit wiring.

Synthesizes checkpoints in each family's VENDOR wire format (torch
state dicts with vendor names, torch-export ONNX, a real HF save_dir)
and asserts the tool detects the family, converts, audits, and smokes
them — so a user pointing it at real weights gets a diagnosis, not a
stack trace (VERDICT round-3 item 5; reference binding sites:
whisperjav/modules/speech_enhancement/backends/*.py).
"""

import json

import numpy as np
import pytest

import jax

from whisperjav_tpu.tools.verify_checkpoint import (
    detect_family_from_keys, main, verify,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------- silero

def _silero_vendor_dict():
    from whisperjav_tpu.models.vad import silero
    p = silero.init_params(jax.random.PRNGKey(0))
    sd = {"_model.stft.forward_basis_buffer":
          torch.tensor(np.asarray(p["stft_basis"])[:, 0, :])}
    for i in range(4):
        sd[f"_model.encoder.{i}.reparam_conv.weight"] = torch.tensor(
            np.asarray(p[f"enc{i}_w"]))
        sd[f"_model.encoder.{i}.reparam_conv.bias"] = torch.tensor(
            np.asarray(p[f"enc{i}_b"]))
    for name, ours in (("weight_ih", "lstm_wi"), ("weight_hh", "lstm_wh"),
                       ("bias_ih", "lstm_bi"), ("bias_hh", "lstm_bh")):
        sd[f"_model.decoder.rnn.{name}"] = torch.tensor(np.asarray(p[ours]))
    sd["_model.decoder.decoder.2.weight"] = torch.tensor(
        np.asarray(p["head_w"]))
    sd["_model.decoder.decoder.2.bias"] = torch.tensor(
        np.asarray(p["head_b"]))
    return sd


def test_silero_pt(tmp_path):
    path = tmp_path / "silero_vad.pt"
    torch.save(_silero_vendor_dict(), path)
    report = verify(str(path), forward=True)
    assert report.family == "silero", report.errors
    assert report.ok, (report.errors, report.warnings)
    assert report.forward and report.forward.startswith("ok")


def test_family_detection_from_keys():
    assert detect_family_from_keys(
        list(_silero_vendor_dict())) == "silero"
    assert detect_family_from_keys(
        ["band_split.to_features.0.0.gamma"]) == "bs_roformer"
    assert detect_family_from_keys(
        ["unet.encoders.0.conv.conv_re.weight"]) == "frcrn"
    assert detect_family_from_keys(
        ["model.mossformer.norm.weight",
         "model.mossformer.conv1d_encoder.weight",
         "model.mossformer.mdl.intra_mdl.mossformerM.layers.0.x"]) \
        == "mossformer2"
    assert detect_family_from_keys(
        ["generator.dense_encoder.conv1.weight",
         "generator.phase_decoder.conv_r.weight"]) == "zipenhancer"
    assert detect_family_from_keys(
        ["model.encoder.conv1.weight",
         "model.decoder.embed_tokens.weight"]) == "whisper"
    assert detect_family_from_keys(
        ["model.encoder.conv1.weight",
         "model.decoder.embed_tokens.weight",
         "head.weight"]) == "whisperseg"


# ---------------------------------------------------------------- whisper

@pytest.fixture(scope="module")
def tiny_hf_whisper(tmp_path_factory):
    from transformers import WhisperConfig, WhisperForConditionalGeneration
    cfg = WhisperConfig(
        vocab_size=51865, num_mel_bins=80,
        d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=2, decoder_attention_heads=2,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=1500, max_target_positions=448)
    model = WhisperForConditionalGeneration(cfg)
    out = tmp_path_factory.mktemp("hfw") / "tiny-whisper"
    model.save_pretrained(out)
    return out


def test_whisper_hf_dir(tiny_hf_whisper):
    report = verify(str(tiny_hf_whisper))
    assert report.family == "whisper", report.errors
    assert report.fmt == "hf-dir"
    assert report.ok, report.errors
    assert report.n_leaves > 10


def test_whisperseg_state_dict(tmp_path, tiny_hf_whisper):
    # whisper trunk + a (1, d) frame head = the whisperseg layout
    from transformers import WhisperForConditionalGeneration
    model = WhisperForConditionalGeneration.from_pretrained(tiny_hf_whisper)
    sd = {f"model.{k}": v for k, v in model.model.state_dict().items()}
    sd["head.weight"] = torch.zeros(1, 64) + 0.1
    sd["head.bias"] = torch.zeros(1)
    path = tmp_path / "whisperseg.bin"
    torch.save(sd, path)
    report = verify(str(path))
    assert report.family == "whisperseg", report.errors
    assert report.ok, report.errors


# ---------------------------------------------------------------- ten onnx

def test_ten_onnx(tmp_path):
    from whisperjav_tpu.models.vad import ten
    from whisperjav_tpu.utils import onnx_io
    from whisperjav_tpu.utils.onnx_io import OnnxGraph
    params = ten.init_params(jax.random.PRNGKey(3))
    names = {
        "conv1.weight": "conv1_w", "conv1.bias": "conv1_b",
        "conv2.weight": "conv2_w", "conv2.bias": "conv2_b",
        "lstm.weight_ih_l0": "lstm_wi", "lstm.weight_hh_l0": "lstm_wh",
        "lstm.bias_ih_l0": "lstm_bi", "lstm.bias_hh_l0": "lstm_bh",
        "out.weight": "out_w", "out.bias": "out_b",
    }
    g = OnnxGraph(initializers={
        onnx: np.asarray(params[ours]) for onnx, ours in names.items()})
    path = tmp_path / "ten_vad.onnx"
    onnx_io.write_onnx(str(path), g)
    report = verify(str(path), forward=True)
    assert report.family == "ten", report.errors
    assert report.ok, report.errors
    assert report.forward and report.forward.startswith("ok")


# ---------------------------------------------------------------- failure

def test_garbage_file_fails_cleanly(tmp_path):
    path = tmp_path / "junk.pt"
    torch.save({"foo.weight": torch.zeros(3, 3)}, path)
    report = verify(str(path))
    assert not report.ok
    assert report.family is None
    assert any("no converter accepted" in e for e in report.errors)


def test_nan_leaves_flagged(tmp_path):
    sd = _silero_vendor_dict()
    sd["_model.decoder.rnn.weight_ih"] = torch.full_like(
        sd["_model.decoder.rnn.weight_ih"], float("nan"))
    path = tmp_path / "silero_nan.pt"
    torch.save(sd, path)
    report = verify(str(path))
    assert report.family == "silero"
    assert not report.ok
    assert any("NaN" in e for e in report.errors)


def test_cli_json_output(tmp_path, capsys):
    path = tmp_path / "silero_vad.pt"
    torch.save(_silero_vendor_dict(), path)
    rc = main([str(path), "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["family"] == "silero" and out["ok"]
