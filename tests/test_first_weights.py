"""Dry run of the first-weights runbook (docs/FIRST_WEIGHTS.md).

Synthesizes a vendor-named whisper HF checkpoint directory and drives
tools/first_weights.py through its stages on CPU, proving the runbook's
plumbing (detect → convert → audit → torch-oracle → int8 A/B) before a
real checkpoint ever appears.
"""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from whisperjav_tpu.tools import first_weights


@pytest.fixture(scope="module")
def whisper_ckpt(tmp_path_factory):
    cfg = transformers.WhisperConfig(
        vocab_size=1000, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=256, decoder_ffn_dim=256,
        max_source_positions=1500, max_target_positions=448,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3)
    torch.manual_seed(0)
    hf = transformers.WhisperForConditionalGeneration(cfg).eval()
    ckpt = tmp_path_factory.mktemp("fw") / "whisper-tiny-test"
    hf.save_pretrained(ckpt)
    return ckpt


def test_stages_0_and_1(whisper_ckpt, tmp_path):
    """Structural audit + torch-oracle parity must PASS on a faithful
    synthesized checkpoint (a conversion regression fails here first)."""
    report_path = tmp_path / "report.json"
    rc = first_weights.main([
        "--checkpoint", str(whisper_ckpt),
        "--report", str(report_path), "--skip-int8-gate"])
    assert rc == 0
    report = json.loads(report_path.read_text())
    assert report["ok"] is True
    assert report["stage0_structural"]["ok"] is True
    assert report["stage0_structural"]["family"] == "whisper"
    s1 = report["stage1_oracle"]
    assert s1["status"] == "pass"
    assert s1["encoder_max_err"] < first_weights.ENC_MAX_ERR
    assert s1["logit_argmax_agreement"] >= first_weights.ARGMAX_AGREE


@pytest.mark.slow
def test_int8_gate_plumbing(whisper_ckpt, tmp_path):
    """Stage 2 runs both pipeline arms end-to-end. Random weights make
    the gate OUTCOME meaningless (either verdict is acceptable); the
    dry run proves the two-arm transcribe → CER protocol executes and
    reports a finite divergence."""
    from whisperjav_tpu.tools.e2e_bench import synth_long_wav
    wav = tmp_path / "gate.wav"
    synth_long_wav(wav, minutes=6 / 60.0, seed=3)
    report_path = tmp_path / "report.json"
    rc = first_weights.main([
        "--checkpoint", str(whisper_ckpt), "--wavs", str(wav),
        "--mode", "fast", "--batch-size", "4",
        "--report", str(report_path)])
    assert rc in (0, 1)
    report = json.loads(report_path.read_text())
    s2 = report["stage2_int8_gate"]
    assert s2["status"] in ("pass", "FAIL")
    assert np.isfinite(s2["output_divergence_cer"])
    assert "no GT" in s2["protocol"]
