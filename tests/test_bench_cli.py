"""Smoke tests for the whisperjav-bench CLI and parity-check tool."""

import json

import numpy as np
import pytest

from whisperjav_tpu.bench.cli import main as bench_main
from whisperjav_tpu.modules.srt import Subtitle, save_srt


def _srts(tmp_path):
    gt = [Subtitle(1, 0.0, 2.0, "こんにちは"), Subtitle(2, 3.0, 5.0, "世界")]
    test = [Subtitle(1, 0.1, 2.1, "こんにちは"), Subtitle(2, 3.2, 5.1, "世界です")]
    gp, tp = tmp_path / "gt.srt", tmp_path / "test.srt"
    save_srt(gp, gt)
    save_srt(tp, test)
    return gp, tp


def test_bench_cli_stdout(tmp_path, capsys):
    gp, tp = _srts(tmp_path)
    rc = bench_main(["-g", str(gp), "-t", str(tp)])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert "provenance" in report
    r = report["results"][str(tp)]
    assert 0.0 < r["cer"] < 0.5
    assert r["timing_iou"] > 0.7


def test_bench_cli_report_file(tmp_path):
    gp, tp = _srts(tmp_path)
    out = tmp_path / "report.json"
    rc = bench_main(["-g", str(gp), "-t", str(tp), "-o", str(out)])
    assert rc == 0
    assert json.loads(out.read_text())["results"]


@pytest.mark.slow
def test_parity_check_tool(tmp_path, monkeypatch, capsys):
    import jax
    from whisperjav_tpu.models.whisper.config import WhisperConfig
    from whisperjav_tpu.models.whisper.model import init_params
    import whisperjav_tpu.pipelines.factory as factory
    from whisperjav_tpu.modules.audio_io import write_wav
    from whisperjav_tpu.tools.parity_check import main as parity_main

    TINY = WhisperConfig(name="parity-tiny", n_audio_state=64,
                         n_audio_head=4, n_audio_layer=2, n_text_state=64,
                         n_text_head=4, n_text_layer=2)
    params = init_params(TINY, jax.random.PRNGKey(0))
    monkeypatch.setattr(factory, "load_model", lambda *a, **k: (TINY, params))

    sr = 16000
    t = np.arange(5 * sr) / sr
    wav = tmp_path / "clip.wav"
    write_wav(wav, (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32), sr)
    gt = tmp_path / "gt.srt"
    save_srt(gt, [Subtitle(1, 0.0, 5.0, "テスト音声")])

    report = tmp_path / "parity.json"
    rc = parity_main(["--pairs", f"{wav}:{gt}", "--mode", "fast",
                      "--batch-size", "2", "--report", str(report),
                      "--output-dir", str(tmp_path / "out")])
    assert rc == 0
    data = json.loads(report.read_text())
    assert "mean_cer" in data
    assert str(wav) in data["results"]
    assert data["results"][str(wav)]["rtf_x"] > 0
