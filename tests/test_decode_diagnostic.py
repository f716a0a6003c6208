"""Decode diagnostic tool (reference: tools/fw_diagnostic_suite.py)."""

import json

import numpy as np
import pytest


@pytest.mark.slow
def test_diagnostic_end_to_end(tmp_path):
    from whisperjav_tpu.modules.audio_io import write_wav
    from whisperjav_tpu.tools.decode_diagnostic import main

    rng = np.random.default_rng(0)
    sr = 16000
    parts = []
    for i in range(3):
        t = np.arange(int(1.5 * sr)) / sr
        tone = (0.3 * np.sin(2 * np.pi * (200 + 60 * i) * t)
                * (1 + 0.5 * np.sin(2 * np.pi * 4 * t)))
        parts += [tone + 0.03 * rng.standard_normal(len(t)),
                  np.zeros(int(1.0 * sr))]
    wav = tmp_path / "in.wav"
    write_wav(str(wav), np.concatenate(parts).astype(np.float32), sr)

    out = tmp_path / "diag"
    rc = main([str(wav), "--model", "tiny", "--outdir", str(out),
               "--variants", "base,gates_off", "--batch", "4"])
    assert rc == 0
    summary = json.loads((out / "summary.json").read_text())
    assert "base" in summary and "gates_off" in summary
    assert "gate_attribution" in summary
    assert (out / "groups.csv").exists()
    assert (out / "vad_groups.json").exists()
    rows = (out / "groups.csv").read_text().strip().splitlines()
    assert len(rows) >= 3    # header + >=1 group x 2 variants
