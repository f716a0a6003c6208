"""Forensic loss-stage attribution (reference: tools/forensic_csv_generator.py)."""

import json

from whisperjav_tpu.bench.forensic import (
    loss_stage_rows, summarize, write_forensic_csv,
)
from whisperjav_tpu.bench.loader import load_run
from whisperjav_tpu.modules.srt import Subtitle, save_srt


def _fake_run(tmp_path):
    """A run on disk engineered so each GT cue dies at a known stage."""
    base = tmp_path / "movie.ja.whisperjav.srt"
    # final SRT: one cue matching GT#1
    save_srt(base, [Subtitle(1, 0.5, 2.0, "こんばんは今日はいい天気")])
    # windows: cover GT#1 (text), GT#3 (empty), GT#4 (text, removed),
    # GT#5 (text, lost); nothing covers GT#2
    (tmp_path / "movie.transcribe.json").write_text(json.dumps({
        "windows": [
            {"scene": 0, "group": 0, "start": 0.4, "duration": 2.0,
             "segments": 1, "chars": 12, "avg_logprob": -0.3,
             "no_speech_prob": 0.1},
            {"scene": 1, "group": 0, "start": 10.0, "duration": 2.0,
             "segments": 0, "chars": 0, "avg_logprob": None,
             "no_speech_prob": 0.9},
            {"scene": 2, "group": 0, "start": 20.0, "duration": 2.0,
             "segments": 1, "chars": 8, "avg_logprob": -0.5,
             "no_speech_prob": 0.2},
            {"scene": 3, "group": 0, "start": 30.0, "duration": 2.0,
             "segments": 1, "chars": 9, "avg_logprob": -0.4,
             "no_speech_prob": 0.2},
        ]}))
    # artifacts: sanitizer removed a cue overlapping GT#4
    save_srt(tmp_path / "movie.ja.whisperjav.artifacts.srt",
             [Subtitle(1, 20.2, 21.5, "[abnormally_fast_cps_44.0] あっ")])
    return base


def test_each_stage_classified(tmp_path):
    gt = [
        Subtitle(1, 0.5, 2.0, "こんばんは今日はいい天気"),   # matched
        Subtitle(2, 5.0, 6.0, "窓の外は雨だ"),               # coverage_loss
        Subtitle(3, 10.2, 11.0, "ねえ聞いて"),               # model_empty
        Subtitle(4, 20.2, 21.0, "あっすごい"),               # sanitizer_removed
        Subtitle(5, 30.2, 31.0, "もう帰るの"),               # text_lost
    ]
    run = load_run(_fake_run(tmp_path))
    rows = loss_stage_rows(gt, run)
    stages = [r["loss_stage"] for r in rows]
    assert stages == ["matched", "coverage_loss", "model_empty",
                      "sanitizer_removed", "text_lost"]
    assert rows[3]["removal_reason"] == "abnormally_fast_cps_44.0"
    assert rows[0]["match_similarity"] == 1.0

    s = summarize(rows)
    assert s["gt_cues"] == 5
    assert s["capture_rate"] == 0.2

    out = write_forensic_csv(tmp_path / "forensic.csv", rows)
    lines = out.read_text(encoding="utf-8").strip().splitlines()
    assert len(lines) == 6  # header + 5 rows


def test_cli_forensic_flag(tmp_path):
    from whisperjav_tpu.bench.cli import main
    base = _fake_run(tmp_path)
    gt_path = tmp_path / "gt.srt"
    save_srt(gt_path, [Subtitle(1, 0.5, 2.0, "こんばんは今日はいい天気"),
                       Subtitle(2, 5.0, 6.0, "窓の外は雨だ")])
    out_csv = tmp_path / "out.csv"
    rc = main(["-g", str(gt_path), "-t", str(base),
               "--forensic", str(out_csv), "--report",
               str(tmp_path / "r.json")])
    assert rc == 0
    assert out_csv.exists()
    assert "loss_stage" in out_csv.read_text(encoding="utf-8")
