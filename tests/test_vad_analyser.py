"""Tests for the VAD ground-truth analyser tool."""

import json

import numpy as np
import pytest

from whisperjav_tpu.modules.srt import Subtitle, save_srt
from whisperjav_tpu.tools.vad_analyser import (
    agreement_matrix, analyse, miss_fa_rates, segment_iou,
)

SR = 16000


def speech_like(duration_s, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_segment_iou():
    gt = [(0.0, 2.0), (5.0, 7.0)]
    assert segment_iou(gt, gt) == pytest.approx(1.0)
    assert segment_iou(gt, [(0.0, 2.0)]) == pytest.approx(0.5)
    assert segment_iou([], []) == 1.0


def test_miss_fa():
    gt = [(0.0, 2.0), (5.0, 7.0)]
    test = [(0.1, 1.9), (10.0, 11.0)]
    r = miss_fa_rates(gt, test)
    assert r["miss_rate"] == pytest.approx(0.5)
    assert r["false_alarm_rate"] == pytest.approx(0.5)


def test_analyse_with_gt(tmp_path):
    audio = np.concatenate([speech_like(2), np.zeros(SR, np.float32),
                            speech_like(2, 1)])
    gt_srt = tmp_path / "gt.srt"
    save_srt(gt_srt, [Subtitle(1, 0.0, 2.0, "a"), Subtitle(2, 3.0, 5.0, "b")])
    report = analyse(audio, SR, backends=("energy",), gt_srt=gt_srt,
                     report_path=tmp_path / "report.json")
    b = report["backends"][0]
    assert b["frame"]["f1"] > 0.7
    assert "segment_iou" in b and "drift" in b and "detection" in b
    assert (tmp_path / "report.json").exists()
    data = json.loads((tmp_path / "report.json").read_text())
    assert data["ground_truth"] is not None


def test_analyse_agreement_without_gt():
    audio = np.concatenate([speech_like(2), np.zeros(SR, np.float32)])
    report = analyse(audio, SR, backends=("energy", "silero"))
    m = report["agreement_matrix"]
    assert m["energy"]["energy"] == pytest.approx(1.0)
    assert 0.0 <= m["energy"]["silero-jax"] <= 1.0


def test_version_parse():
    from whisperjav_tpu.utils.version_check import parse_version
    assert parse_version("v1.2.3") == (1, 2, 3)
    assert parse_version("0.1.0") < parse_version("0.2.0")
