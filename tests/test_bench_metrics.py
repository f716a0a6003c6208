"""Tests for the CER/IoU bench metrics."""

import numpy as np
import pytest

from whisperjav_tpu.bench.metrics import (
    boundary_drift, character_error_rate, evaluate, frame_f1, levenshtein,
    normalize_for_cer, timing_iou,
)
from whisperjav_tpu.modules.srt import Subtitle


class TestLevenshtein:
    def test_basics(self):
        assert levenshtein("", "") == 0
        assert levenshtein("abc", "abc") == 0
        assert levenshtein("abc", "") == 3
        assert levenshtein("", "xy") == 2
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("flaw", "lawn") == 2

    def test_cjk(self):
        assert levenshtein("こんにちは", "こんばんは") == 2

    def test_against_bruteforce(self):
        rng = np.random.default_rng(0)
        alphabet = "あいうえおkxyz"
        def brute(a, b):
            dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
            for i in range(len(a) + 1):
                dp[i][0] = i
            for j in range(len(b) + 1):
                dp[0][j] = j
            for i in range(1, len(a) + 1):
                for j in range(1, len(b) + 1):
                    dp[i][j] = min(dp[i-1][j] + 1, dp[i][j-1] + 1,
                                   dp[i-1][j-1] + (a[i-1] != b[j-1]))
            return dp[-1][-1]
        for _ in range(25):
            a = "".join(rng.choice(list(alphabet), rng.integers(0, 12)))
            b = "".join(rng.choice(list(alphabet), rng.integers(0, 12)))
            assert levenshtein(a, b) == brute(a, b)


def test_normalize_strips_speaker_labels():
    assert normalize_for_cer("（男）こんにちは") == "こんにちは"
    assert normalize_for_cer("[A]: hello world") == "helloworld"
    assert normalize_for_cer("ｈｅｌｌｏ") == "hello"  # NFKC fullwidth


def test_cer():
    assert character_error_rate("こんにちは", "こんにちは") == 0.0
    assert character_error_rate("こんにちは", "こんばんは") == pytest.approx(0.4)
    assert character_error_rate("", "") == 0.0
    assert character_error_rate("abc", "") == 1.0


def test_timing_iou():
    gt = [Subtitle(1, 0.0, 2.0, "a")]
    perfect = [Subtitle(1, 0.0, 2.0, "a")]
    half = [Subtitle(1, 1.0, 3.0, "a")]
    assert timing_iou(gt, perfect) == pytest.approx(1.0, abs=0.02)
    assert timing_iou(gt, half) == pytest.approx(1 / 3, abs=0.05)


def test_frame_f1():
    gt = [(0.0, 1.0), (2.0, 3.0)]
    perfect = frame_f1(gt, gt, total=4.0)
    assert perfect["f1"] == pytest.approx(1.0, abs=0.01)
    miss = frame_f1(gt, [(0.0, 1.0)], total=4.0)
    assert miss["recall"] == pytest.approx(0.5, abs=0.02)
    assert miss["precision"] == pytest.approx(1.0, abs=0.01)


def test_boundary_drift_and_evaluate():
    gt = [Subtitle(1, 0.0, 2.0, "こんにちは"), Subtitle(2, 3.0, 5.0, "世界")]
    test = [Subtitle(1, 0.1, 2.1, "こんにちは"), Subtitle(2, 3.2, 5.0, "世界")]
    drift = boundary_drift(gt, test)
    assert drift["matched"] == 2
    assert drift["mean_start_drift"] == pytest.approx(0.15, abs=0.01)
    report = evaluate(gt, test)
    assert report.cer == 0.0
    assert report.temporal_order == 1.0
    assert report.timing_iou > 0.8


def test_timing_offsets_signed_and_abs():
    """Reference: bench/metrics.py:248-280 compute_timing_offsets."""
    from whisperjav_tpu.bench.metrics import timing_offsets
    from whisperjav_tpu.modules.srt import Subtitle
    gt = [Subtitle(1, 1.0, 3.0, "a"), Subtitle(2, 5.0, 7.0, "b")]
    test = [Subtitle(1, 1.2, 3.1, "a"), Subtitle(2, 4.9, 6.8, "b")]
    off = timing_offsets(gt, test)
    assert off["matched_pairs"] == 2
    # signed: (+200 + -100)/2 = +50 ms start bias
    assert off["start_offset_mean_ms"] == pytest.approx(50.0, abs=0.1)
    assert off["start_offset_abs_mean_ms"] == pytest.approx(150.0, abs=0.1)
    assert off["end_offset_mean_ms"] == pytest.approx(-50.0, abs=0.1)
    assert off["end_offset_abs_mean_ms"] == pytest.approx(150.0, abs=0.1)


def test_timing_offsets_empty():
    from whisperjav_tpu.bench.metrics import timing_offsets
    off = timing_offsets([], [])
    assert off["matched_pairs"] == 0
