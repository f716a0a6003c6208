"""Tests for scene detection, VAD segmentation, grouping, and batching."""

import numpy as np
import pytest

from whisperjav_tpu.modules.scene_detection import create_scene_detector
from whisperjav_tpu.modules.scene_detection.energy import frame_energies_db
from whisperjav_tpu.modules.segmentation import (
    SpeechSegment, create_segmenter, group_segments,
)
from whisperjav_tpu.modules.segmentation.base import pad_segments
from whisperjav_tpu.modules.segmentation.energy_vad import vad_failover_check
from whisperjav_tpu.parallel.batching import batch_windows, Window

SR = 16000


def speech_like(duration_s, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))
    x += 0.05 * rng.standard_normal(n)
    return x.astype(np.float32)


def silence(duration_s):
    return np.zeros(int(duration_s * SR), np.float32)


def build_audio(pattern):
    """pattern: list of ('s'|'q', seconds) — speech or quiet."""
    parts = []
    for i, (kind, dur) in enumerate(pattern):
        parts.append(speech_like(dur, seed=i) if kind == "s" else silence(dur))
    return np.concatenate(parts)


def test_energy_scene_detection_splits_on_long_silence():
    audio = build_audio([("s", 5), ("q", 3), ("s", 4), ("q", 3), ("s", 2)])
    det = create_scene_detector("energy")
    result = det.detect(audio, SR)
    assert len(result.scenes) == 3
    # scene boundaries approximately at speech starts
    assert abs(result.scenes[0].start - 0.0) < 0.5
    assert abs(result.scenes[1].start - 8.0) < 0.7
    assert abs(result.scenes[2].start - 15.0) < 0.7


def test_scene_detector_caps_duration():
    audio = speech_like(70)
    det = create_scene_detector("energy", max_scene_duration_s=29.0)
    result = det.detect(audio, SR)
    assert all(s.duration <= 29.01 for s in result.scenes)
    # full coverage of continuous speech
    covered = sum(s.duration for s in result.scenes)
    assert covered > 65


def test_scene_detector_silent_file_fallback():
    det = create_scene_detector("energy")
    result = det.detect(silence(10), SR)
    assert len(result.scenes) >= 1  # whole file kept as a chapter


def test_null_scene_detector_splits_at_cap():
    det = create_scene_detector("none")
    result = det.detect(speech_like(65), SR)
    assert all(s.duration <= 29.01 for s in result.scenes)
    assert abs(result.total_duration - 65) < 0.01


def test_energy_vad_finds_speech_regions():
    audio = build_audio([("q", 1), ("s", 2), ("q", 1.5), ("s", 3), ("q", 1)])
    seg = create_segmenter("energy").segment(audio, SR)
    assert 1 <= len(seg.segments) <= 3
    assert seg.groups
    assert 0.4 < seg.speech_coverage < 1.0


def test_group_segments_respects_window():
    segs = [SpeechSegment(i * 5.0, i * 5.0 + 4.0) for i in range(10)]
    groups = group_segments(segs, max_group_duration_s=29.0, max_gap_s=2.0)
    assert all(g.duration <= 29.0 for g in groups)
    # gap is 1s (< max_gap 2s), so packing is span-limited
    assert len(groups) >= 2


def test_group_segments_splits_oversized():
    groups = group_segments([SpeechSegment(0.0, 65.0)], 29.0)
    assert len(groups) == 3
    assert all(g.duration <= 29.0 + 1e-6 for g in groups)


def test_pad_segments_overlap_prevention():
    segs = [SpeechSegment(1.0, 2.0), SpeechSegment(2.5, 3.5)]
    padded = pad_segments(segs, 10.0, pad_start_s=0.7, pad_end_s=1.3)
    assert padded[0].start == pytest.approx(0.3)
    assert padded[0].end <= padded[1].start  # no overlap
    assert padded[0].end == pytest.approx(2.25)  # midpoint of gap


def test_vad_failover():
    from whisperjav_tpu.modules.segmentation.base import SegmentationResult
    low = SegmentationResult([SpeechSegment(0, 0.5)], [], "x", 100.0)
    ok = SegmentationResult([SpeechSegment(0, 50)], [], "x", 100.0)
    assert vad_failover_check(low)
    assert not vad_failover_check(ok)


def test_batch_windows_fixed_shape():
    windows = [Window(speech_like(d), abs_start=0.0, duration=d,
                      scene_idx=i, group_idx=0)
               for i, d in enumerate([3, 10, 5, 22, 1])]
    batches = list(batch_windows(windows, batch_size=2))
    assert len(batches) == 3
    for b in batches:
        assert b.audio.shape == (2, 480000)
    # duration-sorted batching
    durs = [w.duration for b in batches for w in b.windows]
    assert durs == sorted(durs)
