"""Integration test for the qwen (ChronosJAV) pipeline mode."""

import json

import numpy as np
import pytest

from whisperjav_tpu.modules.audio_io import write_wav
from whisperjav_tpu.modules.media_discovery import probe
from whisperjav_tpu.modules.scene_detection.base import Scene
from whisperjav_tpu.modules.subtitle_pipeline.components import (
    AssemblyTextCleaner, QwenAlignerAdapter, QwenGenerator, VadGroupedFramer,
)
from whisperjav_tpu.modules.subtitle_pipeline.orchestrator import (
    DecoupledSubtitlePipeline,
)
from whisperjav_tpu.pipelines.qwen import QwenPipeline, safe_chunk_scenes

SR = 16000


def test_safe_chunk_scenes():
    scenes = [Scene(0, 0.0, 100.0), Scene(1, 100.0, 105.0),
              Scene(2, 105.0, 140.0)]
    out = safe_chunk_scenes(scenes, max_s=48.0, min_s=12.0)
    assert all(s.duration <= 48.0 + 1e-6 for s in out)
    # the 5 s scene was merged into a neighbor
    assert all(s.duration >= 12.0 - 1e-6 or s is out[-1] for s in out)
    # full coverage preserved
    assert out[0].start == 0.0
    assert out[-1].end == pytest.approx(140.0)
    # contiguous indices
    assert [s.index for s in out] == list(range(len(out)))


@pytest.mark.slow
def test_qwen_pipeline_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    t = np.arange(14 * SR) / SR
    audio = (0.3 * np.sin(2 * np.pi * 190 * t)
             * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
             + 0.04 * rng.standard_normal(len(t))).astype(np.float32)
    wav = tmp_path / "qwen_clip.wav"
    write_wav(wav, audio, SR)

    decoupled = DecoupledSubtitlePipeline(
        framer=VadGroupedFramer(vad_backend="energy"),
        generator=QwenGenerator(model_size="qwen3-asr-test", batch_size=2),
        cleaner=AssemblyTextCleaner(),
        aligner=QwenAlignerAdapter(),
        max_group_s=4.0,
    )
    pipe = QwenPipeline(decoupled, scene_backend="none")
    result = pipe.process(probe(wav), tmp_path / "out")
    assert result.srt_path.exists()
    meta = json.loads(
        (tmp_path / "out" / "qwen_clip.whisperjav.json").read_text())
    assert meta["pipeline"] == "qwen"
    assert "analytics" in meta
    assert meta["scene_diagnostics"]
    for s in result.subtitles:
        assert 0 <= s.start <= s.end <= 14.5
