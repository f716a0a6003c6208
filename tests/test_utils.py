"""Tests for metadata manager, progress, analytics, async processor."""

import io
import json

import numpy as np
import pytest

from whisperjav_tpu.modules.analytics import compute_analytics
from whisperjav_tpu.modules.srt import Subtitle
from whisperjav_tpu.utils.metadata import MetadataManager
from whisperjav_tpu.utils.progress import NullProgress, ProgressManager


def test_metadata_lifecycle(tmp_path):
    mm = MetadataManager(tmp_path, "movie")
    mm.set_input(path="/x/movie.mp4", duration=3600.5)
    mm.start_stage("scene_detection", backend="energy")
    mm.complete_stage("scene_detection", scenes=42)
    mm.add_scene(index=0, start=0.0, end=20.0)
    mm.set_summary(subtitles=500)
    mm.set_quality_metrics(hallucinations_removed=np.int64(7))
    p = mm.save()
    data = json.loads(p.read_text())
    assert data["stages"]["scene_detection"]["status"] == "complete"
    assert data["stages"]["scene_detection"]["results"]["scenes"] == 42
    assert data["quality_metrics"]["hallucinations_removed"] == 7
    # reload
    mm2 = MetadataManager.load(p)
    assert mm2.data["summary"]["subtitles"] == 500


def test_metadata_fail_stage(tmp_path):
    mm = MetadataManager(tmp_path, "x")
    mm.start_stage("asr")
    mm.fail_stage("asr", "boom")
    assert mm.data["stages"]["asr"]["status"] == "failed"


def test_progress_manager_renders():
    buf = io.StringIO()
    pm = ProgressManager(enabled=True, min_interval_s=0.0, stream=buf)
    pm.task("files", 2)
    pm.advance("files")
    pm.finish("files")
    out = buf.getvalue()
    assert "files" in out
    assert "done" in out


def test_progress_suppress_external():
    pm = ProgressManager(enabled=False)
    with pm.suppress_external():
        import tqdm
        bar = tqdm.tqdm(total=10)
        assert bar.disable
        bar.close()
    bar2 = __import__("tqdm").tqdm(total=10)
    assert not bar2.disable
    bar2.close()


def test_null_progress_noop():
    np_ = NullProgress()
    np_.task("a", 1)
    np_.advance("a")
    with np_.suppress_external():
        pass


def test_analytics_healthy():
    subs = [Subtitle(i, i * 3.0, i * 3.0 + 2.0, "こんにちは世界")
            for i in range(10)]
    report = compute_analytics(subs, audio_duration_s=35.0)
    assert report["health"] == "ok"
    assert report["subtitle_count"] == 10
    assert 0.5 < report["coverage_ratio"] < 0.7


def test_analytics_flags_issues():
    subs = [Subtitle(1, 0.0, 0.05, "短"),
            Subtitle(2, 0.01, 0.5, "とても長いテキストがここにあるよ" * 3)]
    report = compute_analytics(subs, audio_duration_s=300.0)
    assert report["health"] in ("warning", "poor")
    assert report["issues"]


def test_analytics_empty():
    report = compute_analytics([], 100.0)
    assert report["health"] == "empty"


def test_resolve_checkpoint_chain(tmp_path):
    """Resolution order: local path, cache, hub, mirror; last error raised."""
    from whisperjav_tpu.utils.model_loader import resolve_checkpoint

    calls = []

    def fake_loader(src, **kw):
        calls.append((src, kw))
        if kw.get("local_files_only"):
            raise OSError("not cached")
        if len(calls) == 2:
            raise OSError("network down")
        return {"loaded": src}

    # local dir short-circuits
    d = tmp_path / "model"
    d.mkdir()
    out = resolve_checkpoint(str(d), loader=fake_loader)
    assert out == {"loaded": str(d)}
    assert len(calls) == 1

    # hub id: cache miss -> hub fail -> mirror success
    calls.clear()
    out = resolve_checkpoint("org/whisper-x", loader=fake_loader)
    assert out == {"loaded": "org/whisper-x"}
    assert [kw.get("local_files_only", False) for _, kw in calls] == \
        [True, False, False]

    # all rungs fail -> last error surfaces
    calls.clear()

    def always_fail(src, **kw):
        raise OSError("no")

    import pytest as _pytest
    with _pytest.raises(OSError):
        resolve_checkpoint("org/nope", loader=always_fail)
