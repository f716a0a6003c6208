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


class TestFullAnalytics:
    """Reference: pipeline_analytics.py:149-465 metric families."""

    def _subs(self):
        from whisperjav_tpu.modules.srt import Subtitle
        return [Subtitle(1, 0.0, 2.0, "こんにちは"),
                Subtitle(2, 2.5, 4.0, "元気ですか"),
                Subtitle(3, 50.0, 52.0, "大きな隙間の後")]

    def test_scorecard_levels_and_families(self):
        from whisperjav_tpu.modules.analytics import compute_full_analytics
        diag = [{"frames": 10, "collapsed_frames": 1, "step_down_retries": 1,
                 "aligned_words": 100, "null_timestamp_words": 5,
                 "hardening_actions": 2}]
        rep = compute_full_analytics(
            self._subs(), 60.0, scene_spans=[(0.0, 30.0), (30.0, 60.0)],
            scene_diagnostics=diag, speech_regions_s=20.0)
        assert rep["scene_metrics"]["scene_count"] == 2
        assert rep["scene_metrics"]["speech_ratio"] == pytest.approx(20 / 60, abs=1e-3)
        assert rep["alignment_metrics"]["collapse_rate"] == pytest.approx(0.1)
        assert rep["alignment_metrics"]["aligner_native_pct"] == 95.0
        assert rep["timing_metrics"]["max_gap_sec"] == pytest.approx(46.0)
        assert rep["timing_metrics"]["large_gaps"][0]["gap_sec"] == 46.0
        names = {i["name"]: i["level"] for i in rep["scorecard"]}
        assert names["Collapse rate"] == "YELLOW"       # 10% in [5,20)
        assert names["Aligner native"] == "GREEN"       # 95% > 90
        assert names["Speech ratio"] == "GREEN"         # 33%
        assert names["Max gap"] == "YELLOW"             # 46 s in [30,60)
        assert names["Short subs (<0.3s)"] == "GREEN"

    def test_print_summary_runs(self, caplog):
        from whisperjav_tpu.modules.analytics import (
            compute_full_analytics, print_summary,
        )
        rep = compute_full_analytics(self._subs(), 60.0)
        print_summary(rep, title="t")
