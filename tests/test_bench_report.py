"""Deep bench harness: matcher, loader, provenance, report."""

import json

import pytest

from whisperjav_tpu.bench.loader import RunArtifacts, load_run
from whisperjav_tpu.bench.matcher import match_subtitles, text_similarity
from whisperjav_tpu.bench.provenance import (
    build_provenance, find_window, window_analytics,
)
from whisperjav_tpu.bench.report import (
    analyze, print_summary, write_json_report,
)
from whisperjav_tpu.modules.srt import Subtitle, save_srt

GT = [Subtitle(1, 1.0, 3.0, "こんにちは世界"),
      Subtitle(2, 5.0, 7.0, "ありがとうございます"),
      Subtitle(3, 10.0, 12.0, "さようなら")]


def test_matcher_buckets():
    """Reference matcher semantics: overlap-gated, similarity-ranked,
    greedy GT-order, one test cue per GT (matcher.py:19-60)."""
    test = [Subtitle(1, 1.1, 2.9, "こんにちは世界"),     # match GT1
            Subtitle(2, 5.2, 6.8, "ありがとう"),          # match GT2 (部分)
            Subtitle(3, 8.0, 8.5, "幻覚です")]            # overlaps nothing
    res = match_subtitles(GT, test)
    assert len(res.matched) == 2
    assert len(res.missed) == 1 and res.missed[0].index == 3
    assert len(res.hallucinated) == 1
    assert res.hallucinated[0].text == "幻覚です"
    assert res.recall == pytest.approx(2 / 3)
    assert res.precision == pytest.approx(2 / 3)
    assert res.to_dict()["mean_text_similarity"] > 0.5


def test_matcher_similarity_gate():
    """Temporal overlap alone is not a match — wrong text is rejected."""
    test = [Subtitle(1, 1.0, 3.0, "全然違うテキストです！！")]
    res = match_subtitles(GT, test, min_text_similarity=0.5)
    assert not res.matched
    assert len(res.hallucinated) == 1
    assert text_similarity("abc", "abc") == 1.0


def test_provenance_window_mapping():
    windows = [{"scene": 0, "group": 0, "start": 0.0, "duration": 8.0,
                "avg_logprob": -0.5, "no_speech_prob": 0.1},
               {"scene": 1, "group": 0, "start": 8.0, "duration": 8.0,
                "avg_logprob": -2.5, "no_speech_prob": 0.2}]
    assert find_window(GT[0], windows) == 0
    assert find_window(GT[2], windows) == 1
    prov = build_provenance(GT, windows)
    assert prov[0]["window"] == 0 and prov[0]["avg_logprob"] == -0.5
    assert prov[2]["scene"] == 1


def test_window_analytics_worst_first():
    windows = [{"scene": 0, "group": 0, "start": 0.0, "duration": 8.0,
                "avg_logprob": -0.5},
               {"scene": 1, "group": 0, "start": 8.0, "duration": 8.0,
                "avg_logprob": -2.5}]
    test = [Subtitle(1, 1.0, 3.0, "こんにちは世界"),
            Subtitle(2, 9.0, 9.5, "幻覚A"), Subtitle(3, 10.0, 10.5, "幻覚B")]
    res = match_subtitles(GT, test)
    worst = window_analytics(res, windows, test)
    assert worst[0]["scene"] == 1          # two hallucinations first
    assert worst[0]["hallucinated"] == 2


def test_loader_and_full_report(tmp_path, capsys):
    srt = tmp_path / "x.ja.whisperjav.srt"
    save_srt(srt, [Subtitle(1, 1.0, 3.0, "こんにちは世界"),
                   Subtitle(2, 5.0, 7.0, "ありがとうございます")])
    (tmp_path / "x.transcribe.json").write_text(json.dumps({
        "windows": [{"scene": 0, "group": 0, "start": 0.0,
                     "duration": 15.0, "avg_logprob": -0.4,
                     "no_speech_prob": 0.0}]}), encoding="utf-8")
    (tmp_path / "x.whisperjav.json").write_text(json.dumps({
        "stats": {"scenes": 1, "groups": 2, "windows": 1, "rtf_x": 100.0,
                  "sanitization": {"total_removed": 0}}}),
        encoding="utf-8")
    run = load_run(srt)
    assert len(run.subtitles) == 2
    assert run.windows and run.stats["scenes"] == 1

    analysis = analyze(GT, [run])
    r = analysis["runs"][run.name]
    assert r["matching"]["matched"] == 2
    assert r["matching"]["missed"] == 1
    assert r["stats"]["rtf_x"] == 100.0
    assert r["provenance"][0]["window"] == 0
    print_summary(analysis)
    out = capsys.readouterr().out
    assert "CER" in out and run.name[:24] in out
    path = write_json_report(analysis, tmp_path / "report.json")
    assert json.loads(path.read_text())["runs"]


def test_loader_graceful_on_missing(tmp_path):
    srt = tmp_path / "solo.srt"
    save_srt(srt, [Subtitle(1, 0.0, 1.0, "a")])
    run = load_run(srt)
    assert run.windows == [] and run.stats == {} and run.removed == []


def test_bench_cli_full_mode(tmp_path, capsys):
    from whisperjav_tpu.bench import cli as bcli
    gt = tmp_path / "gt.srt"
    save_srt(gt, GT)
    srt = tmp_path / "y.ja.whisperjav.srt"
    save_srt(srt, [Subtitle(1, 1.0, 3.0, "こんにちは世界")])
    rc = bcli.main(["-g", str(gt), "-t", str(srt), "--full",
                    "-o", str(tmp_path / "rep.json")])
    assert rc == 0
    rep = json.loads((tmp_path / "rep.json").read_text())
    name = next(iter(rep["runs"]))
    assert rep["runs"][name]["matching"]["missed"] == 2
