"""Tests for the decoupled subtitle pipeline (ChronosJAV stack)."""

import numpy as np
import pytest

from whisperjav_tpu.modules.srt import Subtitle
from whisperjav_tpu.modules.subtitle_pipeline.components import (
    AssemblyTextCleaner, FullSceneFramer, NullAligner, QwenAlignerAdapter,
    QwenGenerator, VadGroupedFramer, create_framer,
)
from whisperjav_tpu.modules.subtitle_pipeline.hardening import harden_words
from whisperjav_tpu.modules.subtitle_pipeline.orchestrator import (
    DecoupledSubtitlePipeline,
)
from whisperjav_tpu.modules.subtitle_pipeline.reconstruction import (
    RegroupConfig, regroup_words,
)
from whisperjav_tpu.modules.subtitle_pipeline.sentinel import (
    assess_alignment_quality, redistribute_collapsed_words,
)
from whisperjav_tpu.modules.subtitle_pipeline.types import (
    HardeningConfig, RegroupMode, TimestampMode, TranscriptionResult,
    WordTimestamp,
)

SR = 16000


def W(word, start, end):
    return WordTimestamp(word, start, end)


class TestSentinel:
    def test_healthy_alignment(self):
        words = [W("こ", 0.0, 0.4), W("ん", 0.5, 0.9), W("に", 1.0, 1.4),
                 W("ち", 1.5, 1.9)]
        q = assess_alignment_quality(words, 2.0)
        assert not q.collapsed

    def test_null_collapse(self):
        words = [W("a", None, None)] * 5 + [W("b", 0.1, 0.2)]
        q = assess_alignment_quality(words, 5.0)
        assert q.collapsed
        assert "null" in q.reason

    def test_pileup_collapse(self):
        words = [W(c, 0.0, 0.01) for c in "あいうえおかきく"]
        q = assess_alignment_quality(words, 10.0)
        assert q.collapsed

    def test_redistribute_vad_guided(self):
        words = [W("あ", None, None), W("い", None, None),
                 W("う", None, None), W("え", None, None)]
        out = redistribute_collapsed_words(words, 10.0,
                                           [(1.0, 3.0), (6.0, 8.0)])
        assert len(out) == 4
        assert out[0].start == pytest.approx(1.0)
        assert out[-1].end == pytest.approx(8.0)
        # monotonic
        for a, b in zip(out[:-1], out[1:]):
            assert b.start >= a.start


class TestHardening:
    def test_interpolation(self):
        words = [W("一", 0.0, 1.0), W("二", None, None), W("三", None, None),
                 W("四", 3.0, 4.0)]
        out, actions = harden_words(
            words, 10.0,
            HardeningConfig(TimestampMode.ALIGNER_INTERPOLATION))
        assert actions >= 2
        assert out[1].start == pytest.approx(1.0)
        assert out[2].end == pytest.approx(3.0)

    def test_vad_fallback_for_hopeless(self):
        words = [W("一", None, None), W("二", None, None)]
        out, _ = harden_words(
            words, 4.0, HardeningConfig(TimestampMode.ALIGNER_VAD_FALLBACK),
            speech_regions=[(1.0, 3.0)])
        assert all(w.start is not None for w in out)
        assert out[0].start >= 1.0 - 1e-6

    def test_aligner_only_drops(self):
        words = [W("一", 0.0, 1.0), W("二", None, None)]
        out, _ = harden_words(words, 5.0,
                              HardeningConfig(TimestampMode.ALIGNER_ONLY))
        assert len(out) == 1

    def test_clamps_to_scene(self):
        words = [W("一", -1.0, 20.0)]
        out, _ = harden_words(words, 5.0, HardeningConfig())
        assert out[0].start >= 0.0 and out[0].end <= 5.0


class TestReconstruction:
    def test_gap_split(self):
        words = [W("前", 0.0, 0.5), W("半", 0.5, 1.0),
                 W("後", 3.0, 3.5), W("半", 3.5, 4.0)]
        cues = regroup_words(words)
        assert len(cues) == 2
        assert cues[0].text == "前半"
        assert cues[1].text == "後半"

    def test_sentence_split(self):
        words = [W("終わり。", 0.0, 1.0), W("次", 1.1, 1.5)]
        cues = regroup_words(words, RegroupMode.SENTENCE_ONLY)
        assert len(cues) == 2

    def test_off_mode_single_cue(self):
        words = [W("あ", 0.0, 0.5), W("い", 2.0, 2.5)]
        cues = regroup_words(words, RegroupMode.OFF)
        assert len(cues) == 1

    def test_char_cap(self):
        words = [W("あいうえ", i * 0.5, i * 0.5 + 0.4) for i in range(20)]
        cues = regroup_words(words, config=RegroupConfig(max_cue_chars=12))
        assert all(len(c.text) <= 12 for c in cues)


def speech_like(duration_s, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    x = 0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 4 * t))
    return (x + 0.05 * rng.standard_normal(n)).astype(np.float32)


def test_framers():
    audio = np.concatenate([speech_like(3), np.zeros(SR, np.float32),
                            speech_like(3, 1)])
    fr = VadGroupedFramer(vad_backend="energy").frame(audio, SR, 6.0)
    assert fr.frames
    assert fr.speech_regions
    assert all(f.duration <= 6.0 + 1e-6 for f in fr.frames)

    fr2 = FullSceneFramer().frame(audio, SR, 3.0)
    assert len(fr2.frames) == 3

    fr3 = create_framer("manual", boundaries=[(0.0, 2.0), (4.0, 6.0)]
                        ).frame(audio, SR, 6.0)
    assert len(fr3.frames) == 2


def test_assembly_cleaner():
    cleaner = AssemblyTextCleaner()
    results = [
        TranscriptionResult(0, "そうだだだだだだだ、ね。"),
        TranscriptionResult(1, "ご視聴ありがとうございました"),
    ]
    out = cleaner.clean_batch(results)
    assert "、" in out[0].text          # punctuation preserved
    assert len(out[0].text) < len(results[0].text)
    assert out[1].text == ""            # hallucination emptied
    assert out[1].raw_text == results[1].text


@pytest.mark.slow
def test_decoupled_pipeline_end_to_end():
    """Full frame→generate→clean→align→harden→regroup flow with tiny
    random models: output must be structurally valid subtitles."""
    audio = np.concatenate([speech_like(2), np.zeros(SR // 2, np.float32),
                            speech_like(2, 1)])
    pipe = DecoupledSubtitlePipeline(
        framer=VadGroupedFramer(vad_backend="energy"),
        generator=QwenGenerator(model_size="qwen3-asr-test", batch_size=2),
        cleaner=AssemblyTextCleaner(),
        aligner=QwenAlignerAdapter(),
        max_group_s=3.0,
    )
    outputs = pipe.process_scenes([audio], SR)
    assert len(outputs) == 1
    out = outputs[0]
    assert out.diagnostics.frames >= 1
    dur = len(audio) / SR
    for s in out.subtitles:
        assert 0 <= s.start <= s.end <= dur + 1e-6
    d = out.diagnostics.to_dict()
    assert d["schema_version"] == "2.0.0"


def test_decoupled_pipeline_null_aligner():
    """VAD_ONLY hardening path with the null aligner."""
    audio = speech_like(3)
    pipe = DecoupledSubtitlePipeline(
        framer=FullSceneFramer(),
        generator=_FakeGenerator(),
        cleaner=AssemblyTextCleaner(),
        aligner=NullAligner(),
        max_group_s=3.0,
        hardening=HardeningConfig(TimestampMode.VAD_ONLY),
    )
    outputs = pipe.process_scenes([audio], SR)
    subs = outputs[0].subtitles
    assert subs
    assert all(s.end <= 3.0 + 1e-6 for s in subs)


class _FakeGenerator:
    name = "fake"

    def load(self): ...

    def unload(self): ...

    def generate_batch(self, clips, sr):
        return [TranscriptionResult(i, "こんにちは世界です")
                for i in range(len(clips))]


def test_regroup_jav_full_algebra():
    """REGROUP_JAV pass sequence: punct split, gap split, fragment merge,
    comma split when long, char cap, duration cap (reference:
    reconstruction.py:62-104)."""
    from whisperjav_tpu.modules.subtitle_pipeline.reconstruction import (
        RegroupConfig, regroup_words,
    )
    from whisperjav_tpu.modules.subtitle_pipeline.types import (
        RegroupMode, WordTimestamp,
    )

    def w(t0, t1, text):
        return WordTimestamp(text, t0, t1)

    words = (
        # sentence 1 ends with 。 → split
        [w(0.0, 0.4, "これは"), w(0.4, 0.8, "文です。")]
        # fragment within 1.5s → merged with next words
        + [w(1.0, 1.2, "で")]
        + [w(1.3, 1.8, "続きます")]
        # 2s gap → gap split
        + [w(3.9, 4.3, "次の"), w(4.3, 4.8, "話")]
    )
    cues = regroup_words(words, RegroupMode.STANDARD)
    texts = [c.text for c in cues]
    assert texts[0] == "これは文です。"
    assert "で続きます" in texts[1]            # fragment merged
    assert texts[-1] == "次の話"               # gap split

    # comma split only when > 50 chars
    long_words = []
    t = 0.0
    for i in range(12):
        seg = "ながいことばが" + ("つづく" if i % 3 else "つづき、")
        long_words.append(w(t, t + 0.5, seg))
        t += 0.5
    cues = regroup_words(long_words, RegroupMode.SENTENCE_ONLY)
    assert len(cues) >= 2                      # comma/char caps split it
    assert all(len(c.text) <= 80 for c in cues)

    # duration cap 8s
    slow = [w(i * 3.0, i * 3.0 + 2.9, f"ことば{i}") for i in range(5)]
    cues = regroup_words(slow, RegroupMode.STANDARD,
                         RegroupConfig(gap_split_s=10.0, merge_gap_s=0.0))
    assert all(c.duration <= 8.0 + 3.0 for c in cues)
    assert len(cues) >= 2


class TestCohereStyleGenerator:
    """The experimental `cohere` generator slot (reference:
    generators/cohere.py — text-only LALM, chunk reassembly, greedy,
    context ignored, chain-aware load diagnostics)."""

    def _gen(self, chunk_s=2.0, overlap_s=0.5):
        from whisperjav_tpu.modules.subtitle_pipeline.components import (
            CohereStyleGenerator,
        )
        g = CohereStyleGenerator(chunk_s=chunk_s, overlap_s=overlap_s)

        class _Inner:
            checkpoint = None

            def __init__(self):
                self.calls = []
                self._params = object()

            def load(self): ...

            def unload(self): self._params = None

            def generate_batch(self, clips, sr):
                self.calls.append([len(c) for c in clips])
                return [TranscriptionResult(i, f"piece{i}ですよ", -0.5)
                        for i in range(len(clips))]

        g._inner = _Inner()
        return g

    def test_join_overlapped(self):
        from whisperjav_tpu.modules.subtitle_pipeline.components import (
            CohereStyleGenerator as G,
        )
        assert G._join_overlapped("", "abc") == "abc"
        assert G._join_overlapped("abc", "") == "abc"
        # longest suffix/prefix overlap is dropped from the second chunk
        assert G._join_overlapped("こんにちは世界", "は世界です") \
            == "こんにちは世界です"
        # below the minimum overlap (3 chars) nothing is deduped
        assert G._join_overlapped("abcd", "cdxy") == "abcdcdxy"

    def test_short_clips_pass_through(self):
        g = self._gen()
        clips = [np.zeros(SR, np.float32), np.zeros(SR // 2, np.float32)]
        out = g.generate_batch(clips, SR)
        assert [r.frame_index for r in out] == [0, 1]
        assert g._inner.calls == [[SR, SR // 2]]     # one piece per clip

    def test_long_clip_chunked_and_reassembled(self):
        g = self._gen(chunk_s=2.0, overlap_s=0.5)
        clips = [np.zeros(5 * SR, np.float32)]       # 5 s -> 3 chunks
        out = g.generate_batch(clips, SR)
        assert len(out) == 1
        assert len(g._inner.calls[0]) == 3
        # all chunk texts contributed to the single reassembled result
        assert "piece0" in out[0].text and "piece2" in out[0].text
        assert out[0].avg_logprob == pytest.approx(-0.5)

    def test_context_ignored(self):
        g = self._gen()
        out = g.generate_batch([np.zeros(SR, np.float32)], SR,
                               contexts=["名前は太郎"])
        assert len(out) == 1                          # no error, no effect

    def test_load_error_diagnostic(self):
        g = self._gen()

        def boom():
            try:
                raise FileNotFoundError("model.safetensors does not exist")
            except FileNotFoundError as e:
                raise OSError("Can't load the model") from e

        g._inner.load = boom
        g._inner.checkpoint = "/nonexistent/ckpt"
        with pytest.raises(RuntimeError) as ei:
            g.load()
        msg = str(ei.value)
        assert "missing" in msg            # classified, actionable
        assert "[1]" in msg                # full chain preserved

    def test_factory_registration(self):
        from whisperjav_tpu.modules.subtitle_pipeline.components import (
            CohereStyleGenerator, create_generator,
        )
        assert isinstance(create_generator("cohere"), CohereStyleGenerator)

    @pytest.mark.slow
    def test_real_model_end_to_end(self):
        """cohere slot through the full decoupled pipeline with the tiny
        random qwen LALM — structurally valid subtitles."""
        from whisperjav_tpu.modules.subtitle_pipeline.components import (
            CohereStyleGenerator,
        )
        audio = np.concatenate([speech_like(2),
                                np.zeros(SR // 2, np.float32),
                                speech_like(2, 1)])
        pipe = DecoupledSubtitlePipeline(
            framer=VadGroupedFramer(vad_backend="energy"),
            generator=CohereStyleGenerator(model_size="qwen3-asr-test",
                                           batch_size=2, chunk_s=3.0),
            cleaner=AssemblyTextCleaner(),
            aligner=NullAligner(),
            max_group_s=3.0,
            hardening=HardeningConfig(TimestampMode.VAD_ONLY),
        )
        outputs = pipe.process_scenes([audio], SR)
        assert len(outputs) == 1
        dur = len(audio) / SR
        for s in outputs[0].subtitles:
            assert 0 <= s.start <= s.end <= dur + 1e-6


# ------------------------------------------- cross-scene pooled batching


class TestPooledScenes:
    """ADR-002 round 5: device work batches ACROSS scenes; results must
    match the scene-sequential path exactly for deterministic
    components."""

    def _pipe(self):
        from whisperjav_tpu.models.qwen.aligner import (
            AlignerConfig, ForcedAligner,
        )
        tiny = ForcedAligner(AlignerConfig(n_layers=2, d_model=64,
                                           n_heads=4))
        return DecoupledSubtitlePipeline(
            framer=VadGroupedFramer(vad_backend="energy"),
            generator=_FakeGenerator(),
            cleaner=AssemblyTextCleaner(),
            aligner=QwenAlignerAdapter(aligner=tiny),
            max_group_s=3.0,
        )

    def test_pooled_matches_sequential(self, monkeypatch):
        scenes = [
            np.concatenate([speech_like(2), np.zeros(SR // 2, np.float32),
                            speech_like(2, 1)]),
            speech_like(3, 2),
        ]
        monkeypatch.setenv("WJAV_POOL_SCENES", "0")
        seq = self._pipe().process_scenes(scenes, SR)
        monkeypatch.setenv("WJAV_POOL_SCENES", "1")
        pooled = self._pipe().process_scenes(scenes, SR)
        assert len(seq) == len(pooled) == 2
        for a, b in zip(seq, pooled):
            assert [(s.text, round(s.start, 3), round(s.end, 3))
                    for s in a.subtitles] \
                == [(s.text, round(s.start, 3), round(s.end, 3))
                    for s in b.subtitles]
            da, db = a.diagnostics, b.diagnostics
            assert da.frames == db.frames
            assert da.collapsed_frames == db.collapsed_frames
            assert da.aligned_words == db.aligned_words
            assert da.generated_chars == db.generated_chars

    def test_pooled_stage_walls_cover_all_steps(self, monkeypatch):
        monkeypatch.setenv("WJAV_POOL_SCENES", "1")
        outs = self._pipe().process_scenes(
            [speech_like(2), speech_like(2, 1)], SR)
        total = {}
        for o in outs:
            for k, v in o.diagnostics.stage_s.items():
                total[k] = total.get(k, 0.0) + v
        for step in ("frame", "generate", "clean", "align", "assemble"):
            assert step in total

    def test_pooled_empty_scene(self, monkeypatch):
        monkeypatch.setenv("WJAV_POOL_SCENES", "1")
        outs = self._pipe().process_scenes(
            [np.zeros(SR, np.float32), speech_like(2)], SR)
        assert len(outs) == 2
        assert outs[0].diagnostics.frames == 0


def test_aligner_batch_composition_invariance():
    """Masked fixed-shape batching must make co-batched rows inert:
    the same clip aligns identically regardless of which other clips
    share its device batch (the property that makes bucketing safe)."""
    from whisperjav_tpu.models.qwen.aligner import (
        AlignerConfig, ForcedAligner,
    )
    tiny = ForcedAligner(AlignerConfig(n_layers=2, d_model=64, n_heads=4))
    ad = QwenAlignerAdapter(aligner=tiny)
    a = speech_like(1.5, 3)
    b = speech_like(2.8, 4)
    texts = ["こんにちは世界", "ありがとうございます"]
    r1 = ad.align_batch([a, b], SR, texts)
    r2 = ad.align_batch([b, a, a], SR, [texts[1], texts[0], texts[0]])
    w_a1 = [(w.word, w.start, w.end) for w in r1[0].words]
    w_a2 = [(w.word, w.start, w.end) for w in r2[1].words]
    w_b1 = [(w.word, w.start, w.end) for w in r1[1].words]
    w_b2 = [(w.word, w.start, w.end) for w in r2[0].words]
    assert w_a1 == w_a2
    assert w_b1 == w_b2
    assert w_a1 and w_b1
    for _, s, e in w_a1:
        assert 0 <= s <= e <= 2.0 + 1e-6
