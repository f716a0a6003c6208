"""Tests for semantic scene detection and Japanese post-processing."""

import numpy as np
import pytest

from whisperjav_tpu.modules.sanitize.japanese import (
    JapanesePostProcessor, PRESETS,
)
from whisperjav_tpu.modules.scene_detection import create_scene_detector
from whisperjav_tpu.modules.scene_detection.semantic import (
    SemanticSceneDetector, compute_mfcc, texture_features,
)
from whisperjav_tpu.modules.srt import Subtitle

SR = 16000


def tone(duration_s, freq, seed=0):
    rng = np.random.default_rng(seed)
    n = int(duration_s * SR)
    t = np.arange(n) / SR
    return (0.3 * np.sin(2 * np.pi * freq * t)
            + 0.02 * rng.standard_normal(n)).astype(np.float32)


def test_mfcc_shapes():
    audio = tone(2, 440)
    mfcc = compute_mfcc(audio, SR)
    assert mfcc.shape[1] == 13
    assert mfcc.shape[0] > 150
    feats = texture_features(mfcc, 100)
    assert feats.shape[1] == 26


def test_semantic_detects_texture_change():
    # 30 s of low tone then 30 s of high tone + noise — distinct textures
    rng = np.random.default_rng(1)
    part1 = tone(30, 200)
    part2 = (0.2 * rng.standard_normal(30 * SR)).astype(np.float32)
    audio = np.concatenate([part1, part2])
    det = create_scene_detector("semantic", min_scene_s=10.0)
    result = det.detect(audio, SR)
    assert result.backend == "semantic"
    assert len(result.scenes) >= 2
    # one boundary near 30 s
    bounds = [s.start for s in result.scenes[1:]]
    assert any(abs(b - 30.0) < 5.0 for b in bounds)
    # full coverage
    assert result.scenes[0].start == 0.0
    assert abs(result.scenes[-1].end - 60.0) < 0.1


def test_semantic_short_file_single_scene():
    result = SemanticSceneDetector().detect(tone(5, 300), SR)
    assert len(result.scenes) == 1


def test_semantic_caps_max_scene():
    det = SemanticSceneDetector(min_scene_s=5.0, max_scene_s=20.0)
    result = det.detect(tone(50, 250), SR)
    assert all(s.duration <= 20.01 for s in result.scenes)


class TestJapanesePostProcessor:
    def test_particle_merge(self):
        subs = [Subtitle(1, 0.0, 1.0, "そうだ"), Subtitle(2, 1.1, 1.4, "ね")]
        out = JapanesePostProcessor().process(subs)
        assert len(out) == 1
        assert out[0].text == "そうだね"
        assert out[0].end == pytest.approx(1.4)

    def test_fragment_merges_forward(self):
        subs = [Subtitle(1, 0.0, 0.3, "あ"), Subtitle(2, 0.4, 1.5, "そういうこと")]
        out = JapanesePostProcessor().process(subs)
        assert len(out) == 1
        assert out[0].text == "あそういうこと"
        assert out[0].start == pytest.approx(0.0)

    def test_split_long_at_punctuation(self):
        text = "これは長い文章です。" * 5   # 50 chars
        subs = [Subtitle(1, 0.0, 10.0, text)]
        out = JapanesePostProcessor().process(subs)
        assert len(out) >= 2
        assert all(s.end <= 10.0 + 1e-6 for s in out)
        assert out[-1].end == pytest.approx(10.0)
        assert "".join(s.text for s in out) == text

    def test_presets_exist(self):
        assert set(PRESETS) == {"default", "high_moan", "narrative"}
        # high_moan keeps fragments
        subs = [Subtitle(1, 0.0, 0.3, "あ"), Subtitle(2, 0.4, 1.5, "そうです")]
        out = JapanesePostProcessor("high_moan").process(subs)
        assert len(out) >= 1

    def test_no_merge_across_sentence_end(self):
        subs = [Subtitle(1, 0.0, 1.0, "終わった。"),
                Subtitle(2, 1.2, 2.0, "次の話")]
        out = JapanesePostProcessor().process(subs)
        assert len(out) == 2


class TestJapaneseDeepPasses:
    """Reference: japanese_postprocessor.py passes 1/2/2.5/6."""

    def test_pure_filler_cue_dropped(self):
        subs = [Subtitle(1, 0.0, 0.5, "えっと"),
                Subtitle(2, 1.0, 3.0, "本題に入りますよ。")]
        out = JapanesePostProcessor().process(subs)
        assert [s.text for s in out] == ["本題に入りますよ。"]

    def test_leading_filler_stripped(self):
        subs = [Subtitle(1, 0.0, 3.0, "あのー、今日は晴れですね。")]
        out = JapanesePostProcessor().process(subs)
        assert out[0].text == "今日は晴れですね。"

    def test_expressive_emotion_protected(self):
        # ああ is an expressive interjection, NOT backchannel
        subs = [Subtitle(1, 0.0, 1.0, "ああ"),
                Subtitle(2, 2.0, 4.0, "気持ちいいですね。")]
        out = JapanesePostProcessor("high_moan").process(subs)
        assert any(s.text == "ああ" for s in out)

    def test_unpunctuated_split_after_definite_endings(self):
        # Qwen-style unpunctuated long text splits after です/ます forms
        text = ("今日は友達と海に行きました明日は家族と山に登ります"
                "それからゆっくり家に帰って休みます")
        subs = [Subtitle(1, 0.0, 12.0, text)]
        out = JapanesePostProcessor().process(subs)
        assert len(out) >= 2
        assert "".join(s.text for s in out) == text
        assert out[0].text.endswith("ました")

    def test_compound_particle_not_split(self):
        # ですよね must never split between です and よね
        text = "そうなんですよねだから今日は早く帰りたいと思ったんですよ"
        subs = [Subtitle(1, 0.0, 8.0, text)]
        out = JapanesePostProcessor().process(subs)
        for s in out:
            assert not s.text.startswith("よね"), s.text

    def test_tiny_fragment_merged_into_previous(self):
        subs = [Subtitle(1, 0.0, 2.0, "それでは始めます"),
                Subtitle(2, 2.05, 2.15, "ねえ")]  # 0.1 s, 2 chars → tiny
        out = JapanesePostProcessor().process(subs)
        assert len(out) == 1
        assert out[0].text == "それでは始めますねえ"

    def test_no_split_inside_quotes(self):
        text = "彼は「今日は。明日も。ずっと。」と言っていましたがどうでしょう。"
        subs = [Subtitle(1, 0.0, 8.0, text)]
        out = JapanesePostProcessor().process(subs)
        joined = "".join(s.text for s in out)
        assert joined == text
        for s in out:
            # any cue containing the opening quote must contain the close
            if "「" in s.text:
                assert "」" in s.text
