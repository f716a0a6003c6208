"""Tests for the subtitle sanitization chain."""

import pytest

from whisperjav_tpu.modules.sanitize import (
    HallucinationRemover, RepetitionCleaner, SRTPostProcessor,
    SubtitleSanitizer,
)
from whisperjav_tpu.modules.srt import Subtitle


class TestRepetitionCleaner:
    def setup_method(self):
        self.rc = RepetitionCleaner()

    def test_char_run_collapse(self):
        # reference: single_char_whitespace_flood collapses floods to a
        # doubled echo (repetition_cleaner.py:63)
        out, stats = self.rc.clean("あああああああ")
        assert out == "ああ"
        assert stats.curated >= 1

    def test_phrase_loop_collapse(self):
        # multi_char_word: (だめ) x5 → doubled unit (reference :57)
        out, stats = self.rc.clean("だめだめだめだめだめ")
        assert out == "だめだめ"
        assert stats.by_type.get("multi_char_word") == 1

    def test_laughter_collapses_to_echo(self):
        # prefix_plus_char: うふふふふ → うふふ (reference :67)
        out, _ = self.rc.clean("うふふふふ")
        assert out == "うふふ"

    def test_normal_text_unchanged(self):
        text = "今日はいい天気ですね"
        out, stats = self.rc.clean(text)
        assert out == text
        assert stats.total == 0

    def test_punct_run_is_not_repetition_business(self):
        # punctuation-only runs are the hallucination regex DB's job
        # (regexp_v09 full-line categories) / the symbol-residue purge —
        # the repetition layer leaves them alone (reference parity)
        out, stats = self.rc.clean("そうか。。。。。")
        assert out == "そうか。。。。。"
        assert stats.total == 0

    def test_generic_dominance_safety_net(self):
        text = "お腹すいた" * 9            # 45 chars, no curated match
        out, stats = self.rc.clean(text)
        assert out == "お腹すいたお腹すいた"
        assert stats.generic == 1

    def test_generic_collapses_long_loops_before_truncation(self):
        # a dominant unit repeated past 200 chars is the GENERIC layer's
        # business (coverage 100% ≥ 50%), never reaching layer 3
        text = "これは長い文章で、まだ続きます。" * 16
        out, stats = self.rc.clean(text)
        assert out == "これは長い文章で、まだ続きます。"
        assert stats.generic == 1 and stats.truncated == 0

    def test_length_limit_truncation(self):
        # >200 chars of NON-repeating content (no unit covers 50%) hits
        # the layer-3 limit and breaks at the last 。 above the 75% floor
        uniq = [chr(c) for c in range(0x4E00, 0x4E00 + 240)]
        text = "".join(ch + ("。" if i % 30 == 29 else "")
                       for i, ch in enumerate(uniq))
        assert len(text) > 200
        out, stats = self.rc.clean(text)
        assert stats.truncated == 1
        assert 150 <= len(out) <= 200   # broke at 。 above the 75% floor

    def test_never_wipes_line(self):
        out, _ = self.rc.clean("ああああああああああ")
        assert out.strip()

    def test_density_check(self):
        assert self.rc.is_mostly_repetition("はいはいはいはいはいはいはいはい")
        assert not self.rc.is_mostly_repetition("普通の文章です、特に繰り返しなし")


class TestHallucinationRemover:
    def setup_method(self):
        self.hr = HallucinationRemover("ja")

    def test_exact_blacklist(self):
        assert self.hr.is_hallucination("ご視聴ありがとうございました")
        # NFKC/whitespace-insensitive
        assert self.hr.is_hallucination("ご視聴 ありがとう ございました")
        assert not self.hr.is_hallucination("映画を見た")

    def test_music_marker_drops_line(self):
        # emoji/music-symbol gate: any ♪ drops the whole line
        # (reference hallucination_remover.py emoji-contains drop)
        out, stats = self.hr.clean("♪〜 こんにちは")
        assert out == ""
        assert stats.emoji_removed >= 1

    def test_clean_whole_line_hallucination(self):
        # in the DB with a trailing comma — punct-stripped stage catches it
        out, stats = self.hr.clean("チャンネル登録お願いします")
        assert out == ""
        assert stats.total >= 1

    def test_regex_db_full_line_category(self):
        # media_reference pattern 'チャンネル登録[をお]?[願いし]…' from
        # regexp_v09.json drops the whole line
        out, stats = self.hr.clean("チャンネル登録お願いいたします")
        assert out == ""
        assert stats.total >= 1

    def test_bundled_db_loaded(self):
        dbstats = self.hr.database_stats()
        assert dbstats["exact_lists"]["japanese"] >= 3000   # deduped ~3350
        assert dbstats["regex_patterns"] >= 30

    def test_bracketed_context_dropped(self):
        out, stats = self.hr.clean("（音楽）")
        assert out == "" and stats.bracket_removed == 1

    def test_valid_japanese_not_fuzzy_matched(self):
        out, _ = self.hr.clean("今日は映画を見ました。")
        assert out == "今日は映画を見ました。"

    def test_slice_syntax_replacement(self):
        from whisperjav_tpu.modules.sanitize.hallucinations import (
            apply_regex_replacement_safe,
        )
        import re
        pat = re.compile(r"(あ+)")
        assert apply_regex_replacement_safe(pat, "${1:0:2}",
                                            "あああああ!") == "ああ!"

    def test_extendable(self):
        self.hr.add_phrases(["カスタム幻覚フレーズ"])
        assert self.hr.is_hallucination("カスタム幻覚フレーズ")


class TestSubtitleSanitizer:
    def test_full_chain(self):
        subs = [
            Subtitle(1, 0.0, 2.0, "映画を見ましたよ"),
            Subtitle(2, 2.0, 4.0, ""),                       # empty
            Subtitle(3, 4.0, 6.0, "ご視聴ありがとうございました"),  # hallucination
            Subtitle(4, 6.0, 8.0, "ああああああああ"),          # repetition
            Subtitle(5, 8.0, 8.6, "次の台詞"),
            Subtitle(6, 8.8, 9.2, "次の台詞"),               # duplicate run…
            Subtitle(7, 9.4, 9.9, "次の台詞"),               # …of three merges
            Subtitle(8, 10.0, 10.1, "とても長いテキストがここにあります"),  # CPS
            Subtitle(9, 11.0, 30.0, "長すぎる字幕"),           # >12s
        ]
        san = SubtitleSanitizer("ja")
        out, report = san.process(subs)
        texts = [s.text for s in out]
        assert "映画を見ましたよ" in texts
        assert "ご視聴ありがとうございました" not in texts
        assert report.empty_removed == 1
        assert report.hallucinations_removed >= 1
        assert report.duplicates_merged == 2     # run of 3 → one cue
        assert report.cps_violations_removed == 1
        # long subtitle clamped
        long_sub = [s for s in out if s.text == "長すぎる字幕"][0]
        assert long_sub.duration <= 12.0
        # renumbered
        assert [s.index for s in out] == list(range(1, len(out) + 1))

    def test_timing_monotonic(self):
        # terminal punctuation so the cross-subtitle continuation merge
        # leaves the cues alone and only the timing pass acts
        subs = [Subtitle(1, 0.0, 5.0, "これは文です。"),
                Subtitle(2, 3.0, 6.0, "次の文です。")]
        out, _ = SubtitleSanitizer("ja").process(subs)
        assert len(out) == 2
        assert out[1].start >= out[0].end


def test_postprocessor_router():
    subs = [Subtitle(1, 0, 2, "thanks for watching"),
            Subtitle(2, 3, 5, "real dialogue here")]
    pp = SRTPostProcessor()
    out, stats = pp.process(subs, language="en")
    assert len(out) == 1
    assert stats["hallucinations_removed"] == 1

    out_ja, _ = pp.process([Subtitle(1, 0, 2, "映画を見ましたよ")], language="japanese")
    assert len(out_ja) == 1


def test_cross_subtitle_wired_into_chain():
    """CrossSubtitleProcessor runs inside the sanitizer (VERDICT item 7):
    a cue contained in an overlapping neighbor is dropped."""
    subs = [
        Subtitle(1, 0.0, 3.0, "長い台詞の全体がここにある"),
        Subtitle(2, 2.5, 4.0, "台詞の全体"),       # contained + overlapping
        Subtitle(3, 5.0, 7.0, "別の台詞です"),
    ]
    out, report = SubtitleSanitizer("ja").process(subs)
    assert report.cross_removed == 1
    assert len(out) == 2


def test_write_artifacts_srt(tmp_path):
    from whisperjav_tpu.modules.sanitize.sanitizer import write_artifacts_srt
    from whisperjav_tpu.modules.srt import load_srt

    arts = [{"reason": "hallucination", "start": 1.0, "end": 2.5,
             "text": "ご視聴ありがとうございました"},
            {"reason": "cps", "start": 4.0, "end": 4.1, "text": "速すぎ"}]
    path = tmp_path / "x.artifacts.srt"
    write_artifacts_srt(path, arts, {"hallucinations_removed": 1,
                                     "cps_violations_removed": 1})
    cues = load_srt(path)
    assert len(cues) == 3                       # 2 removals + summary
    assert cues[0].text.startswith("[hallucination]")
    assert "summary" in cues[-1].text


class TestContentAwareTiming:
    """Reference: modules/timing_adjuster.py:44-200 — retiming conditions."""

    def test_hallucination_duration_retimed_to_reading_speed(self):
        from whisperjav_tpu.modules.sanitize.sanitizer import SubtitleSanitizer
        subs = [Subtitle(1, 0.0, 19.0, "短い台詞です。")]   # 19 s for 7 chars
        out, report = SubtitleSanitizer("ja").process(subs)
        assert len(out) == 1
        s = out[0]
        assert s.end == 19.0                       # end is the fixed anchor
        assert s.duration == pytest.approx(1.0, abs=0.2)  # 7 chars / 7 cps
        assert report.timing_adjusted >= 1

    def test_merged_duplicate_is_retimed(self):
        from whisperjav_tpu.modules.sanitize.sanitizer import SubtitleSanitizer
        subs = [Subtitle(1, 8.0, 9.0, "次の台詞。"),
                Subtitle(2, 9.2, 10.0, "次の台詞。"),
                Subtitle(3, 10.3, 12.0, "次の台詞。")]   # run of 3 merges
        out, report = SubtitleSanitizer("ja").process(subs)
        assert len(out) == 1
        assert report.duplicates_merged == 2
        # merged cue duration moved >0.25 s with short text → condition (c)
        assert out[0].end == 12.0
        assert out[0].duration < 4.0

    def test_lone_repeat_pair_not_merged(self):
        """Reference DEDUP_THRESHOLD=3: a single repeat (run of 2) is an
        intentional repeat and stays as two cues."""
        from whisperjav_tpu.modules.sanitize.sanitizer import SubtitleSanitizer
        subs = [Subtitle(1, 8.0, 9.0, "もっと強い言葉で言って"),
                Subtitle(2, 9.2, 10.0, "もっと強い言葉で言って")]
        out, report = SubtitleSanitizer("ja").process(subs)
        assert len(out) == 2
        assert report.duplicates_merged == 0

    def test_untouched_cue_keeps_model_timestamps(self):
        from whisperjav_tpu.modules.sanitize.sanitizer import SubtitleSanitizer
        subs = [Subtitle(1, 1.0, 3.5, "普通の台詞がここにあります。")]
        out, _ = SubtitleSanitizer("ja").process(subs)
        assert (out[0].start, out[0].end) == (1.0, 3.5)

    def test_slow_cps_short_text_removed(self):
        from whisperjav_tpu.modules.sanitize.sanitizer import SubtitleSanitizer
        subs = [Subtitle(1, 0.0, 5.0, "息子")]    # 2 chars / 5 s = 0.4 CPS
        out, report = SubtitleSanitizer("ja").process(subs)
        assert out == []
        assert report.cps_violations_removed == 1
        assert "abnormally_slow_cps" in report.artifacts[0]["reason"]

    def test_fast_cps_removed_regardless_of_duration(self):
        from whisperjav_tpu.modules.sanitize.sanitizer import SubtitleSanitizer
        text = "あ" * 40                           # 40 chars in 1.2 s = 33 CPS
        subs = [Subtitle(1, 0.0, 1.2, text)]
        out, report = SubtitleSanitizer("ja").process(subs)
        assert all(s.text != text for s in out)


class TestSymbolOnlyResidue:
    """Reference issue #287 symbol-only purge + the #324 script widening."""

    def _run(self, text):
        from whisperjav_tpu.modules.sanitize.sanitizer import SubtitleSanitizer
        from whisperjav_tpu.modules.srt import Subtitle
        return SubtitleSanitizer("ja").process(
            [Subtitle(1, 0.0, 2.0, text)])

    def test_punctuation_residue_dropped(self):
        """Residue never reaches output; doubled punctuation is caught
        upstream by the DB's nonsensical full-line rule (pattern
        '[!！]{2,}' etc., reference-faithful), the rest by the
        symbol-only purge."""
        for residue in ("!!", "。。。", "♪~", "…—", "??~~"):
            out, report = self._run(residue)
            assert out == [], residue
            assert report.artifacts, residue

    def test_symbol_only_purge_catches_db_escapees(self):
        """Strings no DB rule touches still get dropped as residue —
        the reference's #287 defense-in-depth."""
        for residue in ("…—", "——", "※※"):
            out, report = self._run(residue)
            assert out == [], residue
            assert any(a["reason"] == "symbol_only_residue"
                       for a in report.artifacts), residue

    def test_non_cjk_scripts_survive(self):
        """#324: Korean/Cyrillic/Thai/etc. are valid Whisper output and
        must NOT be classed as residue."""
        for text in ("안녕하세요", "Привет!", "สวัสดี", "नमस्ते",
                     "שלום", "مرحبا", "café au lait", "Καλημέρα"):
            out, _ = self._run(text)
            assert len(out) == 1, text

    def test_japanese_with_single_trailing_punct_kept(self):
        """Single trailing punctuation is below the doubled-punct rule's
        threshold and the text is linguistic — must survive."""
        out, _ = self._run("窓の外は雨だ!")
        assert len(out) == 1
