"""Tests for SRT codec + stitcher."""

import pytest

from whisperjav_tpu.modules.srt import (
    Subtitle, compose_srt, compose_vtt, format_timestamp, parse_srt,
    parse_timestamp, stitch,
)


def test_timestamp_roundtrip():
    for sec in [0.0, 1.5, 59.999, 3600.123, 7325.042]:
        assert abs(parse_timestamp(format_timestamp(sec)) - sec) < 1e-3


def test_parse_compose_roundtrip():
    subs = [
        Subtitle(1, 0.0, 1.5, "こんにちは"),
        Subtitle(2, 2.0, 4.25, "multi\nline"),
    ]
    parsed = parse_srt(compose_srt(subs))
    assert len(parsed) == 2
    assert parsed[0].text == "こんにちは"
    assert parsed[1].text == "multi\nline"
    assert abs(parsed[1].start - 2.0) < 1e-3


def test_parse_tolerates_crlf_and_missing_index():
    raw = "00:00:01,000 --> 00:00:02,000\r\nhello\r\n\r\n2\r\n00:00:03,000 --> 00:00:04,000\r\nworld\r\n"
    subs = parse_srt(raw)
    assert [s.text for s in subs] == ["hello", "world"]


def test_stitch_offsets_and_renumbers():
    scene1 = [Subtitle(1, 0.0, 1.0, "a"), Subtitle(2, 2.0, 3.0, "b")]
    scene2 = [Subtitle(1, 0.5, 1.5, "c")]
    merged = stitch([(scene1, 0.0), (scene2, 10.0)])
    assert [s.text for s in merged] == ["a", "b", "c"]
    assert [s.index for s in merged] == [1, 2, 3]
    assert abs(merged[2].start - 10.5) < 1e-6


def test_stitch_clamps_nonpositive_duration():
    bad = [Subtitle(1, 5.0, 5.0, "x")]
    merged = stitch([(bad, 0.0)])
    assert merged[0].end > merged[0].start


def test_stitch_drops_empty_text():
    subs = [Subtitle(1, 0.0, 1.0, "  "), Subtitle(2, 1.0, 2.0, "ok")]
    merged = stitch([(subs, 0.0)])
    assert len(merged) == 1


def test_vtt_output():
    vtt = compose_vtt([Subtitle(1, 0.0, 1.0, "hi")])
    assert vtt.startswith("WEBVTT")
    assert "00:00:00.000 --> 00:00:01.000" in vtt
