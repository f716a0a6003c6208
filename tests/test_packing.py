"""Tests for multi-group window packing and segment unpacking."""

import numpy as np
import pytest

from whisperjav_tpu.models.whisper.decode import DecodedSegment
from whisperjav_tpu.parallel.batching import (
    Window, pack_windows, unpack_segments,
)

SR = 16000


def _w(dur_s, abs_start, scene=0, group=0, seed=0):
    return Window(
        audio=np.full(int(dur_s * SR), 0.1 + 0.01 * seed, np.float32),
        abs_start=abs_start, duration=dur_s, scene_idx=scene,
        group_idx=group)


def test_pack_combines_short_windows():
    ws = [_w(6, 0.0, 0, 0), _w(5, 10.0, 0, 1), _w(7, 20.0, 1, 0),
          _w(6, 30.0, 1, 1)]
    packed = pack_windows(ws, SR, max_duration_s=28.0, gap_s=0.5)
    assert len(packed) == 1
    p = packed[0]
    assert len(p.members) == 4
    # gaps included: 6+5+7+6 + 3*0.5 = 25.5
    assert p.duration == pytest.approx(25.5, abs=0.01)
    # member offsets are monotonically increasing with gaps
    offs = [o for o, _ in p.members]
    assert offs[0] == 0.0
    assert offs[1] == pytest.approx(6.5, abs=0.01)


def test_pack_respects_cap():
    ws = [_w(12, i * 20.0, 0, i) for i in range(5)]
    packed = pack_windows(ws, SR, max_duration_s=28.0, gap_s=0.5)
    assert all(p.duration <= 28.0 + 1e-6 for p in packed)
    assert len(packed) == 3   # 2+2+1
    # single-member packs stay as original windows (no members)
    assert packed[-1].members == []


def test_pack_long_window_untouched():
    ws = [_w(27, 0.0)]
    packed = pack_windows(ws, SR)
    assert packed[0] is ws[0]


def test_unpack_routes_segments_by_midpoint():
    ws = [_w(6, 0.0, 0, 0), _w(5, 10.0, 0, 1)]
    packed = pack_windows(ws, SR, gap_s=0.5)[0]
    segs = [
        DecodedSegment(start=1.0, end=2.0, tokens=[], text="a"),   # member 0
        DecodedSegment(start=7.0, end=8.0, tokens=[], text="b"),   # member 1
        DecodedSegment(start=6.2, end=6.4, tokens=[], text="gap"),  # in gap
    ]
    routed = unpack_segments(packed, segs)
    assert len(routed) == 2
    (m0, s0), (m1, s1) = routed
    assert m0.group_idx == 0 and [s.text for s in s0] == ["a"]
    texts1 = [s.text for s in s1]
    assert "b" in texts1
    # rebased times fall inside the member
    b_seg = [s for s in s1 if s.text == "b"][0]
    assert 0.0 <= b_seg.start <= b_seg.end <= m1.duration + 1e-6
    assert b_seg.start == pytest.approx(0.5, abs=0.01)  # 7.0 - 6.5


def test_unpack_passthrough_for_plain_window():
    w = _w(6, 0.0)
    segs = [DecodedSegment(start=1.0, end=2.0, tokens=[], text="x")]
    routed = unpack_segments(w, segs)
    assert routed == [(w, segs)]


@pytest.mark.slow
def test_pipeline_packing_end_to_end():
    """Packing preserves global subtitle timing through the pipeline."""
    import jax
    from whisperjav_tpu.config.presets import resolve_pipeline_config
    from whisperjav_tpu.models.whisper.config import WhisperConfig
    from whisperjav_tpu.models.whisper.model import init_params
    from whisperjav_tpu.pipelines.factory import build_pipeline

    TINY = WhisperConfig(name="pack-tiny", n_audio_state=64, n_audio_head=4,
                         n_audio_layer=2, n_text_state=64, n_text_head=4,
                         n_text_layer=2)
    rng = np.random.default_rng(0)
    bursts = [(1.0, 4.0), (8.0, 11.0), (15.0, 18.0)]
    audio = np.zeros(20 * SR, np.float32)
    for a, b in bursts:
        n = int((b - a) * SR)
        t = np.arange(n) / SR
        audio[int(a * SR):int(b * SR)] = (
            0.35 * np.sin(2 * np.pi * 180 * t)
            + 0.04 * rng.standard_normal(n)).astype(np.float32)

    cfg = resolve_pipeline_config(mode="balanced", vad_backend="energy",
                                  batch_size=2)
    pipe = build_pipeline(cfg, model_config=TINY,
                          params=init_params(TINY, jax.random.PRNGKey(0)))
    assert pipe.pack
    subs, stats = pipe.process_audio(audio, SR)
    assert stats["windows"] < stats["groups_packed"] or \
        stats["groups_packed"] <= 1
    tol = 1.6
    for s in subs:
        assert any(s.start >= a - tol and s.end <= b + tol
                   for a, b in bursts), (s.start, s.end)


def test_chunked_windows_overlap_and_ranges():
    from whisperjav_tpu.parallel.batching import chunked_windows
    audio = np.zeros(70 * SR, np.float32)
    ws = chunked_windows(audio, SR, chunk_s=30.0, overlap_s=5.0)
    assert [round(w.abs_start, 1) for w in ws] == [0.0, 25.0, 50.0]
    # first window owns its start, last owns its end
    assert ws[0].keep_range[0] == 0.0
    assert ws[-1].keep_range[1] == pytest.approx(ws[-1].duration)
    # interior boundaries split the overlap at its midpoint
    assert ws[0].keep_range[1] == pytest.approx(27.5)
    assert ws[1].keep_range[0] == pytest.approx(2.5)
    # reconciled ownership covers the file without double-claims
    spans = [(w.abs_start + w.keep_range[0], w.abs_start + w.keep_range[1])
             for w in ws]
    for (a1, b1), (a2, b2) in zip(spans[:-1], spans[1:]):
        assert b1 == pytest.approx(a2)
    assert spans[0][0] == 0.0
    assert spans[-1][1] == pytest.approx(70.0)


@pytest.mark.slow
def test_chunked_pipeline_mode():
    import jax
    from whisperjav_tpu.config.presets import resolve_pipeline_config
    from whisperjav_tpu.models.whisper.config import WhisperConfig
    from whisperjav_tpu.models.whisper.model import init_params
    from whisperjav_tpu.pipelines.factory import build_pipeline

    TINY = WhisperConfig(name="chunk-tiny", n_audio_state=64, n_audio_head=4,
                         n_audio_layer=2, n_text_state=64, n_text_head=4,
                         n_text_layer=2)
    cfg = resolve_pipeline_config(mode="transformers", batch_size=2)
    pipe = build_pipeline(cfg, model_config=TINY,
                          params=init_params(TINY, jax.random.PRNGKey(0)))
    assert pipe.chunked
    audio = np.zeros(40 * SR, np.float32)
    t = np.arange(len(audio)) / SR
    audio += (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
    subs, stats = pipe.process_audio(audio.astype(np.float32), SR)
    assert stats["scene_backend"] == "chunked"
    assert stats["windows"] == 2
    for s in subs:
        assert 0 <= s.start <= s.end <= 40.5
