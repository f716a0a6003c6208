"""Tests for the ensemble merge engine and orchestrator."""

import numpy as np
import pytest

import jax

from whisperjav_tpu.ensemble.merge import MERGE_STRATEGIES, MergeEngine
from whisperjav_tpu.modules.srt import Subtitle


def S(start, end, text):
    return Subtitle(0, start, end, text)


@pytest.fixture
def passes():
    pass1 = [S(0, 2, "こんにちは"), S(5, 7, "元気ですか"), S(10, 12, "さよなら")]
    pass2 = [S(0.1, 2.1, "こんにちは"), S(3, 4, "追加の台詞"),
             S(10.2, 12.0, "さようなら、またね")]
    return pass1, pass2


def test_pass1_primary_gap_fill(passes):
    pass1, pass2 = passes
    merged, stats = MergeEngine("pass1_primary").merge(pass1, pass2)
    texts = [s.text for s in merged]
    assert "こんにちは" in texts and "元気ですか" in texts
    assert "追加の台詞" in texts          # filled the 3-4s gap
    assert "さようなら、またね" not in texts  # overlaps pass1 cue
    assert stats.merged_cues == len(merged)


def test_pass2_primary(passes):
    pass1, pass2 = passes
    merged, _ = MergeEngine("pass2_primary").merge(pass1, pass2)
    texts = [s.text for s in merged]
    assert "さようなら、またね" in texts
    assert "元気ですか" in texts           # gap-filled from pass1


def test_overlap_strategies(passes):
    pass1, pass2 = passes
    merged, _ = MergeEngine("pass1_overlap").merge(pass1, pass2)
    texts = [s.text for s in merged]
    # only cues confirmed by pass2 overlap survive
    assert "こんにちは" in texts
    assert "元気ですか" not in texts


def test_smart_merge_picks_quality(passes):
    pass1, pass2 = passes
    merged, _ = MergeEngine("smart_merge").merge(pass1, pass2)
    texts = [s.text for s in merged]
    assert "追加の台詞" in texts
    # overlapping さよなら pair resolved to exactly one cue
    sayonara = [t for t in texts if "さよ" in t or "さようなら" in t]
    assert len(sayonara) == 1


def test_longest(passes):
    pass1, pass2 = passes
    merged, _ = MergeEngine("longest").merge(pass1, pass2)
    texts = [s.text for s in merged]
    assert "さようなら、またね" in texts   # longer than さよなら


def test_full_merge_renumbers(passes):
    pass1, pass2 = passes
    merged, _ = MergeEngine("full_merge").merge(pass1, pass2)
    assert [s.index for s in merged] == list(range(1, len(merged) + 1))
    starts = [s.start for s in merged]
    assert starts == sorted(starts)


def test_all_strategies_registered():
    assert set(MERGE_STRATEGIES) == {
        "pass1_primary", "pass2_primary", "pass1_overlap", "pass2_overlap",
        "smart_merge", "full_merge", "longest"}
    with pytest.raises(ValueError):
        MergeEngine("bogus")


@pytest.mark.slow
def test_orchestrator_end_to_end(tmp_path):
    from whisperjav_tpu.config.presets import resolve_pipeline_config
    from whisperjav_tpu.ensemble.orchestrator import EnsembleOrchestrator
    from whisperjav_tpu.modules.audio_io import write_wav
    from whisperjav_tpu.modules.media_discovery import probe
    import whisperjav_tpu.pipelines.factory as factory
    from whisperjav_tpu.models.whisper.config import WhisperConfig
    from whisperjav_tpu.models.whisper.model import init_params

    TINY = WhisperConfig(name="ens-tiny", n_audio_state=64, n_audio_head=4,
                         n_audio_layer=2, n_text_state=64, n_text_head=4,
                         n_text_layer=2)
    tiny_params = init_params(TINY, jax.random.PRNGKey(0))
    orig = factory.load_model
    factory.load_model = lambda *a, **k: (TINY, tiny_params)
    try:
        sr = 16000
        t = np.arange(4 * sr) / sr
        x = (0.3 * np.sin(2 * np.pi * 200 * t)).astype(np.float32)
        wav = tmp_path / "ens.wav"
        write_wav(wav, x, sr)

        cfg1 = resolve_pipeline_config("fast", "conservative", batch_size=2)
        cfg2 = resolve_pipeline_config("fast", "aggressive", batch_size=2)
        orch = EnsembleOrchestrator(cfg1, cfg2, merge_strategy="smart_merge")
        summary = orch.process_batch([probe(wav)], tmp_path / "out")
        assert summary["files"] == 1
        assert summary["ok"] + summary["degraded"] == 1
        assert (tmp_path / "out" / "ensemble_batch.json").exists()
    finally:
        factory.load_model = orig
