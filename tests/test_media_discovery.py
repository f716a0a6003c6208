"""Tests for media discovery."""

import numpy as np

from whisperjav_tpu.modules.audio_io import write_wav
from whisperjav_tpu.modules.media_discovery import discover, probe


def _mk_wav(path, seconds=1.0, sr=16000):
    write_wav(path, np.zeros(int(sr * seconds), dtype=np.float32), sr)


def test_discover_files_dirs_globs(tmp_path):
    _mk_wav(tmp_path / "a.wav")
    _mk_wav(tmp_path / "b.wav")
    (tmp_path / "sub").mkdir()
    _mk_wav(tmp_path / "sub" / "c.wav")
    (tmp_path / "notes.txt").write_text("skip me")

    infos = discover([tmp_path / "a.wav"])
    assert len(infos) == 1

    infos = discover([tmp_path])
    assert {i.path.name for i in infos} == {"a.wav", "b.wav"}

    infos = discover([tmp_path], recursive=True)
    assert {i.path.name for i in infos} == {"a.wav", "b.wav", "c.wav"}

    infos = discover([str(tmp_path / "*.wav")])
    assert len(infos) == 2

    # dedup across overlapping inputs
    infos = discover([tmp_path / "a.wav", str(tmp_path / "*.wav")])
    assert len(infos) == 2


def test_probe_wav_metadata(tmp_path):
    _mk_wav(tmp_path / "x.wav", seconds=2.5, sr=22050)
    info = probe(tmp_path / "x.wav")
    assert info.media_type == "audio"
    assert info.sample_rate == 22050
    assert abs(info.duration - 2.5) < 0.01
    assert info.basename == "x"
