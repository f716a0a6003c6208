"""whisperjav-finetune: dataset construction + sharded training loop."""

import numpy as np
import pytest

import jax

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.models.whisper.tokenizer import WhisperTokenizer
from whisperjav_tpu.modules.audio_io import write_wav
from whisperjav_tpu.modules.srt import Subtitle, save_srt
from whisperjav_tpu import finetune

TINY = WhisperConfig(name="ft-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2)


def _make_pair(tmp_path, seconds=35.0):
    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    wav = tmp_path / "clip.wav"
    write_wav(wav, x, sr)
    srt = tmp_path / "clip.srt"
    save_srt(srt, [Subtitle(1, 1.0, 3.0, "こんにちは"),
                   Subtitle(2, 5.0, 8.0, "ありがとうございます"),
                   Subtitle(3, 31.0, 33.0, "さようなら")])
    return wav, srt


def test_discover_pairs(tmp_path):
    wav, srt = _make_pair(tmp_path)
    pairs = finetune.discover_pairs(tmp_path)
    assert pairs == [(wav, srt)]


def test_build_examples_token_grammar(tmp_path):
    """Windows carry sot/lang/task + ts-text-ts per cue + eot; the loss
    mask excludes the prompt."""
    wav, srt = _make_pair(tmp_path)
    tok = WhisperTokenizer(TINY)
    examples = list(finetune.build_examples(wav, srt, tok, TINY,
                                            max_tokens=64))
    assert len(examples) == 2            # window 0 (2 cues) + window 1
    audio, toks, mask = examples[0]
    assert audio.shape == (480000,)
    assert toks[0] == TINY.sot
    assert toks[2] == TINY.transcribe
    assert mask[:3].sum() == 0           # prompt not trained
    tb = TINY.timestamp_begin
    # first cue opens at 1.0s → ts token tb + 50
    assert toks[3] == tb + 50
    # eot closes the sequence and padding is eot
    eot_pos = int(mask.sum()) + 3 - 1
    assert toks[eot_pos] == TINY.eot
    # window 1 cue at 31-33s → window-relative 1.0-3.0
    _, toks1, _ = examples[1]
    assert toks1[3] == tb + 50


@pytest.mark.slow
def test_finetune_cli_end_to_end(tmp_path, monkeypatch):
    """2 steps on the 8-device CPU mesh: loss finite, checkpoint written
    and reloadable."""
    import whisperjav_tpu.pipelines.factory as factory
    params = init_params(TINY, jax.random.PRNGKey(0))
    # host snapshot: the sharded train state aliases + donates the
    # device buffers, deleting the originals
    orig = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    monkeypatch.setattr(factory, "load_model",
                        lambda *a, **k: (TINY, params))
    _make_pair(tmp_path)
    out = tmp_path / "ft"
    rc = finetune.main(["--data", str(tmp_path), "--model", "tiny",
                        "--steps", "2", "--batch-size", "2",
                        "--max-tokens", "64",
                        "--save-every", "0",
                        "--output-dir", str(out)])
    assert rc == 0
    ckpts = sorted(out.glob("step_*"))
    assert ckpts, "no checkpoint written"
    from whisperjav_tpu.utils.checkpoint import load_checkpoint
    restored = load_checkpoint(ckpts[-1], orig)
    leaves = jax.tree.leaves(restored)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # training actually changed the weights
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(orig), leaves))
    assert changed


def test_finetune_no_data_errors(tmp_path):
    assert finetune.main(["--data", str(tmp_path), "--steps", "1"]) == 1
