"""Tests for model checkpoint persistence."""

import numpy as np
import pytest

import jax

from whisperjav_tpu.models.whisper.config import WhisperConfig
from whisperjav_tpu.models.whisper.model import init_params
from whisperjav_tpu.utils.checkpoint import (
    checkpoint_metadata, load_checkpoint, save_checkpoint,
)

TINY = WhisperConfig(name="ckpt-tiny", n_audio_state=64, n_audio_head=4,
                     n_audio_layer=2, n_text_state=64, n_text_head=4,
                     n_text_layer=2, n_audio_ctx=50)


def test_checkpoint_roundtrip(tmp_path):
    params = init_params(TINY, jax.random.PRNGKey(0))
    p = save_checkpoint(tmp_path / "ck", params,
                        metadata={"model": "ckpt-tiny", "step": 7})
    meta = checkpoint_metadata(p)
    assert meta["model"] == "ckpt-tiny"
    assert meta["step"] == 7

    template = init_params(TINY, jax.random.PRNGKey(99))  # different values
    restored = load_checkpoint(p, template)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(restored)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
