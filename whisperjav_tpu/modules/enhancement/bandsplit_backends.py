"""Heavy enhancement backends on the band-split dual-path model.

- ``bs-roformer``: vocal isolation at 44.1 kHz (reference:
  speech_enhancement/backends/bs_roformer.py — vocals/other stems);
- ``clearvoice``: 48 kHz speech enhancement (reference:
  backends/clearvoice.py — MossFormer2_SE_48K class).

Both declare is_lightweight=False (the reference's VRAM hint contract)
and degrade gracefully without weights. Audio is processed in chunks
with crossfade at the model's native rate, then resampled back.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from whisperjav_tpu.models.enhancement.bandsplit import BandSplitConfig
from whisperjav_tpu.modules.enhancement.base import EnhancementResult
from whisperjav_tpu.utils.logger import logger


@dataclass
class _HeavyConfig:
    weights: Optional[str] = None
    chunk_s: float = 8.0
    crossfade_s: float = 0.5


class _BandSplitBackend:
    name = "bandsplit"
    is_lightweight = False
    model_cfg = BandSplitConfig()

    def __init__(self, **kwargs):
        self.config = _HeavyConfig(**kwargs)
        self._params = None
        if self.config.weights:
            from whisperjav_tpu.models.enhancement import bandsplit
            self._params = bandsplit.load_params(self.config.weights)
            logger.info("%s: loaded weights from %s", self.name,
                        self.config.weights)

    def get_preferred_sample_rate(self) -> int:
        return self.model_cfg.sample_rate

    def enhance(self, audio: np.ndarray, sample_rate: int) -> EnhancementResult:
        if self._params is None:
            return EnhancementResult(audio, sample_rate, False, self.name,
                                     {"reason": "no weights loaded"})
        import jax.numpy as jnp
        from whisperjav_tpu.models.enhancement import bandsplit
        from whisperjav_tpu.modules.audio_io import resample
        from whisperjav_tpu.modules.enhancement.base import chunked_crossfade

        sr = self.model_cfg.sample_rate
        work = resample(audio, sample_rate, sr) if sample_rate != sr else audio
        chunk = int(self.config.chunk_s * sr)
        fade = int(self.config.crossfade_s * sr)
        if len(work) == 0:
            return EnhancementResult(audio, sample_rate, True, self.name)
        out = chunked_crossfade(
            work, chunk, fade,
            lambda clip: np.asarray(bandsplit.apply(
                self._params, self.model_cfg, jnp.asarray(clip[None]),
                chunk))[0])
        if sample_rate != sr:
            out = resample(out, sr, sample_rate)
            out = out[:len(audio)]
        return EnhancementResult(out.astype(np.float32), sample_rate, True,
                                 self.name)


class BsRoformerBackend(_BandSplitBackend):
    name = "bs-roformer"
    model_cfg = BandSplitConfig(sample_rate=44_100, target="vocals")


class ClearVoiceBackend(_BandSplitBackend):
    name = "clearvoice"
    model_cfg = BandSplitConfig(sample_rate=48_000, target="noise",
                                n_bands=20, n_layers=3)
