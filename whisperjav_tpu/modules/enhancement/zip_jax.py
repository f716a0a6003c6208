"""ZipEnhancer-class backend: chunked denoising with crossfade.

Chunking contract parity with the reference backend (reference:
whisperjav/modules/speech_enhancement/backends/zipenhancer.py:36-51 —
10 s chunks with 0.5 s crossfade at 16 kHz). Without weights the backend
reports itself unavailable-but-graceful: it passes audio through with
success=False so the pipeline continues (the framework's enhancement
degradation contract).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from whisperjav_tpu.modules.enhancement.base import EnhancementResult
from whisperjav_tpu.utils.logger import logger

CHUNK_S = 10.0
CROSSFADE_S = 0.5
SR = 16_000


@dataclass
class ZipJaxConfig:
    weights: Optional[str] = None
    chunk_s: float = CHUNK_S
    crossfade_s: float = CROSSFADE_S


class ZipJaxEnhancer:
    name = "zipenhancer"
    is_lightweight = True   # ~2 M params

    def __init__(self, **kwargs):
        self.config = ZipJaxConfig(**kwargs)
        self._params = None
        if self.config.weights:
            from whisperjav_tpu.models.enhancement import zipnet
            self._params = zipnet.load_params(self.config.weights)
            logger.info("zipenhancer: loaded weights from %s",
                        self.config.weights)

    def get_preferred_sample_rate(self) -> int:
        return SR

    def enhance(self, audio: np.ndarray, sample_rate: int) -> EnhancementResult:
        if self._params is None:
            return EnhancementResult(audio, sample_rate, False, self.name,
                                     {"reason": "no weights loaded"})
        if sample_rate != SR:
            from whisperjav_tpu.modules.audio_io import resample
            audio = resample(audio, sample_rate, SR)
            sample_rate = SR

        import jax.numpy as jnp
        from whisperjav_tpu.models.enhancement import zipnet
        from whisperjav_tpu.modules.enhancement.base import chunked_crossfade

        chunk = int(self.config.chunk_s * SR)
        fade = int(self.config.crossfade_s * SR)
        if len(audio) == 0:
            return EnhancementResult(audio, sample_rate, True, self.name)
        out = chunked_crossfade(
            audio, chunk, fade,
            lambda clip: np.asarray(zipnet.denoise(
                self._params, jnp.asarray(clip[None]), chunk))[0])
        return EnhancementResult(out, sample_rate, True, self.name,
                                 {"chunks": int(np.ceil(len(audio)
                                                        / max(chunk - fade,
                                                              1)))})
