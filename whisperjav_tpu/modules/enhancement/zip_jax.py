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

        chunk = int(self.config.chunk_s * SR)
        fade = int(self.config.crossfade_s * SR)
        hop = chunk - fade
        n = len(audio)
        if n == 0:
            return EnhancementResult(audio, sample_rate, True, self.name)

        out = np.zeros(n, np.float32)
        weight = np.zeros(n, np.float32)
        ramp = np.linspace(0.0, 1.0, fade, dtype=np.float32)
        for start in range(0, n, hop):
            clip = audio[start:start + chunk]
            pad = chunk - len(clip)
            if pad:
                clip = np.pad(clip, (0, pad))
            den = np.asarray(zipnet.denoise(self._params,
                                            jnp.asarray(clip[None]), chunk))[0]
            den = den[:chunk - pad] if pad else den
            w = np.ones(len(den), np.float32)
            if start > 0 and len(den) >= fade:
                w[:fade] = ramp
            if start + chunk < n and len(den) >= fade:
                w[-fade:] = ramp[::-1]
            out[start:start + len(den)] += den * w
            weight[start:start + len(den)] += w
            if start + chunk >= n:
                break
        out = out / np.maximum(weight, 1e-8)
        return EnhancementResult(out, sample_rate, True, self.name,
                                 {"chunks": int(np.ceil(n / hop))})
