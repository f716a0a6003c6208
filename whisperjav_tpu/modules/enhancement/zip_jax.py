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
        self._model_cfg = None
        self._legacy = False
        if self.config.weights:
            tree = np.load(self.config.weights)
            if any(k.startswith("enc_conv1") or k == "__cfg__"
                   for k in tree.files):
                # dual-path checkpoint tree (models/enhancement/zipenhancer)
                from whisperjav_tpu.models.enhancement import zipenhancer
                self._params, self._model_cfg = zipenhancer.load_params(
                    self.config.weights)
            else:
                from whisperjav_tpu.models.enhancement import zipnet
                self._params = zipnet.load_params(self.config.weights)
                self._legacy = True
            logger.info("zipenhancer: loaded %s weights from %s",
                        "unet" if self._legacy else "dual-path",
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
        from whisperjav_tpu.modules.enhancement.base import chunked_crossfade

        chunk = int(self.config.chunk_s * SR)
        fade = int(self.config.crossfade_s * SR)
        if len(audio) == 0:
            return EnhancementResult(audio, sample_rate, True, self.name)
        if self._legacy:
            from whisperjav_tpu.models.enhancement import zipnet
            run = lambda clip: np.asarray(zipnet.denoise(      # noqa: E731
                self._params, jnp.asarray(clip[None]), chunk))[0]
        else:
            from whisperjav_tpu.models.enhancement import zipenhancer
            run = lambda clip: np.asarray(zipenhancer.denoise(  # noqa: E731
                self._params, jnp.asarray(clip[None]), chunk,
                self._model_cfg))[0]
        out = chunked_crossfade(audio, chunk, fade, run)
        return EnhancementResult(out, sample_rate, True, self.name,
                                 {"chunks": int(np.ceil(len(audio)
                                                        / max(chunk - fade,
                                                              1)))})
