"""Generic STFT/ISTFT as MXU-friendly JAX ops (for enhancement models).

Same conv-as-DFT construction as the mel frontend (ops/mel.py), but
parameterized and invertible: the ISTFT is an inverse-basis matmul plus
windowed overlap-add with WOLA normalization. Used by the ZipEnhancer-
class denoiser (n_fft 400, hop 100 — reference constants at
whisperjav/modules/speech_enhancement/backends/zipenhancer.py:36-48).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _fwd_kernel(n_fft: int) -> np.ndarray:
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(n_freqs)[:, None]
    angle = -2.0 * np.pi * n * k / n_fft
    window = np.hanning(n_fft + 1)[:-1][None, :]
    return np.concatenate([np.cos(angle) * window,
                           np.sin(angle) * window], axis=0)[:, None, :].astype(np.float32)


@functools.lru_cache(maxsize=8)
def _inv_basis(n_fft: int) -> np.ndarray:
    """(2F, n_fft) matrix mapping (real‖imag) spectra to windowed frames."""
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(n_freqs)[:, None]
    angle = 2.0 * np.pi * n * k / n_fft
    # irfft weights: conjugate-symmetric expansion, interior bins doubled
    scale = np.full((n_freqs, 1), 2.0)
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    real_basis = np.cos(angle) * scale / n_fft
    imag_basis = -np.sin(angle) * scale / n_fft
    window = np.hanning(n_fft + 1)[:-1][None, :]
    return np.concatenate([real_basis * window,
                           imag_basis * window], axis=0).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft(audio: jax.Array, n_fft: int = 400,
         hop: int = 100) -> Tuple[jax.Array, jax.Array]:
    """audio (B, T) → (real, imag), each (B, F, frames); centered."""
    b, t = audio.shape
    pad = n_fft // 2
    x = jnp.pad(audio[:, None, :], ((0, 0), (0, 0), (pad, pad)),
                mode="reflect")
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(_fwd_kernel(n_fft)), window_strides=(hop,),
        padding="VALID", dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    n_freqs = n_fft // 2 + 1
    return out[:, :n_freqs], out[:, n_freqs:]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def istft(real: jax.Array, imag: jax.Array, length: int,
          n_fft: int = 400, hop: int = 100) -> jax.Array:
    """Inverse of :func:`stft` (WOLA with Hann analysis+synthesis)."""
    b, n_freqs, frames = real.shape
    spec = jnp.concatenate([real, imag], axis=1)          # (B, 2F, T)
    basis = jnp.asarray(_inv_basis(n_fft))                # (2F, n_fft)
    frames_time = jnp.einsum("bft,fn->btn", spec, basis)  # (B, T, n_fft)

    pad = n_fft // 2
    total = (frames - 1) * hop + n_fft
    idx = (np.arange(frames)[:, None] * hop
           + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((b, total), jnp.float32)
    out = out.at[:, idx].add(frames_time.reshape(b, -1))

    # WOLA normalization: sum of squared windows at each sample
    window = np.hanning(n_fft + 1)[:-1]
    norm = np.zeros(total, np.float64)
    for f in range(frames):
        norm[f * hop: f * hop + n_fft] += window ** 2
    norm = np.maximum(norm, 1e-8).astype(np.float32)
    out = out / jnp.asarray(norm)[None, :]
    return out[:, pad: pad + length]
