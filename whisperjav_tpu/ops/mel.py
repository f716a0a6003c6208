"""Whisper log-mel spectrogram frontend as a TPU-friendly fused JAX op.

This is the parity anchor of the whole stack (SURVEY.md §7 layer 2): every
model above it consumes these features. The reference computes this via
torch.stft inside whisper/faster-whisper; here it is expressed as two MXU
matmuls so XLA fuses the whole frontend into a handful of kernels:

    frames(audio) @ DFT_real/imag  →  power  →  power @ mel_fbankᵀ  →  log10

Matches openai-whisper's ``log_mel_spectrogram`` semantics exactly:
n_fft=400, hop=160, Hann window, centered reflect padding, drop the last
STFT frame, Slaney-scale/Slaney-norm mel filterbank (80 or 128 bins),
log10 clamp at 1e-10, dynamic-range compression to max-8 then (x+4)/4.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per Whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE      # 480_000
N_FRAMES = N_SAMPLES // HOP_LENGTH          # 3000 mel frames per window


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, logarithmic above."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hz = 1000.0
    lin = 3.0 * freq / 200.0
    logstep = 27.0 / np.log(6.4)
    return np.where(freq >= min_log_hz,
                    15.0 + np.log(np.maximum(freq, 1e-12) / min_log_hz) * logstep,
                    lin)


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    lin = 200.0 * mels / 3.0
    logstep = np.log(6.4) / 27.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)),
                    lin)


@functools.lru_cache(maxsize=4)
def mel_filterbank(n_mels: int = 80, n_freqs: int = N_FFT // 2 + 1,
                   sample_rate: int = SAMPLE_RATE,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-style triangular mel filterbank with Slaney area normalization.

    Shape (n_mels, n_freqs); float32. Equivalent to the filters Whisper
    bundles in its assets (librosa ``filters.mel`` defaults).
    """
    if fmax is None:
        fmax = sample_rate / 2.0
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: each filter integrates to ~constant energy
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=2)
def _dft_conv_kernel(n_fft: int = N_FFT) -> np.ndarray:
    """Windowed DFT basis as a conv kernel (2*n_freqs, 1, n_fft).

    Output channels 0..n_freqs-1 are the real parts, n_freqs.. the imaginary
    parts, so the whole STFT is ONE strided convolution — the layout XLA tiles
    straight onto the MXU (im2col + matmul), instead of a slow 3000×400 gather.
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[None, :]
    k = np.arange(n_freqs)[:, None]
    angle = -2.0 * np.pi * n * k / n_fft
    window = np.hanning(n_fft + 1)[:-1][None, :]  # periodic Hann, matches torch
    real = np.cos(angle) * window
    imag = np.sin(angle) * window
    kernel = np.concatenate([real, imag], axis=0)[:, None, :]  # (2F, 1, W)
    return kernel.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop"))
def log_mel_spectrogram(
    audio: jax.Array,
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
) -> jax.Array:
    """Compute Whisper log-mel features.

    audio: float32 ``(..., n_samples)``; n_samples must be a static multiple
    of ``hop`` (pipeline always feeds exact 30 s windows of 480 000 samples).
    Returns ``(..., n_mels, n_frames)`` float32 with n_frames = n_samples/hop.

    Numerics note: computed in float32 (like the reference's torch STFT
    path), so individual near-null spectral bins can differ visibly from a
    float64 oracle after log10; mean deviation stays < 1e-3 (see
    tests/test_mel.py golden tolerances).
    """
    n_samples = audio.shape[-1]
    pad = n_fft // 2
    n_frames = n_samples // hop
    batch_shape = audio.shape[:-1]
    flat = audio.reshape((-1, 1, n_samples))

    padded = jnp.pad(flat, ((0, 0), (0, 0), (pad, pad)), mode="reflect")
    kernel = jnp.asarray(_dft_conv_kernel(n_fft))
    # (B, 2F, n_frames+1): strided conv computes the whole windowed STFT
    stft = jax.lax.conv_general_dilated(
        padded, kernel, window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )[..., :n_frames]  # whisper drops the final (n_frames+1)-th frame
    n_freqs = n_fft // 2 + 1
    real, imag = stft[:, :n_freqs], stft[:, n_freqs:]
    power = real * real + imag * imag              # (B, F, T)

    fbank = jnp.asarray(mel_filterbank(n_mels, n_freqs))
    mel = jnp.einsum("mf,bft->bmt", fbank, power)  # (B, n_mels, T)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # dynamic-range compression relative to the per-utterance max
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.reshape(batch_shape + log_spec.shape[1:])


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Host-side: zero-pad or truncate 1-D audio to ``length`` samples."""
    audio = np.asarray(audio)
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad_width = [(0, 0)] * (audio.ndim - 1) + [(0, length - audio.shape[-1])]
    return np.pad(audio, pad_width)
