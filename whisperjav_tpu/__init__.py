"""whisperjav_tpu — TPU-native long-form Japanese ASR → SRT subtitle framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
meizhong986/WhisperJAV (see /root/reference and SURVEY.md): hierarchical
scene detection → VAD grouping → batched Whisper-class decoding → SRT
stitching → hallucination/repetition sanitization, designed TPU-first:

- compute path: pure-functional JAX models (Whisper, VAD, enhancement) with
  fixed shapes, KV-cached decode under ``lax.while_loop``, bf16 matmuls on
  the MXU, and Pallas kernels for the hot ops;
- scaling: variable-length speech groups are bucketed into fixed-shape
  padded batches and data-parallel sharded over a ``jax.sharding.Mesh``
  (replacing the reference's scene-sequential GPU loop,
  reference: whisperjav/pipelines/balanced_pipeline.py:436-513);
- host path: ffmpeg-free native WAV I/O, scene detection, SRT codec and the
  text sanitization chain stay on CPU feeding the device queue.
"""

from whisperjav_tpu.version import __version__

__all__ = ["__version__"]
