"""Persistent XLA compilation cache for every product entrypoint.

The large-model decode executables take 2-4 minutes to compile on this
backend; a single-file CLI run pays that inside its first batch, which
dominated the measured end-to-end RTF (30-min file: ~80 s of a 110 s
wall was first-batch compile). bench.py has carried this cache since
round 2 (bench.py:216-224); this gives the CLI, serve, finetune, and
GUI-spawned subprocesses the same behavior: the FIRST run of a given
(model, batch, options) shape compiles once, every later run loads from
disk. Role analogue: the reference caches model downloads, not
compiles — CTranslate2 kernels are precompiled; under XLA the compile
cache is the equivalent product requirement.
"""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> bool:
    """Idempotent; safe to call before or after jax initializes.

    Cache location: $WJAV_COMPILE_CACHE, or ~/.cache/whisperjav_tpu/xla.
    Set WJAV_COMPILE_CACHE=0 to disable. Returns True when enabled.
    """
    env = os.environ.get("WJAV_COMPILE_CACHE", "")
    if env == "0":
        return False
    path = Path(cache_dir or env or
                Path.home() / ".cache" / "whisperjav_tpu" / "xla")
    try:
        import jax
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        # min_compile_time MUST be 0 on this backend: the axon/tunnel
        # runtime compiles asynchronously, so jax's compile call returns
        # in <1 s even for the 2-4 min decode programs — a nonzero
        # threshold silently skips the cache write for exactly the
        # executables that matter (measured 2026-08-19: 147 s
        # first-batch drain with zero cache entries written; the tiny
        # eager init ops ALSO each pay ~0.5 s/op × ~44 ops uncached).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        return True
    except Exception:   # cache is an optimization, never a blocker
        return False
