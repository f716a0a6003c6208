"""Environment preflight checks (``whisperjav --check``).

Role parity with reference ``whisperjav/utils/preflight_check.py`` (env
validation) and ``utils/device_detector.py`` (device discovery), adapted
to the TPU/JAX world: instead of CUDA driver checks, we verify JAX backend
health, device kind, and host-side codec availability.
"""

from __future__ import annotations

import shutil
import sys
from typing import List, Tuple


def gather_checks() -> List[Tuple[str, bool, str]]:
    checks: List[Tuple[str, bool, str]] = []

    checks.append(("python", sys.version_info >= (3, 10),
                   f"{sys.version_info.major}.{sys.version_info.minor}"))

    for mod in ("numpy", "scipy", "jax"):
        try:
            m = __import__(mod)
            checks.append((mod, True, getattr(m, "__version__", "?")))
        except ImportError as e:
            checks.append((mod, False, str(e)))

    try:
        import jax
        devs = jax.devices()
        kind = devs[0].platform if devs else "none"
        checks.append(("accelerator", len(devs) > 0,
                       f"{len(devs)}x {kind} ({devs[0].device_kind if devs else '-'})"))
    except Exception as e:  # noqa: BLE001 — report, don't crash preflight
        checks.append(("accelerator", False, str(e)))

    checks.append(("ffmpeg", shutil.which("ffmpeg") is not None,
                   shutil.which("ffmpeg") or "not found (WAV-only mode)"))
    checks.append(("ffprobe", shutil.which("ffprobe") is not None,
                   shutil.which("ffprobe") or "not found (native WAV probe)"))

    try:
        import transformers
        checks.append(("transformers", True, transformers.__version__))
    except ImportError:
        checks.append(("transformers", False,
                       "optional: needed for checkpoint conversion"))
    return checks


def run_preflight_checks(verbose: bool = True) -> bool:
    """True when all hard requirements pass (ffmpeg/transformers are soft)."""
    soft = {"ffmpeg", "ffprobe", "transformers"}
    ok = True
    for name, passed, detail in gather_checks():
        status = "OK " if passed else ("--- " if name in soft else "FAIL")
        if verbose:
            print(f"[{status}] {name:14s} {detail}")
        if not passed and name not in soft:
            ok = False
    return ok
