"""Resilient model/checkpoint resolution.

Role parity with reference ``whisperjav/utils/model_loader.py:1-8``
(monkeypatched huggingface_hub downloads: normal → local cache →
hf-mirror.com fallback for China networks). Instead of monkeypatching,
this exposes one resolution chain used by checkpoint loading:

1. local directory path (offline-first — the common TPU-pod case);
2. hub id from the local HF cache (``local_files_only``);
3. hub download, honoring ``HF_ENDPOINT`` if set;
4. retry the download against the configured mirror.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Optional

from whisperjav_tpu.utils.logger import logger

DEFAULT_MIRROR = "https://hf-mirror.com"


def resolve_checkpoint(
    name_or_path: str,
    loader: Optional[Callable] = None,
    mirror: Optional[str] = None,
):
    """Run ``loader(source, **kw)`` through the resolution chain.

    ``loader`` defaults to transformers' WhisperForConditionalGeneration
    loading; pass any ``from_pretrained``-style callable for other model
    types. Returns the loader's result; raises the LAST error when every
    step fails.
    """
    if loader is None:
        import transformers
        loader = transformers.WhisperForConditionalGeneration.from_pretrained
    mirror = mirror or os.environ.get("WJAV_HF_MIRROR", DEFAULT_MIRROR)

    p = Path(name_or_path)
    last_err: Optional[Exception] = None

    if p.exists():
        return loader(str(p))

    try:
        return loader(name_or_path, local_files_only=True)
    except Exception as e:  # noqa: BLE001 — each rung falls through
        last_err = e
        logger.debug("not in local HF cache: %s (%s)", name_or_path, e)

    try:
        return loader(name_or_path)
    except Exception as e:  # noqa: BLE001
        last_err = e
        logger.warning("hub download failed for %s (%s); trying mirror %s",
                       name_or_path, e, mirror)

    old = os.environ.get("HF_ENDPOINT")
    os.environ["HF_ENDPOINT"] = mirror
    try:
        return loader(name_or_path)
    except Exception as e:  # noqa: BLE001
        last_err = e
    finally:
        if old is None:
            os.environ.pop("HF_ENDPOINT", None)
        else:
            os.environ["HF_ENDPOINT"] = old
    raise last_err
