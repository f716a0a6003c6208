"""Model checkpoint persistence (orbax) for fine-tuned parameters.

The reference is inference-only (SURVEY.md §5: no model checkpointing);
this framework trains (parallel/train.py), so it persists: any model's
param pytree saves/restores through orbax, with a plain-npz fallback for
environments without orbax. Checkpoints are directories; metadata
(model name, step) rides alongside as JSON.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

from whisperjav_tpu.utils.logger import logger


def save_checkpoint(path: Path, params: Any,
                    metadata: Optional[Dict] = None) -> Path:
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        ckpt.save((path / "params").absolute(), params, force=True)
        ckpt.wait_until_finished()
        backend = "orbax"
    except Exception as e:  # noqa: BLE001 — fall back to npz
        logger.warning("orbax save failed (%s); using npz fallback", e)
        flat = {}
        for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                           for k in keypath)
            flat[key] = np.asarray(leaf)
        np.savez(path / "params.npz", **flat)
        backend = "npz"
    meta = {"saved": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "backend": backend, **(metadata or {})}
    (path / "metadata.json").write_text(json.dumps(meta, indent=1),
                                        encoding="utf-8")
    logger.info("checkpoint saved: %s (%s)", path, backend)
    return path


def load_checkpoint(path: Path, template: Any) -> Any:
    """Restore a param pytree; ``template`` provides structure/shapes."""
    path = Path(path)
    meta = json.loads((path / "metadata.json").read_text(encoding="utf-8"))
    if meta.get("backend") == "orbax":
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.asarray(x).shape,
                                           np.asarray(x).dtype), template)
        return ckpt.restore((path / "params").absolute(), abstract)
    data = np.load(path / "params.npz")
    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)
    flat, treedef = jax.tree_util.tree_flatten(template)
    restored = []
    for keypath, _ in leaves_with_path[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        restored.append(data[key])
    return jax.tree_util.tree_unflatten(treedef, restored)


def checkpoint_metadata(path: Path) -> Dict:
    return json.loads((Path(path) / "metadata.json").read_text())
