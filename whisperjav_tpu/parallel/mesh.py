"""Device mesh construction and sharding helpers.

The framework's scaling axis is **data-parallel window sharding over ICI**
(SURVEY.md §2.2: the reference is a single-GPU sequential scene loop; the
TPU-native replacement shards fixed-shape window batches across chips).
One mesh axis ``data`` is enough for inference; the training step also
uses a ``model`` axis for tensor parallelism (see parallel/train.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With the default single axis, all devices go to data parallelism.
    ``shape`` reshapes devices for multi-axis meshes, e.g. (4, 2) with
    axis_names ("data", "model").
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh axis."""
    return NamedSharding(mesh, P(axis))
