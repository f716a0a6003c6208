"""Multi-host batch jobs: file-set sharding over DCN.

SURVEY.md §2.2: within one host, window batches shard data-parallel over
ICI (parallel/mesh.py); ACROSS hosts, the right granularity for this
workload is the FILE — media decode, scene detection, and VAD are
host-local, and transcription throughput scales linearly with chips, so
a batch job over a directory simply partitions the file list per
process. DCN carries only the `jax.distributed` control plane, no
tensor traffic — the TPU-correct layout for embarrassingly-file-parallel
work (the reference's closest analog is the two-GPU Kaggle notebook
that pins one ensemble pass per GPU).

Usage (one command per host, e.g. under a TPU pod scheduler):

    whisperjav /data --multihost \
        --coordinator host0:8476 --num-hosts 4 --host-id $ID

Each process transcribes its own slice with its local chips; outputs
land in the shared filesystem. ``--skip-existing`` makes re-runs after
a host failure resume cleanly.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

from whisperjav_tpu.utils.logger import logger


def initialize_distributed(coordinator: Optional[str] = None,
                           num_hosts: Optional[int] = None,
                           host_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize `jax.distributed` (idempotent) and return
    (process_index, process_count).

    With no coordinator given, falls back to env configuration
    (JAX_COORDINATOR_ADDRESS etc. / TPU pod metadata) and, failing that,
    runs single-process.
    """
    import jax

    try:
        if coordinator:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_hosts,
                process_id=host_id)
        elif os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
    except RuntimeError as e:
        # already initialized — normal under test harnesses / re-entry
        logger.debug("jax.distributed.initialize: %s", e)
    except Exception as e:  # noqa: BLE001 — degrade to single-process
        logger.warning("multihost init failed (%s); running "
                       "single-process", e)
        return 0, 1
    return jax.process_index(), jax.process_count()


def shard_files(files: Sequence, process_index: int,
                process_count: int) -> List:
    """Deterministic per-host slice of the file list.

    Round-robin by sorted order so every host sees a similar duration
    mix (directories often sort small-to-large by episode), and the
    assignment is stable across re-runs for --skip-existing resume.
    """
    if process_count <= 1:
        return list(files)
    ordered = sorted(files, key=lambda m: str(getattr(m, "path", m)))
    mine = ordered[process_index::process_count]
    logger.info("multihost: process %d/%d takes %d/%d file(s)",
                process_index, process_count, len(mine), len(ordered))
    return mine
