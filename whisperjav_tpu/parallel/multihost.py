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

    When every file's duration is known (media probing fills
    MediaInfo.duration), assignment is greedy longest-processing-time:
    files sort by (duration desc, name) and each goes to the host with
    the smallest summed duration so far — balancing *audio hours*, not
    file counts (a directory mixing 10-min clips with 3-hour features
    leaves round-robin hosts idle for hours). Without full duration
    info it falls back to round-robin by sorted name, which still mixes
    sizes reasonably (directories often sort small-to-large by
    episode). Both schemes are pure functions of the file set, so the
    assignment is stable across re-runs for --skip-existing resume.
    """
    if process_count <= 1:
        return list(files)

    def _name(m) -> str:
        return str(getattr(m, "path", m))

    durations = [getattr(m, "duration", None) for m in files]
    if files and all(isinstance(d, (int, float)) and d > 0
                     for d in durations):
        order = sorted(files,
                       key=lambda m: (-float(m.duration), _name(m)))
        loads = [0.0] * process_count
        mine: List = []
        for m in order:
            # ties (equal loads) break toward the lowest host id —
            # deterministic for resume
            host = min(range(process_count), key=lambda h: (loads[h], h))
            loads[host] += float(m.duration)
            if host == process_index:
                mine.append(m)
        mine.sort(key=_name)
        logger.info(
            "multihost: process %d/%d takes %d/%d file(s), %.0f/%.0f "
            "audio-seconds (duration-balanced)", process_index,
            process_count, len(mine), len(files),
            loads[process_index], sum(loads))
        return mine

    ordered = sorted(files, key=_name)
    mine = ordered[process_index::process_count]
    logger.info("multihost: process %d/%d takes %d/%d file(s)",
                process_index, process_count, len(mine), len(ordered))
    return mine
