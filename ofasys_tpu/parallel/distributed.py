"""Multi-host bootstrap (reference ofasys/distributed/utils.py:210-345).

The reference spun up torch.distributed process groups (NCCL/Gloo/xla) and
wrapped models per rank; in JAX the single-controller equivalent is one
``jax.distributed.initialize()`` call per host process — afterwards
``jax.devices()`` spans the whole slice and GSPMD handles every collective.

Environment contract (either set works):
  OFASYS_COORDINATOR / JAX_COORDINATOR_ADDRESS   host:port of process 0
  OFASYS_NUM_PROCESSES / JAX_NUM_PROCESSES       total host processes
  OFASYS_PROCESS_ID / JAX_PROCESS_ID             this process's id

On TPU pods the three are optional — jax.distributed.initialize() can
auto-detect from the TPU metadata server; we call it bare when
OFASYS_AUTO_DISTRIBUTED=1.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

logger = logging.getLogger("ofasys_tpu.distributed")

_initialized = False


def distributed_init() -> Tuple[int, int]:
    """Initialize multi-host JAX if the env asks for it; no-op otherwise.
    Returns (process_index, process_count). Safe to call repeatedly."""
    global _initialized
    import jax

    if _initialized:
        return jax.process_index(), jax.process_count()

    coord = os.environ.get("OFASYS_COORDINATOR") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("OFASYS_NUM_PROCESSES") or os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("OFASYS_PROCESS_ID") or os.environ.get("JAX_PROCESS_ID")

    if coord and nproc and int(nproc) > 1:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid or 0),
        )
        _initialized = True
        logger.info(
            "jax.distributed initialized: process %d/%d via %s",
            jax.process_index(), jax.process_count(), coord,
        )
    elif os.environ.get("OFASYS_AUTO_DISTRIBUTED") == "1":
        jax.distributed.initialize()  # TPU-pod auto-detection
        _initialized = True
    return jax.process_index(), jax.process_count()


def process_local_batch_to_global(batch, sharding_tree):
    """Per-host batch rows -> one global jax.Array per leaf (the multi-host
    replacement for device_put; the reference instead kept per-rank batches
    and all-reduced gradients)."""
    import jax
    import numpy as np

    return jax.tree.map(
        lambda leaf, sh: jax.make_array_from_process_local_data(sh, np.asarray(leaf)),
        batch, sharding_tree,
    )
