"""Device mesh construction.

Replaces the reference's distributed plumbing (ofasys/distributed/, 1.4k LoC:
process-group init, DDP/FSDP/SlowMo wrapper selection, collective helpers)
with a single jax.sharding.Mesh. Axes:

  data     — pure data parallelism (gradients psum here; DCN-friendly)
  fsdp     — data parallelism that ALSO shards params/optimizer state
             (ZeRO-3 analogue; reference fully_sharded_data_parallel.py)
  tensor   — tensor/model parallelism (reference had scaffolding only,
             engine/trainer.py:143 asserts size 1 — here it's real)
  sequence — context parallelism for long sequences (absent upstream;
             SURVEY §5 calls it out as the beyond-reference capability)
  expert   — MoE expert parallelism (reference module/base_layer.py)
  pipe     — GPipe pipeline stages (parallel/pipeline.py; the reference
             shipped config scaffolding only, configure/configs.py:306-351)

Multi-host: call jax.distributed.initialize() before build_mesh (the
reference's distributed_init, distributed/utils.py:210).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ofasys_tpu.configure.configs import ParallelConfig

MESH_AXES = ("data", "fsdp", "tensor", "sequence", "expert", "pipe")

# logical batch axes: batch is sharded over every data-like axis
BATCH_AXES = ("data", "fsdp")


def resolve_axis_sizes(cfg: ParallelConfig, n_devices: int) -> Tuple[int, ...]:
    sizes = [cfg.data, cfg.fsdp, cfg.tensor, cfg.sequence, cfg.expert, cfg.pipeline]
    n_auto = sum(1 for s in sizes if s == -1)
    if n_auto > 1:
        raise ValueError("at most one mesh axis may be -1")
    fixed = int(np.prod([s for s in sizes if s != -1]))
    if n_auto == 1:
        if n_devices % fixed != 0:
            raise ValueError(f"{n_devices} devices not divisible by fixed axes product {fixed}")
        sizes = [n_devices // fixed if s == -1 else s for s in sizes]
    if int(np.prod(sizes)) != n_devices:
        raise ValueError(f"mesh axes {dict(zip(MESH_AXES, sizes))} do not multiply to {n_devices} devices")
    return tuple(sizes)


def build_mesh(cfg: Optional[ParallelConfig] = None, devices: Optional[Sequence] = None) -> Mesh:
    cfg = cfg or ParallelConfig()
    devices = list(devices if devices is not None else jax.devices())
    sizes = resolve_axis_sizes(cfg, len(devices))
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, MESH_AXES)


def single_device_mesh(device=None) -> Mesh:
    device = device or jax.devices()[0]
    return Mesh(np.asarray([device]).reshape((1,) * len(MESH_AXES)), MESH_AXES)


def batch_sharding(mesh: Mesh, extra_leading_dims: int = 0) -> NamedSharding:
    """Shard the batch dim over all data-like axes; microbatch/update_freq
    leading dims stay replicated."""
    spec = P(*(None,) * extra_leading_dims, BATCH_AXES)
    return NamedSharding(mesh, spec)
