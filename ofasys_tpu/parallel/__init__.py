from ofasys_tpu.parallel.mesh import BATCH_AXES, MESH_AXES, batch_sharding, build_mesh, single_device_mesh
from ofasys_tpu.parallel.api import (
    make_sharded_accumulate,
    make_sharded_apply_step,
    make_sharded_grad_step,
    make_sharded_multitask_train_step,
    make_sharded_train_step,
    put_batch,
)
from ofasys_tpu.parallel.pipeline import pipeline_stack
from ofasys_tpu.parallel.sharding import DEFAULT_RULES, shard_tree, tree_shardings

__all__ = [
    "MESH_AXES", "BATCH_AXES", "build_mesh", "single_device_mesh", "batch_sharding",
    "make_sharded_train_step", "make_sharded_grad_step", "make_sharded_apply_step",
    "make_sharded_multitask_train_step",
    "make_sharded_accumulate", "put_batch", "DEFAULT_RULES", "tree_shardings", "shard_tree",
    "pipeline_stack",
]
