"""SPMD entry points: shard state + batch, jit the train step over the mesh.

The reference reached multi-device training through wrapper classes and
explicit NCCL calls in Trainer (engine/trainer.py:835-880); here the SAME
pure train step is jit-compiled with NamedShardings and XLA inserts every
collective (grad psum over data/fsdp, all-gathers for fsdp params,
tensor-parallel reduces) — see SURVEY §2.10 for the mapping.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ofasys_tpu.parallel.mesh import BATCH_AXES, batch_sharding, build_mesh
from ofasys_tpu.parallel.sharding import tree_shardings


def make_sharded_train_step(
    train_step: Callable,
    mesh: Mesh,
    state_example: Any,
    batch_example: Any,
    update_freq: int = 1,
    rules=None,
    donate: bool = True,
):
    """jit `train_step(state, batch, rng) -> (state, metrics)` with:
    - state sharded by rule table (params + mirrored optimizer moments)
    - batch sharded on dim 0 (or dim 1 under a leading microbatch axis)
      over the data+fsdp axes
    - metrics replicated
    """
    state_sh = tree_shardings(state_example, mesh, rules)
    b_sh = batch_sharding(mesh, extra_leading_dims=1 if update_freq > 1 else 0)

    def batch_leaf_sharding(leaf):
        ndim = getattr(leaf, "ndim", 0)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return b_sh

    batch_sh = jax.tree.map(batch_leaf_sharding, batch_example)
    rng_sh = NamedSharding(mesh, P())

    return jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, rng_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )


def _batch_shardings(batch_example: Any, mesh: Mesh, update_freq: int = 1):
    b_sh = batch_sharding(mesh, extra_leading_dims=1 if update_freq > 1 else 0)

    def leaf(x):
        if getattr(x, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        return b_sh

    return jax.tree.map(leaf, batch_example)


def make_sharded_grad_step(
    grad_step: Callable,
    mesh: Mesh,
    params_example: Any,
    batch_example: Any,
    update_freq: int = 1,
    rules=None,
):
    """jit `grad_step(params, step, batch, rng) -> (grads, sample_size, logging)`
    — the gradient half of the reference's summed multi-task update
    (ofasys/engine/trainer.py:766-880). Grads come out sharded exactly like
    params so accumulation and the optimizer step never re-lay-out."""
    p_sh = tree_shardings(params_example, mesh, rules)
    batch_sh = _batch_shardings(batch_example, mesh, update_freq)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        grad_step,
        in_shardings=(p_sh, repl, batch_sh, repl),
        out_shardings=(p_sh, repl, repl),
    )


def make_sharded_apply_step(
    apply_step: Callable,
    mesh: Mesh,
    state_example: Any,
    rules=None,
    donate: bool = True,
):
    """jit `apply_step(state, grads, sample_size) -> (state, metrics)`."""
    state_sh = tree_shardings(state_example, mesh, rules)
    p_sh = tree_shardings(state_example.params, mesh, rules)
    repl = NamedSharding(mesh, P())
    return jax.jit(
        apply_step,
        in_shardings=(state_sh, p_sh, repl),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_multitask_train_step(
    train_step: Callable,
    mesh: Mesh,
    state_example: Any,
    batch_examples: Any,          # dict: task name -> device-view batch
    update_freqs=None,
    rules=None,
    donate: bool = True,
):
    """jit the fused multi-task step (engine/train_step.py
    make_multitask_train_step): one dispatch per update."""
    update_freqs = update_freqs or {}
    state_sh = tree_shardings(state_example, mesh, rules)
    batch_sh = {
        name: _batch_shardings(b, mesh, update_freqs.get(name, 1))
        for name, b in batch_examples.items()
    }
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_accumulate(mesh: Mesh, params_example: Any, rules=None):
    """One-dispatch grad accumulator: (acc_g, acc_ss, g, ss) -> (acc_g, acc_ss).
    Donates the accumulator so cross-task accumulation is in-place on device."""
    p_sh = tree_shardings(params_example, mesh, rules)
    repl = NamedSharding(mesh, P())

    def add(acc_g, acc_ss, g, ss):
        import jax.numpy as jnp

        return jax.tree.map(jnp.add, acc_g, g), acc_ss + ss

    return jax.jit(
        add,
        in_shardings=(p_sh, repl, p_sh, repl),
        out_shardings=(p_sh, repl),
        donate_argnums=(0,),
    )


def put_batch(batch: Any, mesh: Mesh, update_freq: int = 1):
    """Host numpy batch -> device, sharded over the data axes. Under
    multi-host JAX each process contributes its local batch rows
    (jax.make_array_from_process_local_data); single-host is a device_put."""
    b_sh = batch_sharding(mesh, extra_leading_dims=1 if update_freq > 1 else 0)
    multihost = jax.process_count() > 1

    def put(leaf):
        sh = NamedSharding(mesh, P()) if getattr(leaf, "ndim", 0) == 0 else b_sh
        if multihost:
            import numpy as np

            return jax.make_array_from_process_local_data(sh, np.asarray(leaf))
        return jax.device_put(leaf, sh)

    return jax.tree.map(put, batch)
