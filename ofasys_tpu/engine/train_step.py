"""The jitted training step.

Replaces the reference's Trainer.train_step inner loop
(ofasys/engine/trainer.py:737-956): one pure function
``(state, batch, rng) -> (state, metrics)`` compiled once per task template.
Gradient accumulation is a lax.scan over a leading microbatch axis
(reference update_freq/GroupedIterator); gradients are summed raw and scaled
once by the total sample size, making {1 big batch} == {k microbatches} ==
{data-parallel shards} numerically identical.

The step is factored into two pure halves so the Trainer can reproduce the
reference's multi-task co-training semantics (ofasys/engine/trainer.py:766-880:
accumulate gradients across ALL task batches, then ONE optimizer step):

  make_grad_step   (params, step, batch, rng) -> (grads_raw, sample_size, logging)
  make_apply_step  (state, grads_raw, sample_size) -> (state, metrics)

``make_train_step`` composes the two for the single-task / round-robin path.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation, ema: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            # a REAL copy: identity tree-map would alias params' buffers and
            # the donated train step would donate each buffer twice
            ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        )


def _accumulate_grads(grad_fn, params, batch, rng, update_freq: int):
    """Raw-summed grads over the (optional) leading microbatch axis."""
    if update_freq == 1:
        (_, (sample_size, logging)), grads = grad_fn(params, batch, rng)
        return grads, sample_size, logging

    # batch leaves have leading dim = update_freq
    def body(carry, mb_with_idx):
        grads_acc, ss_acc, log_acc = carry
        i, mb = mb_with_idx
        (_, (ss, logging)), g = grad_fn(params, mb, jax.random.fold_in(rng, i))
        grads_acc = jax.tree.map(jnp.add, grads_acc, g)
        log_acc = jax.tree.map(jnp.add, log_acc, logging)
        return (grads_acc, ss_acc + ss, log_acc), None

    mb0 = jax.tree.map(lambda x: x[0], batch)
    (_, (ss0, log0)), g0 = grad_fn(params, mb0, jax.random.fold_in(rng, 0))
    rest = jax.tree.map(lambda x: x[1:], batch)
    idxs = jnp.arange(1, update_freq)
    (grads, sample_size, logging), _ = jax.lax.scan(body, (g0, ss0, log0), (idxs, rest))
    return grads, sample_size, logging


def make_grad_step(model, criterion, update_freq: int = 1, fold: int = 0) -> Callable:
    """Pure gradient half: raw-summed grads + sample size + logging.

    ``fold`` decorrelates dropout streams between tasks sharing one update
    (set to the task index by the Trainer's summed multi-task mode).
    """

    def grad_step(params, step, batch, rng):
        rng = jax.random.fold_in(rng, step)
        if fold:
            rng = jax.random.fold_in(rng, fold)

        def loss_fn(params, sample, rng):
            # update_num rides in the sample so criteria that gate on the
            # update count (drop_worst_after) can see it without a wider API
            sample = {**sample, "update_num": step}
            loss_sum, sample_size, logging = criterion(model, params, sample, rng, train=True)
            return loss_sum, (sample_size, logging)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        return _accumulate_grads(grad_fn, params, batch, rng, update_freq)

    return grad_step


def make_apply_step(
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.0,
    lr_schedule=None,
    ema_start_update: int = 0,
    ema_update_freq: int = 1,
) -> Callable:
    """Optimizer half: scale raw grad sum by 1/sample_size (reference
    multiply_grads parity, trainer.py:848-868), clip via the optax chain,
    step, EMA (with start-update and update-freq gating, reference
    ema/ema.py:33-202)."""

    def apply_step(state: TrainState, grads, sample_size):
        scale = 1.0 / jnp.maximum(sample_size, 1.0)
        grads = jax.tree.map(lambda g: (g * scale).astype(g.dtype), grads)
        gnorm = optax.global_norm(grads)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = state.ema_params
        if state.ema_params is not None and ema_decay > 0:
            # before start_update: shadow tracks the raw params (decay 0);
            # after: decay applied every ema_update_freq updates
            started = state.step >= ema_start_update
            due = (state.step % max(ema_update_freq, 1)) == 0
            decay = jnp.where(started, jnp.float32(ema_decay), 0.0)
            decay = jnp.where(due | ~started, decay, 1.0)  # off-step: keep shadow
            new_ema = jax.tree.map(
                lambda e, p: e * decay.astype(e.dtype)
                + p.astype(e.dtype) * (1.0 - decay.astype(e.dtype)),
                state.ema_params, new_params,
            )

        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state, ema_params=new_ema
        )
        metrics = {"gnorm": gnorm}
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    return apply_step


def make_train_step(
    model,
    criterion,
    optimizer: optax.GradientTransformation,
    update_freq: int = 1,
    ema_decay: float = 0.0,
    lr_schedule=None,
    ema_start_update: int = 0,
    ema_update_freq: int = 1,
) -> Callable:
    """Build the fused train step; jit it with donate_argnums=(0,) at the call
    site (parallel/api.py shards it over the mesh)."""
    grad_step = make_grad_step(model, criterion, update_freq=update_freq)
    apply_step = make_apply_step(optimizer, ema_decay=ema_decay, lr_schedule=lr_schedule,
                                 ema_start_update=ema_start_update,
                                 ema_update_freq=ema_update_freq)

    def train_step(state: TrainState, batch, rng) -> tuple:
        grads, sample_size, logging = grad_step(state.params, state.step, batch, rng)
        new_state, metrics = apply_step(state, grads, sample_size)
        out = dict(logging)
        out.update(metrics)
        return new_state, out

    return train_step


def make_multitask_train_step(
    model,
    criteria: Dict[str, Any],            # task name -> criterion
    optimizer: optax.GradientTransformation,
    update_freqs: Optional[Dict[str, int]] = None,
    ema_decay: float = 0.0,
    lr_schedule=None,
    ema_start_update: int = 0,
    ema_update_freq: int = 1,
) -> Callable:
    """ONE jitted program for a whole summed multi-task update: every task's
    gradients, the cross-task sum, and the optimizer step fuse into a single
    dispatch. Numerically identical to the split grad/accumulate/apply path
    (reference co-training semantics, ofasys/engine/trainer.py:766-880) but
    with none of the per-call dispatch latency — on a remote/tunneled device
    the split path pays ~2k dispatches per k tasks."""
    update_freqs = update_freqs or {}
    grad_steps = {
        name: make_grad_step(model, crit, update_freq=update_freqs.get(name, 1), fold=i)
        for i, (name, crit) in enumerate(criteria.items())
    }
    apply_step = make_apply_step(optimizer, ema_decay=ema_decay, lr_schedule=lr_schedule,
                                 ema_start_update=ema_start_update,
                                 ema_update_freq=ema_update_freq)

    def train_step(state: TrainState, batches: Dict[str, Any], rng):
        acc_g = None
        acc_ss = None
        task_logs = {}
        for name, gs in grad_steps.items():
            g, ss, logging = gs(state.params, state.step, batches[name], rng)
            task_logs[name] = logging
            if acc_g is None:
                acc_g, acc_ss = g, ss
            else:
                acc_g = jax.tree.map(jnp.add, acc_g, g)
                acc_ss = acc_ss + ss
        new_state, metrics = apply_step(state, acc_g, acc_ss)
        out = dict(metrics)
        out["tasks"] = task_logs
        return new_state, out

    return train_step


def make_valid_step(model, criterion) -> Callable:
    def valid_step(params, batch):
        _, _, logging = criterion(model, params, batch, rng=None, train=False)
        return logging

    return valid_step
