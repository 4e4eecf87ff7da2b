"""Sharded (multi-host-shaped) checkpoint save/restore.

The reference ships FSDP sharded checkpoints — per-rank ``-shard{rank}``
files (ofasys/engine/trainer.py:345-350, use_sharded_state in
distributed/fully_sharded_data_parallel.py:23-128) and ZeRO
broadcast-sharded load (trainer.py:568-577) that requires the SAME world
size on restore. Here the orbax/tensorstore format stores per-shard chunks,
so a mesh-sharded TrainState saves without a full-tree host gather and
restores onto ANY mesh shape (8 -> 4 -> 1) just by passing a target laid
out on the new mesh — each device reads only its own slices.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding

from ofasys_tpu.configure.configs import OptimizationConfig, ParallelConfig
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)
from ofasys_tpu.engine.optim import build_optimizer
from ofasys_tpu.engine.train_step import TrainState, make_train_step
from ofasys_tpu.parallel import build_mesh, make_sharded_train_step, put_batch, shard_tree
from ofasys_tpu.utils import checkpoint_utils

from test_train_step import copy_batch, tiny_model


def _setup():
    m, d = tiny_model(dropout=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=8, T=8)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.1), pad_id=d.pad()
    )
    optimizer = build_optimizer(
        OptimizationConfig(lr=(1e-2,), optimizer="sgd", lr_scheduler="fixed",
                           clip_norm=0.0),
        total_num_update=10,
    )
    step_fn = make_train_step(m, crit, optimizer)
    return m, d, batch, params, optimizer, step_fn


def _run_sharded(step_fn, optimizer, params, batch, pcfg, n_devices, n_steps,
                 state=None):
    mesh = build_mesh(pcfg, devices=jax.devices()[:n_devices])
    if state is None:
        state = shard_tree(TrainState.create(params, optimizer), mesh)
    step = make_sharded_train_step(step_fn, mesh, state, batch, donate=False)
    db = put_batch(batch, mesh)
    losses = []
    for s in range(n_steps):
        state, metrics = step(state, db, jax.random.PRNGKey(100 + s))
        losses.append(float(metrics["loss"]) / float(metrics["sample_size"]))
    return state, losses, mesh


def test_sharded_save_restore_resharded(tmp_path):
    """Save a dp2*fsdp2*tp2-sharded TrainState WITHOUT a host gather, then
    restore it (a) onto the same mesh, (b) onto a 4-device mesh of a
    different shape, (c) as a host tree — and continue training from each,
    loss-identical to continuing the original run."""
    m, d, batch, params, optimizer, step_fn = _setup()
    pcfg8 = ParallelConfig(data=2, fsdp=2, tensor=2)

    state, _, mesh8 = _run_sharded(step_fn, optimizer, params, batch, pcfg8, 8, 2)
    # the saved tree really is mesh-sharded (not replicated single-device)
    shardings = {s.sharding for s in jax.tree.leaves(state.params)}
    assert any(isinstance(s, NamedSharding) and s.mesh.devices.size == 8
               for s in shardings)
    checkpoint_utils.save_checkpoint(str(tmp_path), "ck", state, meta={"u": 2},
                                     async_save=False)

    # continuation reference: one more step on the original state
    _, ref_losses, _ = _run_sharded(step_fn, optimizer, params, batch, pcfg8, 8, 1,
                                    state=state)

    # (a) same mesh shape, fresh process-equivalent state as restore target
    tgt = shard_tree(TrainState.create(params, optimizer), mesh8)
    restored, meta = checkpoint_utils.load_checkpoint(str(tmp_path / "ck"), target=tgt)
    assert meta == {"u": 2}
    assert int(restored.step) == 2
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(tgt.params)):
        assert a.sharding == b.sharding
    _, losses_a, _ = _run_sharded(step_fn, optimizer, params, batch, pcfg8, 8, 1,
                                  state=restored)
    np.testing.assert_allclose(losses_a, ref_losses, rtol=1e-6)

    # (b) DIFFERENT mesh shape: 4 devices, data2*tensor2 (no fsdp axis)
    pcfg4 = ParallelConfig(data=2, tensor=2)
    mesh4 = build_mesh(pcfg4, devices=jax.devices()[:4])
    tgt4 = shard_tree(TrainState.create(params, optimizer), mesh4)
    restored4, _ = checkpoint_utils.load_checkpoint(str(tmp_path / "ck"), target=tgt4)
    for a, b in zip(jax.tree.leaves(restored4.params), jax.tree.leaves(tgt4.params)):
        assert a.sharding == b.sharding
        assert a.sharding.mesh.devices.size == 4
    _, losses_b, _ = _run_sharded(step_fn, optimizer, params, batch, pcfg4, 4, 1,
                                  state=restored4)
    np.testing.assert_allclose(losses_b, ref_losses, rtol=1e-6)

    # (c) host/numpy target: single-device continuation
    host_tgt = jax.device_get(TrainState.create(params, optimizer))
    restored1, _ = checkpoint_utils.load_checkpoint(str(tmp_path / "ck"), target=host_tgt)
    s1 = TrainState.create(params, optimizer).replace(
        params=restored1.params, opt_state=restored1.opt_state,
        step=restored1.step,
    )
    step1 = jax.jit(step_fn, donate_argnums=())
    s1, met1 = step1(s1, batch, jax.random.PRNGKey(100))
    loss_c = float(met1["loss"]) / float(met1["sample_size"])
    np.testing.assert_allclose([loss_c], ref_losses, rtol=1e-6)


def test_sharded_async_save_restore(tmp_path):
    """The async (orbax AsyncCheckpointer) path also handles mesh-sharded
    state: save, wait, restore sharded."""
    m, d, batch, params, optimizer, step_fn = _setup()
    pcfg = ParallelConfig(data=2, fsdp=2, tensor=2)
    state, _, mesh = _run_sharded(step_fn, optimizer, params, batch, pcfg, 8, 1)
    checkpoint_utils.save_checkpoint(str(tmp_path), "ck_async", state,
                                     async_save=True)
    checkpoint_utils.wait_for_async_saves()
    tgt = shard_tree(TrainState.create(params, optimizer), mesh)
    restored, _ = checkpoint_utils.load_checkpoint(str(tmp_path / "ck_async"),
                                                   target=tgt)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_save_no_target_restore(tmp_path):
    """A sharded save restores with NO target as plain numpy (hub-style
    inspection on a box whose devices differ from the training pod)."""
    m, d, batch, params, optimizer, step_fn = _setup()
    state, _, _ = _run_sharded(step_fn, optimizer, params, batch,
                               ParallelConfig(data=2, fsdp=2, tensor=2), 8, 1)
    checkpoint_utils.save_checkpoint(str(tmp_path), "ck", state, async_save=False)
    raw, _ = checkpoint_utils.load_checkpoint(str(tmp_path / "ck"))
    leaves = jax.tree.leaves(raw)
    assert leaves and all(isinstance(l, np.ndarray) for l in leaves)
    want = jax.tree.leaves(jax.device_get(state))
    for a, b in zip(leaves, want):
        np.testing.assert_array_equal(a, b)


def test_hub_from_pretrained_on_sharded_checkpoint(tmp_path):
    """A checkpoint written by a mesh-sharded Trainer.fit (fsdp x tensor —
    params genuinely sharded, saved with no host gather) loads through
    OFASys.from_pretrained on the plain host path and serves."""
    from ofasys_tpu import GeneralistModel, OFASys, Task, Trainer
    from ofasys_tpu.configure import ConfigStore, TrainerConfig

    try:
        recs = [{"src": w, "tgt": w} for w in ["alpha", "beta"]] * 8
        task = Task(name="copy", instruction="[TEXT:src] -> [TEXT:tgt]")
        task.cfg.dataset.batch_size = 8
        task.add_dataset(recs, "train")
        ConfigStore().set_active("ofasys.task", "default")

        model = GeneralistModel(arch="tiny")
        model.cfg.encoder.layers = model.cfg.decoder.layers = 2
        model.cfg.dropout = 0.0
        cfg = TrainerConfig()
        cfg.optimization.lr = (1e-2,)
        cfg.parallel.data = -1
        cfg.parallel.fsdp = 2
        cfg.parallel.tensor = 2
        cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
        cfg.checkpoint.async_save = False
        Trainer(cfg).fit(model, [task], max_update=4)

        hub = OFASys.from_pretrained(str(tmp_path / "ckpt" / "checkpoint_last"))
        out = hub.inference("[TEXT:src] -> [TEXT:tgt]", data={"src": "alpha"},
                            beam_size=1, max_len_b=6)
        assert isinstance(out.text, str)
    finally:
        ConfigStore().reset()
