"""Summed multi-task co-training semantics (reference
ofasys/engine/trainer.py:766-880: accumulate gradients across all task
batches, one optimizer step per update)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, ModalityType, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig
from ofasys_tpu.configure.configs import OptimizationConfig
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)
from ofasys_tpu.engine.optim import build_optimizer
from ofasys_tpu.engine.train_step import (
    TrainState,
    make_apply_step,
    make_grad_step,
    make_train_step,
)
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def _model_and_batches():
    d = Dictionary()
    for i in range(100):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 1
    model.cfg.dropout = 0.0
    model.initialize(d, active_adaptors=("text",), dtype=jnp.float32)

    rng = np.random.default_rng(0)

    def make_batch(B, seed):
        r = np.random.default_rng(seed)
        toks = r.integers(d.nspecial, d.nspecial + 100, size=(B, 8)).astype(np.int32)
        tgt = r.integers(d.nspecial, d.nspecial + 100, size=(B, 6)).astype(np.int32)
        prev = np.concatenate([np.full((B, 1), d.bos(), np.int32), tgt[:, :-1]], 1)
        return {
            "net_input": {
                "slots": [
                    SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src"),
                    SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt"),
                ]
            },
            "target": jnp.asarray(tgt),
        }

    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(), pad_id=d.pad()
    )
    params = model.init_params(jax.random.PRNGKey(0), make_batch(4, 1)["net_input"]["slots"])
    return model, d, crit, params, make_batch


def test_grad_apply_composition_equals_fused_step():
    model, d, crit, params, make_batch = _model_and_batches()
    opt = build_optimizer(OptimizationConfig(lr=(1e-3,), warmup_updates=1), total_num_update=10)
    batch = make_batch(4, 1)
    rng = jax.random.PRNGKey(7)

    fused = jax.jit(make_train_step(model, crit, opt))
    s1, m1 = fused(TrainState.create(params, opt), batch, rng)

    gfn = jax.jit(make_grad_step(model, crit))
    afn = jax.jit(make_apply_step(opt))
    s0 = TrainState.create(params, opt)
    g, ss, logging = gfn(s0.params, s0.step, batch, rng)
    s2, m2 = afn(s0, g, ss)

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=1e-6)
    np.testing.assert_allclose(float(m1["gnorm"]), float(m2["gnorm"]), rtol=1e-6)


def test_two_task_sum_equals_concatenated_batch():
    """Summed grads from two 4-sample batches + one step == one step on the
    concatenated 8-sample batch (the invariant the reference's co-training
    loop provides)."""
    model, d, crit, params, make_batch = _model_and_batches()
    opt = build_optimizer(OptimizationConfig(lr=(1e-3,), warmup_updates=1), total_num_update=10)
    b1, b2 = make_batch(4, 1), make_batch(4, 2)
    rng = jax.random.PRNGKey(3)

    # summed-mode: fold=0 on both tasks so dropout-free math is identical
    gfn = jax.jit(make_grad_step(model, crit))
    afn = jax.jit(make_apply_step(opt))
    s0 = TrainState.create(params, opt)
    g1, ss1, _ = gfn(s0.params, s0.step, b1, rng)
    g2, ss2, _ = gfn(s0.params, s0.step, b2, rng)
    g = jax.tree.map(jnp.add, g1, g2)
    s_sum, _ = afn(s0, g, ss1 + ss2)

    # concatenated single step
    cat = {
        "net_input": {
            "slots": [
                SlotBatch(
                    s.modality, s.is_src,
                    {"inputs": jnp.concatenate([s.value["inputs"], t.value["inputs"]], 0)},
                    s.column_name,
                )
                for s, t in zip(b1["net_input"]["slots"], b2["net_input"]["slots"])
            ]
        },
        "target": jnp.concatenate([b1["target"], b2["target"]], 0),
    }
    fused = jax.jit(make_train_step(model, crit, opt))
    s_cat, _ = fused(TrainState.create(params, opt), cat, rng)

    for a, b in zip(jax.tree.leaves(s_sum.params), jax.tree.leaves(s_cat.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=2e-5, atol=2e-6
        )


def test_fused_multitask_step_equals_split_composition():
    """make_multitask_train_step (ONE jitted dispatch) == per-task grad +
    host accumulate + apply (the split path it replaces)."""
    from ofasys_tpu.engine.train_step import make_multitask_train_step

    model, d, crit, params, make_batch = _model_and_batches()
    opt = build_optimizer(OptimizationConfig(lr=(1e-3,), warmup_updates=1), total_num_update=10)
    batches = {"a": make_batch(4, 1), "b": make_batch(4, 2)}
    rng = jax.random.PRNGKey(11)

    fused = jax.jit(make_multitask_train_step(model, {"a": crit, "b": crit}, opt))
    s1, m1 = fused(TrainState.create(params, opt), batches, rng)

    s0 = TrainState.create(params, opt)
    ga, ssa, la = jax.jit(make_grad_step(model, crit, fold=0))(s0.params, s0.step, batches["a"], rng)
    gb, ssb, lb = jax.jit(make_grad_step(model, crit, fold=1))(s0.params, s0.step, batches["b"], rng)
    g = jax.tree.map(jnp.add, ga, gb)
    s2, m2 = jax.jit(make_apply_step(opt))(s0, g, ssa + ssb)

    for x, y in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(x, np.float32), np.asarray(y, np.float32), rtol=1e-6)
    np.testing.assert_allclose(float(m1["gnorm"]), float(m2["gnorm"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["tasks"]["a"]["loss"]), float(la["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m1["tasks"]["b"]["loss"]), float(lb["loss"]), rtol=1e-6)


def _text_records(n=32, seed=0):
    words = ["red", "blue", "green", "bird", "dog", "cat", "sky", "tree"]
    rng = np.random.default_rng(seed)
    return [
        {"src": " ".join(words[j] for j in rng.integers(0, len(words), 4)),
         "tgt": " ".join(words[j] for j in rng.integers(0, len(words), 3))}
        for _ in range(n)
    ]


def test_trainer_fit_sum_mode_two_tasks():
    t1 = Task(name="copy_a", instruction="[TEXT:src] -> [TEXT:tgt]")
    t1.cfg.dataset.batch_size = 8
    t1.add_dataset(_text_records(seed=0), "train")
    t2 = Task(name="copy_b", instruction="[TEXT:src] translate -> [TEXT:tgt]")
    t2.cfg.dataset.batch_size = 8
    t2.add_dataset(_text_records(seed=1), "train")

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    model.cfg.dropout = 0.0

    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    cfg.optimization.lr = (5e-3,)
    cfg.optimization.multi_task_mode = "sum"
    trainer = Trainer(cfg)
    state = trainer.fit(model, [t1, t2], max_update=6)
    # ONE optimizer step per update regardless of task count
    assert int(state.step) == 6
    assert trainer._sum_mode
    assert np.isfinite(trainer.meters["copy_a:loss"].avg)
    assert np.isfinite(trainer.meters["copy_b:loss"].avg)
    assert np.isfinite(trainer.meters["gnorm"].avg)


def test_trainer_fit_round_robin_mode_two_tasks():
    t1 = Task(name="rr_a", instruction="[TEXT:src] -> [TEXT:tgt]")
    t1.cfg.dataset.batch_size = 8
    t1.add_dataset(_text_records(seed=0), "train")
    t2 = Task(name="rr_b", instruction="[TEXT:src] translate -> [TEXT:tgt]")
    t2.cfg.dataset.batch_size = 8
    t2.add_dataset(_text_records(seed=1), "train")

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    model.cfg.dropout = 0.0

    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    cfg.optimization.lr = (5e-3,)
    cfg.optimization.multi_task_mode = "round_robin"
    trainer = Trainer(cfg)
    state = trainer.fit(model, [t1, t2], max_update=4)
    # one optimizer step per TASK batch
    assert int(state.step) == 8
    assert not trainer._sum_mode
