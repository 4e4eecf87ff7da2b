import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.configure.configs import OptimizationConfig, ParallelConfig
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)
from ofasys_tpu.engine.optim import build_optimizer
from ofasys_tpu.engine.train_step import TrainState, make_train_step
from ofasys_tpu.parallel import build_mesh, make_sharded_train_step, put_batch, shard_tree, tree_shardings
from ofasys_tpu.parallel.mesh import resolve_axis_sizes
from jax.sharding import PartitionSpec as P

from test_train_step import copy_batch, tiny_model


def test_resolve_axis_sizes():
    assert resolve_axis_sizes(ParallelConfig(), 8) == (8, 1, 1, 1, 1, 1)
    assert resolve_axis_sizes(ParallelConfig(data=2, fsdp=2, tensor=2), 8) == (2, 2, 2, 1, 1, 1)
    assert resolve_axis_sizes(ParallelConfig(data=-1, tensor=2), 8) == (4, 1, 2, 1, 1, 1)
    assert resolve_axis_sizes(ParallelConfig(data=-1, pipeline=2), 8) == (4, 1, 1, 1, 1, 2)
    with pytest.raises(ValueError):
        resolve_axis_sizes(ParallelConfig(data=3), 8)


def test_mesh_axes():
    mesh = build_mesh(ParallelConfig(data=2, fsdp=2, tensor=2))
    assert mesh.shape == {"data": 2, "fsdp": 2, "tensor": 2, "sequence": 1,
                          "expert": 1, "pipe": 1}


@pytest.mark.parametrize("pcfg", [
    ParallelConfig(data=8),                      # pure DP
    ParallelConfig(data=1, fsdp=4, tensor=2),    # FSDP + TP
    ParallelConfig(data=2, fsdp=2, tensor=2),    # DP + FSDP + TP
])
def test_sharded_train_matches_single_device(pcfg):
    m, d = tiny_model(dropout=0.0, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=8, T=8)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.1), pad_id=d.pad()
    )
    optimizer = build_optimizer(
        OptimizationConfig(lr=(1e-2,), optimizer="sgd", lr_scheduler="fixed", clip_norm=0.0),
        total_num_update=10,
    )
    step_fn = make_train_step(m, crit, optimizer)

    # single-device reference
    s0 = TrainState.create(params, optimizer)
    s0, m0 = jax.jit(step_fn)(s0, batch, jax.random.PRNGKey(7))

    # sharded over the mesh
    mesh = build_mesh(pcfg)
    state = TrainState.create(params, optimizer)
    state = shard_tree(state, mesh)
    sharded_step = make_sharded_train_step(step_fn, mesh, state, batch, donate=False)
    db = put_batch(batch, mesh)
    s1, m1 = sharded_step(state, db, jax.random.PRNGKey(7))

    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_param_sharding_rules_applied():
    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=8, T=8)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    mesh = build_mesh(ParallelConfig(data=1, fsdp=4, tensor=2))
    sh = tree_shardings(params, mesh)
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): s
            for p, s in jax.tree_util.tree_flatten_with_path(sh)[0]}
    qk = [v for k, v in flat.items() if k.endswith("q_proj/kernel")]
    assert qk and all(s.spec == P("fsdp", "tensor") for s in qk), qk
    emb = [v for k, v in flat.items() if k.endswith("embed_tokens/embedding")]
    assert emb and emb[0].spec == P("tensor", "fsdp")
    lns = [v for k, v in flat.items() if "layer_norm/scale" in k]
    assert lns and all(all(a is None for a in s.spec) for s in lns)
