"""Expert-parallel MoE and ring attention vs dense references on the CPU mesh."""

import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.configure.configs import ParallelConfig
from ofasys_tpu.parallel import build_mesh
from ofasys_tpu.parallel.moe import moe_ffn_dense, moe_ffn_sharded, top1_routing
from ofasys_tpu.parallel.ring_attention import ring_attention
from ofasys_tpu.ops.attention import dot_product_attention


def test_top1_routing_slots():
    logits = jnp.asarray([[9.0, 0.0], [9.0, 0.0], [0.0, 9.0], [9.0, 0.0]])
    idx, gate, slot = top1_routing(logits, capacity=2)
    np.testing.assert_array_equal(np.asarray(idx), [0, 0, 1, 0])
    np.testing.assert_array_equal(np.asarray(slot), [0, 1, 0, 2])  # third token to expert0 overflows
    assert (np.asarray(gate) > 0.5).all()


def test_moe_dense_shapes_and_gradients():
    rng = np.random.default_rng(0)
    N, D, H, E = 32, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((D, E)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, D, H)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, H, D)) * 0.1, jnp.float32)
    out, aux = moe_ffn_dense(x, rw, w1, w2, capacity_factor=2.0)
    assert out.shape == (N, D) and np.isfinite(np.asarray(out)).all()
    assert float(aux) > 0
    g = jax.grad(lambda w1: moe_ffn_dense(x, rw, w1, w2, capacity_factor=2.0)[0].sum())(w1)
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_moe_sharded_matches_dense():
    rng = np.random.default_rng(1)
    N, D, H, E = 64, 8, 16, 4
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    rw = jnp.asarray(rng.standard_normal((D, E)) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((E, D, H)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((E, H, D)) * 0.1, jnp.float32)
    mesh = build_mesh(ParallelConfig(data=1, expert=4, fsdp=1, tensor=1, sequence=2))
    # dense reference with capacity matching the sharded local computation
    out_s, aux_s = moe_ffn_sharded(x, rw, w1, w2, mesh, capacity_factor=4.0)
    out_d, aux_d = moe_ffn_dense(x, rw, w1, w2, capacity_factor=4.0 / mesh.shape["expert"])
    assert out_s.shape == out_d.shape
    assert np.isfinite(np.asarray(out_s)).all()
    # routing decisions agree (same logits); tokens not dropped match exactly
    match = np.isclose(np.asarray(out_s), np.asarray(out_d), atol=1e-5).all(axis=-1).mean()
    assert match > 0.9, match


def test_ring_attention_matches_full():
    rng = np.random.default_rng(2)
    B, T, H, D = 2, 32, 2, 8
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    mesh = build_mesh(ParallelConfig(data=1, sequence=4, fsdp=2, tensor=1))
    out = ring_attention(q, k, v, mesh, scale=0.3)
    ref = dot_product_attention(q, k, v, scale=0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_ring_attention_flash_inner_matches_full():
    """The Pallas flash inner (interpret mode on CPU) through the online
    merge: forward parity with full attention."""
    rng = np.random.default_rng(3)
    B, T, H, D = 1, 128, 2, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    mesh = build_mesh(ParallelConfig(data=2, sequence=4, fsdp=1, tensor=1))
    out = ring_attention(q, k, v, mesh, scale=0.2, use_flash=True)
    ref = dot_product_attention(q, k, v, scale=0.2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("use_flash", [False, True])
@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_bias_mask(use_flash, causal):
    """Additive bias (rows sharded with q, columns sliced per ring step)
    and key padding mask parity with dense attention, fwd + grads; batch
    sharded over 'data' composes in the same shard_map."""
    from ofasys_tpu.ops.attention import causal_mask as cmask

    rng = np.random.default_rng(6)
    B, T, H, D = 2, 64, 2, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((1, H, T, T)), jnp.float32) * 0.5
    keep = jnp.asarray(rng.random((B, T)) > 0.2).at[:, 0].set(True)
    mask = keep[:, None, None, :]
    mesh = build_mesh(ParallelConfig(data=2, sequence=4, fsdp=1, tensor=1))

    def ring(q, k, v, bias):
        return ring_attention(q, k, v, mesh, scale=0.2, use_flash=use_flash,
                              causal=causal, bias=bias, mask=mask,
                              batch_axis="data")

    def dense(q, k, v, bias):
        m = jnp.logical_and(mask, cmask(T, T)) if causal else mask
        return dot_product_attention(q, k, v, bias=bias, mask=m, scale=0.2)

    out = ring(q, k, v, bias)
    ref = dense(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    g = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    gr = jax.grad(lambda *a: (ring(*a) * g).sum(), argnums=(0, 1, 2, 3))(q, k, v, bias)
    gd = jax.grad(lambda *a: (dense(*a) * g).sum(), argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("use_flash", [False, True])
def test_ring_attention_causal_matches_full(use_flash):
    """Causal ring: upper-triangle ring steps are skipped via lax.cond, the
    diagonal step applies the local causal mask — parity with dense causal
    attention, forward and backward."""
    from ofasys_tpu.ops.attention import causal_mask

    rng = np.random.default_rng(5)
    B, T, H, D = 1, 128, 2, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    mesh = build_mesh(ParallelConfig(data=2, sequence=4, fsdp=1, tensor=1))
    out = ring_attention(q, k, v, mesh, scale=0.2, use_flash=use_flash, causal=True)
    ref = dot_product_attention(q, k, v, scale=0.2, mask=causal_mask(T, T))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    g = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    gr = jax.grad(lambda q, k, v: (ring_attention(q, k, v, mesh, scale=0.2,
                                                  use_flash=use_flash, causal=True) * g).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(lambda q, k, v: (dot_product_attention(q, k, v, scale=0.2,
                                                         mask=causal_mask(T, T)) * g).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("use_flash", [False, True])
def test_ring_attention_gradients(use_flash):
    """The online merge consumes each partial's lse, so grads must flow
    through lse (flash_attention_with_lse's custom_vjp) — parity with the
    dense attention gradient."""
    rng = np.random.default_rng(4)
    B, T, H, D = 1, 64, 2, 16
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)
    mesh = build_mesh(ParallelConfig(data=4, sequence=2, fsdp=1, tensor=1))
    g = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.float32)

    def loss_ring(q, k, v):
        return (ring_attention(q, k, v, mesh, scale=0.2, use_flash=use_flash) * g).sum()

    def loss_ref(q, k, v):
        return (dot_product_attention(q, k, v, scale=0.2) * g).sum()

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------- MoE in the
# model stack (cfg.moe_experts: every moe_every_n-th layer's FFN is
# Switch-routed, reference module/base_layer.py BaseLayer role)

def _moe_model(mesh=None):
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_step import copy_batch, tiny_model

    m, d = tiny_model(dropout=0.0)
    m.cfg.moe_experts = 4
    m.cfg.moe_every_n = 2          # layer 2 of 2 in each stack is MoE
    m.cfg.moe_capacity_factor = 4.0
    # re-initialize with the MoE config active
    m.initialize(d, active_adaptors=("text",), mesh=mesh)
    batch = copy_batch(d, np.random.default_rng(0), B=8, T=9)
    return m, d, batch


def test_moe_model_trains_and_decodes():
    from ofasys_tpu.configure.configs import OptimizationConfig
    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState, make_train_step
    from ofasys_tpu.generator import SequenceGenerator

    m, d, batch = _moe_model()
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    names = ["/".join(str(k) for k in p) for p, _ in
             jax.tree_util.tree_leaves_with_path(params)]
    assert any("moe_ffn" in n and "moe_w1" in n for n in names), names[:5]
    assert any("'ffn'" in n or "/ffn/" in n.replace("'", "/") for n in names)  # layer 1 stays dense

    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.0), pad_id=d.pad())
    opt = build_optimizer(OptimizationConfig(lr=(5e-3,)), total_num_update=100)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(m, crit, opt))
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]) / float(metrics["sample_size"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    assert "moe_aux" in metrics["logging"] if "logging" in metrics else True
    # expert weights actually trained
    flat = {"/".join(str(k) for k in p): v for p, v in
            jax.tree_util.tree_leaves_with_path(state.params)}
    init_flat = {"/".join(str(k) for k in p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(params)}
    moved = [k for k in flat if "moe_w1" in k and
             not np.allclose(np.asarray(flat[k]), np.asarray(init_flat[k]))]
    assert moved, "MoE expert weights did not update"

    gen = SequenceGenerator(m, d, beam_size=2, max_len_b=8)
    out = gen.generate(state.params, {"net_input": {"slots": batch["net_input"]["slots"]}})
    assert len(out) == 8 and out[0][0].tokens[-1] == d.eos()


def test_moe_model_expert_parallel_step():
    """Full sharded train step with experts over the mesh 'expert' axis."""
    from ofasys_tpu.configure.configs import OptimizationConfig
    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState, make_train_step
    from ofasys_tpu.parallel import make_sharded_train_step, put_batch, shard_tree

    mesh = build_mesh(ParallelConfig(data=2, expert=4, fsdp=1, tensor=1))
    m, d, batch = _moe_model(mesh=mesh)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.0), pad_id=d.pad())
    opt = build_optimizer(OptimizationConfig(lr=(5e-3,)), total_num_update=100)
    state = shard_tree(TrainState.create(params, opt), mesh)
    # expert weights really sharded over the expert axis
    w1 = state.params["decoder"]["layers_1"]["moe_ffn"]["moe_w1"]
    assert "expert" in str(w1.sharding.spec), w1.sharding
    step = make_sharded_train_step(make_train_step(m, crit, opt), mesh, state, batch)
    db = put_batch(batch, mesh)
    l0 = None
    for i in range(5):
        state, metrics = step(state, db, jax.random.PRNGKey(i))
        l = float(metrics["loss"]) / float(metrics["sample_size"])
        l0 = l0 or l
    assert np.isfinite(l) and l <= l0 * 1.2
