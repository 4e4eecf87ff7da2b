"""Tensor/model-parallel SERVING: jitted beam decode over a sharded mesh.

The reference never shipped model-parallel inference (its trainer asserts
model_parallel_size == 1, reference engine/trainer.py:143); here the same
regex sharding rules used in training place the params and GSPMD partitions
the whole jitted while_loop beam search — tokens must be identical to
single-device decoding.
"""

import jax
import numpy as np
import pytest

from ofasys_tpu.configure.configs import OptimizationConfig, ParallelConfig
from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)
from ofasys_tpu.engine.optim import build_optimizer
from ofasys_tpu.engine.train_step import TrainState, make_train_step
from ofasys_tpu.generator import SequenceGenerator
from ofasys_tpu.parallel import build_mesh, shard_tree

from test_train_step import copy_batch, tiny_model


@pytest.fixture(scope="module")
def trained():
    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=4, T=6)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.0), pad_id=d.pad()
    )
    opt = build_optimizer(OptimizationConfig(lr=(1e-2,)), total_num_update=200)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(m, crit, opt))
    for _ in range(150):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    return m, d, state.params, batch


def _tokens(outputs):
    return [list(h[0].tokens) for h in outputs]


@pytest.mark.parametrize("pcfg", [
    ParallelConfig(data=1, tensor=8),            # pure TP serving
    ParallelConfig(data=2, fsdp=2, tensor=2),    # batch + weight sharding
])
def test_sharded_beam_decode_matches_single_device(trained, pcfg):
    m, d, params, batch = trained
    sample = {"net_input": {"slots": batch["net_input"]["slots"]}}

    ref = SequenceGenerator(m, d, beam_size=2, max_len_b=8, min_len=1).generate(params, sample)

    mesh = build_mesh(pcfg)
    sparams = shard_tree(params, mesh)
    out = SequenceGenerator(m, d, beam_size=2, max_len_b=8, min_len=1).generate(sparams, sample)

    assert _tokens(ref) == _tokens(out)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(r[0].score, o[0].score, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["w8a8", "w8"])
def test_sharded_int8_decode_matches_unsharded_int8(trained, mode):
    """int8 serving composes with sharded serving: qkern int8 kernels and
    their per-out-channel scales shard with the same Megatron layout as
    their fp32 sources (parallel/sharding.py qkern rules), so the halved
    weight bytes split across chips too."""
    from ofasys_tpu.ops.quant import quantize_for_serving

    m, d, params, batch = trained
    prev_mode = m.cfg.quant_mode
    m.cfg.quant_mode = mode
    try:
        sample = {"net_input": {"slots": batch["net_input"]["slots"]}}
        sv = quantize_for_serving(params)
        ref = SequenceGenerator(m, d, beam_size=1, max_len_b=8, min_len=1).generate(sv, sample)

        mesh = build_mesh(ParallelConfig(data=1, tensor=8))
        ssv = shard_tree(sv, mesh)
        q_leaves = [
            leaf
            for path, leaf in jax.tree_util.tree_flatten_with_path(ssv["qkern"])[0]
            if str(getattr(path[-1], "key", "")) == "q"
        ]
        assert q_leaves and all(any(l.sharding.spec) for l in q_leaves), \
            "int8 kernels were left replicated"
        out = SequenceGenerator(m, d, beam_size=1, max_len_b=8, min_len=1).generate(ssv, sample)
        assert _tokens(ref) == _tokens(out)
    finally:
        m.cfg.quant_mode = prev_mode


def test_hub_shard_method(trained):
    from ofasys_tpu.hub_interface import OFASys

    m, d, params, batch = trained
    sample = {"net_input": {"slots": batch["net_input"]["slots"]}}
    ref = SequenceGenerator(m, d, beam_size=1, max_len_b=8, min_len=1).generate(params, sample)

    hub = OFASys(m, params, d, general_preprocess=None)
    hub.shard(ParallelConfig(data=1, tensor=-1))
    shardings = {s for s in jax.tree.leaves(jax.tree.map(lambda a: a.sharding, hub.params))}
    assert any(getattr(s, "spec", None) is not None and any(s.spec) for s in shardings), \
        "shard() left every param replicated"
    out = SequenceGenerator(m, d, beam_size=1, max_len_b=8, min_len=1).generate(hub.params, sample)
    assert _tokens(ref) == _tokens(out)
