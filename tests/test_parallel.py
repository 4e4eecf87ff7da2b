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


def test_sequence_parallel_model_matches_dense(monkeypatch):
    """cfg.sequence_parallel routes training self-attention through ring
    attention over the 'sequence' mesh axis (composed with 'data' DP in the
    same shard_map): one train step must match the dense single-device step,
    and the ring path must actually have been traced."""
    import ofasys_tpu.parallel.ring_attention as ring_mod
    from ofasys_tpu import GeneralistModel, ModalityType
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch

    calls = {"n": 0}
    orig = ring_mod.ring_attention

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(ring_mod, "ring_attention", counting)

    d = Dictionary()
    for i in range(60):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)

    def build(seq_parallel, mesh):
        m = GeneralistModel(arch="tiny")
        m.cfg.encoder.layers = m.cfg.decoder.layers = 2
        m.cfg.dropout = 0.0
        m.cfg.sequence_parallel = seq_parallel
        m.initialize(d, active_adaptors=("text",), dtype=jnp.float32,
                     mesh=mesh if seq_parallel else None)
        return m

    # enc T=8 and dec T=8, both divisible by the sequence axis (4)
    rng = np.random.default_rng(0)
    toks = rng.integers(d.nspecial, d.nspecial + 50, size=(8, 8)).astype(np.int32)
    prev = np.concatenate([np.full((8, 1), d.bos(), np.int32), toks[:, :-1]], 1)
    target = np.concatenate([toks[:, 1:], np.full((8, 1), d.eos(), np.int32)], 1)
    batch = {
        "net_input": {"slots": [
            SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src"),
            SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt"),
        ]},
        "target": jnp.asarray(target),
    }
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.1), pad_id=d.pad()
    )
    optimizer = build_optimizer(
        OptimizationConfig(lr=(1e-2,), optimizer="sgd", lr_scheduler="fixed", clip_norm=0.0),
        total_num_update=10,
    )

    # dense single-device reference
    m0 = build(False, None)
    params = m0.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    step0 = make_train_step(m0, crit, optimizer)
    s0 = TrainState.create(params, optimizer)
    s0, met0 = jax.jit(step0)(s0, batch, jax.random.PRNGKey(7))
    assert calls["n"] == 0

    # sequence-parallel over data=2 x sequence=4
    mesh = build_mesh(ParallelConfig(data=2, sequence=4, fsdp=1, tensor=1))
    m1 = build(True, mesh)
    params1 = m1.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    step1 = make_train_step(m1, crit, optimizer)
    s1 = TrainState.create(params1, optimizer)
    s1 = shard_tree(s1, mesh)
    sharded_step = make_sharded_train_step(step1, mesh, s1, batch, donate=False)
    db = put_batch(batch, mesh)
    s1, met1 = sharded_step(s1, db, jax.random.PRNGKey(7))
    assert calls["n"] > 0, "ring attention path was never traced"

    np.testing.assert_allclose(float(met0["loss"]), float(met1["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_sequence_parallel_scan_layers(monkeypatch):
    """sequence_parallel must also work under scan-over-layers (the mesh is
    threaded through the scan body): forward parity with the same stacked
    params run dense."""
    import ofasys_tpu.parallel.ring_attention as ring_mod
    from ofasys_tpu import GeneralistModel, ModalityType
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch

    calls = {"n": 0}
    orig = ring_mod.ring_attention

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(ring_mod, "ring_attention", counting)

    d = Dictionary()
    for i in range(60):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    mesh = build_mesh(ParallelConfig(data=2, sequence=4, fsdp=1, tensor=1))

    def build(seq_parallel):
        m = GeneralistModel(arch="tiny")
        m.cfg.encoder.layers = m.cfg.decoder.layers = 2
        m.cfg.dropout = 0.0
        m.cfg.scan_layers = True
        m.cfg.sequence_parallel = seq_parallel
        m.initialize(d, active_adaptors=("text",), dtype=jnp.float32,
                     mesh=mesh if seq_parallel else None)
        return m

    rng = np.random.default_rng(1)
    toks = rng.integers(d.nspecial, d.nspecial + 50, size=(4, 8)).astype(np.int32)
    prev = np.concatenate([np.full((4, 1), d.bos(), np.int32), toks[:, :-1]], 1)
    slots = [
        SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src"),
        SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt"),
    ]
    m_sp = build(True)
    params = m_sp.init_params(jax.random.PRNGKey(0), slots)
    out_sp, _ = m_sp.apply(params, slots)
    assert calls["n"] > 0, "ring path not traced under scan_layers"

    m_dense = build(False)
    out_dense, _ = m_dense.apply(params, slots)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_dense),
                               rtol=2e-4, atol=2e-4)


def test_sequence_parallel_guards():
    """pipeline + sequence_parallel is rejected at initialize(); an
    indivisible shape under sequence_parallel warns about the dense
    fallback instead of silently defeating the feature."""
    from ofasys_tpu import GeneralistModel, ModalityType
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch

    d = Dictionary()
    for i in range(60):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)

    m = GeneralistModel(arch="tiny")
    m.cfg.scan_layers = True
    m.cfg.pipeline_stages = 2
    m.cfg.sequence_parallel = True
    with pytest.raises(ValueError, match="sequence_parallel"):
        m.initialize(d, active_adaptors=("text",))

    mesh = build_mesh(ParallelConfig(data=2, sequence=4, fsdp=1, tensor=1))
    m2 = GeneralistModel(arch="tiny")
    m2.cfg.encoder.layers = m2.cfg.decoder.layers = 1
    m2.cfg.dropout = 0.0
    m2.cfg.sequence_parallel = True
    m2.initialize(d, active_adaptors=("text",), dtype=jnp.float32, mesh=mesh)
    rng = np.random.default_rng(0)
    # enc T=7: not divisible by sequence=4 -> dense fallback + warning
    toks = rng.integers(d.nspecial, d.nspecial + 50, size=(4, 7)).astype(np.int32)
    prev = np.concatenate([np.full((4, 1), d.bos(), np.int32), toks[:, :-1]], 1)
    slots = [
        SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src"),
        SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt"),
    ]
    with pytest.warns(UserWarning, match="falling back to DENSE"):
        params = m2.init_params(jax.random.PRNGKey(0), slots)
