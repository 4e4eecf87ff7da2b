"""Pipeline parallelism (parallel/pipeline.py): GPipe over the 'pipe' mesh
axis. The reference shipped config scaffolding only
(ofasys/configure/configs.py:306-351); this is a real implementation, so the
tests pin its semantics: pipelined == sequential, for a toy stack and for the
full GeneralistModel (forward + gradients), plus a Trainer.fit smoke with
cfg.parallel.pipeline=2."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ofasys_tpu import GeneralistModel, ModalityType, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig
from ofasys_tpu.model.ofa import GeneralistNet
from ofasys_tpu.parallel.pipeline import pipeline_stack
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils.pytree import SlotBatch


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def _pipe_mesh(pipe: int) -> Mesh:
    devs = np.asarray(jax.devices())
    data = devs.size // pipe
    return Mesh(devs.reshape(data, 1, 1, 1, 1, pipe),
                ("data", "fsdp", "tensor", "sequence", "expert", "pipe"))


def test_pipeline_stack_matches_sequential():
    mesh = _pipe_mesh(4)
    L, B, T, E = 8, 16, 8, 32
    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((L, E, E)) * 0.05, jnp.float32),
        "b": jnp.asarray(rng.standard_normal((L, E)) * 0.05, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((B, T, E)), jnp.float32)
    mask = jnp.asarray(rng.random((B, T)) > 0.2, jnp.float32)
    scale = jnp.float32(1.01)

    def layer_apply(lp, gi, m, x_mb, mm, bcast):
        return jnp.tanh(x_mb @ lp["w"] + lp["b"]) * mm[:, :, None] * bcast + x_mb

    def seq(params, x):
        for i in range(L):
            x = layer_apply(jax.tree.map(lambda a, i=i: a[i], params), i, 0, x, mask, scale)
        return x

    def piped(params, x):
        return pipeline_stack(mesh, layer_apply, params, x,
                              micro_args=mask, bcast_args=scale, n_micro=4)

    y_ref = seq(params, x)
    y_pipe = jax.jit(piped)(params, x)
    np.testing.assert_allclose(np.asarray(y_pipe), np.asarray(y_ref), rtol=1e-5, atol=1e-6)

    g_ref = jax.grad(lambda p, x: jnp.sum(seq(p, x) ** 2))(params, x)
    g_pipe = jax.jit(jax.grad(lambda p, x: jnp.sum(piped(p, x) ** 2)))(params, x)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_pipe[k]), np.asarray(g_ref[k]),
                                   rtol=2e-3, atol=1e-4)


def _model_and_slots():
    d = Dictionary()
    for i in range(100):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    model = GeneralistModel(arch="tiny")
    model.cfg.dropout = 0.0
    model.cfg.scan_layers = True
    model.initialize(d, active_adaptors=("text",), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    B = 8
    toks = rng.integers(d.nspecial, d.nspecial + 100, size=(B, 8)).astype(np.int32)
    tgt = rng.integers(d.nspecial, d.nspecial + 100, size=(B, 6)).astype(np.int32)
    prev = np.concatenate([np.full((B, 1), d.bos(), np.int32), tgt[:, :-1]], 1)
    slots = [
        SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(toks)}, "src"),
        SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.asarray(prev)}, "tgt"),
    ]
    return model, d, slots, jnp.asarray(tgt)


def test_model_pipeline_matches_scan():
    """tiny arch (4+4 layers) on a pipe=2 mesh: pipelined forward and grads
    equal the plain scan-over-layers path with the SAME params."""
    mesh = _pipe_mesh(2)
    model, d, slots, tgt = _model_and_slots()
    params = model.init_params(jax.random.PRNGKey(0), slots)

    cfg_pipe = copy.deepcopy(model.cfg)
    cfg_pipe.pipeline_stages = 2
    net_pipe = GeneralistNet(
        cfg=cfg_pipe, vocab_size=len(d), pad_id=d.pad(),
        active_adaptors=("text",), dtype=jnp.float32, mesh=mesh,
    )

    logits_ref, _ = model.net.apply({"params": params}, slots, True)
    logits_pipe, _ = jax.jit(
        lambda p: net_pipe.apply({"params": p}, slots, True)
    )(params)
    np.testing.assert_allclose(np.asarray(logits_pipe), np.asarray(logits_ref),
                               rtol=2e-4, atol=2e-4)

    def loss(net):
        def f(p):
            lg, _ = net.apply({"params": p}, slots, True)
            lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
            return -jnp.mean(jnp.take_along_axis(lp, tgt[..., None], axis=-1))
        return f

    g_ref = jax.grad(loss(model.net))(params)
    g_pipe = jax.jit(jax.grad(loss(net_pipe)))(params)
    ref_leaves = jax.tree.leaves(g_ref)
    pipe_leaves = jax.tree.leaves(g_pipe)
    assert len(ref_leaves) == len(pipe_leaves)
    for a, b in zip(pipe_leaves, ref_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def _text_records(n=32, seed=0):
    words = ["red", "blue", "green", "bird", "dog", "cat", "sky", "tree"]
    rng = np.random.default_rng(seed)
    return [
        {"src": " ".join(words[j] for j in rng.integers(0, len(words), 4)),
         "tgt": " ".join(words[j] for j in rng.integers(0, len(words), 3))}
        for _ in range(n)
    ]


def test_trainer_fit_with_pipeline():
    """cfg.parallel.pipeline=2 end-to-end: Trainer builds the pipe mesh,
    flips the model to scan+pipeline, and the loss decreases."""
    t = Task(name="pipe_copy", instruction="[TEXT:src] -> [TEXT:tgt]")
    t.cfg.dataset.batch_size = 8
    t.add_dataset(_text_records(), "train")

    model = GeneralistModel(arch="tiny")
    model.cfg.dropout = 0.0

    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    cfg.common.dtype = "float32"
    cfg.optimization.lr = (5e-3,)
    cfg.parallel.pipeline = 2
    cfg.parallel.data = -1
    trainer = Trainer(cfg)
    state = trainer.fit(model, [t], max_update=6)
    assert int(state.step) == 6
    assert model.cfg.pipeline_stages == 2 and model.cfg.scan_layers
    assert trainer.mesh.shape["pipe"] == 2
    assert np.isfinite(trainer.meters["pipe_copy:loss"].avg)
