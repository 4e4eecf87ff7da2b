"""Chunked-vocab fused CE (ops/fused_ce.py): stats and end-to-end loss /
gradient parity with the unfused logsumexp-form criterion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
    LabelSmoothedCrossEntropyCriterion,
    LabelSmoothedCrossEntropyCriterionConfig,
)
from ofasys_tpu.ops.fused_ce import chunked_ce_stats, pick_chunks

from test_train_step import copy_batch, tiny_model  # noqa: F401


def _chunkable_model():
    """Tiny arch but a lane-aligned vocab (1024) so pick_chunks fires."""
    from ofasys_tpu import GeneralistModel
    from ofasys_tpu.preprocessor.dictionary import Dictionary

    d = Dictionary()
    for i in range(900):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(1024)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 2
    m.cfg.dropout = 0.0
    m.initialize(d, active_adaptors=("text",), dtype=jnp.float32)
    return m, d


def test_pick_chunks():
    assert pick_chunks(51200) is not None
    assert 51200 % pick_chunks(51200) == 0
    assert (51200 // pick_chunks(51200)) % 128 == 0
    assert pick_chunks(127) is None          # prime, not lane-aligned
    assert pick_chunks(128) is None          # only C=1 divides into 128-lanes


def _dense_stats(x2, emb, tgt, dtype):
    s = jax.lax.dot_general(
        x2.astype(dtype), emb.astype(dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).astype(jnp.float32)
    lse = jax.nn.logsumexp(s, axis=-1)
    z_t = jnp.take_along_axis(s, tgt[:, None], axis=-1)[:, 0]
    return lse, z_t, jnp.sum(s, axis=-1)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_chunked_stats_match_dense(dtype):
    rng = np.random.default_rng(0)
    N, E, V = 64, 32, 512
    x2 = jnp.asarray(rng.standard_normal((N, E)), dtype)
    emb = jnp.asarray(rng.standard_normal((V, E)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, N), jnp.int32)

    lse, z_t, zsum = jax.jit(
        lambda x, w: chunked_ce_stats(x, w, tgt, 4, dtype)
    )(x2, emb)
    lse_d, zt_d, zs_d = _dense_stats(x2, emb, tgt, dtype)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_d), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(z_t), np.asarray(zt_d), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(zsum), np.asarray(zs_d),
                               rtol=1e-4, atol=1e-3)


def test_chunked_stats_gradients_match_dense():
    rng = np.random.default_rng(1)
    N, E, V = 48, 32, 384
    x2 = jnp.asarray(rng.standard_normal((N, E)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((V, E)) * 0.1, jnp.float32)
    tgt = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    gl = jnp.asarray(rng.standard_normal(N), jnp.float32)
    gt = jnp.asarray(rng.standard_normal(N), jnp.float32)
    gs = jnp.asarray(rng.standard_normal(N), jnp.float32) * 0.01

    def fused(x, w):
        lse, z_t, zsum = chunked_ce_stats(x, w, tgt, 3, jnp.float32)
        return jnp.sum(lse * gl + z_t * gt + zsum * gs)

    def dense(x, w):
        lse, z_t, zsum = _dense_stats(x, w, tgt, jnp.float32)
        return jnp.sum(lse * gl + z_t * gt + zsum * gs)

    gx_f, gw_f = jax.jit(jax.grad(fused, argnums=(0, 1)))(x2, emb)
    gx_d, gw_d = jax.jit(jax.grad(dense, argnums=(0, 1)))(x2, emb)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_d),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_d),
                               rtol=2e-4, atol=2e-5)


def test_criterion_fused_matches_unfused_end_to_end():
    """Same tiny model, same batch: chunked_vocab=True produces the same
    loss and the same parameter gradients as the standard path (the fused
    plan must also actually fire — vocab is padded to a lane-aligned
    multiple by the Dictionary)."""
    m, d = _chunkable_model()
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=4, T=8)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    V = len(d)
    assert pick_chunks(V) is not None, f"vocab {V} must be chunkable for this test"

    def make_loss(chunked):
        crit = LabelSmoothedCrossEntropyCriterion(
            LabelSmoothedCrossEntropyCriterionConfig(
                label_smoothing=0.1, chunked_vocab=chunked
            ),
            pad_id=d.pad(),
        )

        def f(p):
            loss, ss, logging = crit(m, {"params": p}, batch, rng=None, train=True)
            return loss / jnp.maximum(ss, 1.0), logging

        return f

    (l0, log0), g0 = jax.jit(jax.value_and_grad(make_loss(False), has_aux=True))(params)
    (l1, log1), g1 = jax.jit(jax.value_and_grad(make_loss(True), has_aux=True))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    assert float(log0["ntokens"]) == float(log1["ntokens"])
    np.testing.assert_allclose(float(log1["nll_loss"]), float(log0["nll_loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_fused_plan_gates():
    """The fused path declines report_accuracy, constraint masks, and
    non-text targets instead of computing a wrong loss."""
    m, d = _chunkable_model()
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=2, T=8)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(chunked_vocab=True),
        pad_id=d.pad(),
    )
    logits, extra = m.apply({"params": params}, batch["net_input"]["slots"],
                            deterministic=True)
    assert crit._fused_plan({"params": params}, extra, batch, logits) is not None
    # constraint masks -> standard path
    b2 = dict(batch)
    b2["constraint_masks"] = jnp.ones(logits.shape, bool)
    assert crit._fused_plan({"params": params}, extra, b2, logits) is None
    # accuracy reporting -> standard path
    crit2 = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(chunked_vocab=True,
                                                 report_accuracy=True),
        pad_id=d.pad(),
    )
    assert crit2._fused_plan({"params": params}, extra, batch, logits) is None
    # continuous (non-integer) target -> standard path
    b3 = dict(batch)
    b3["target"] = jnp.zeros(batch["target"].shape, jnp.float32)
    assert crit._fused_plan({"params": params}, extra, b3, logits) is None


def test_fused_plan_declines_untied_and_nontext():
    """Round-5 review fixes: the gate must decline (a) params carrying an
    untied output projection / output bias (flax names 'output_projection'
    / 'output_projection_bias'), and (b) non-TEXT target slots (image-code
    targets attend at fp32)."""
    import dataclasses

    import jax.numpy as jnp

    from ofasys_tpu import ModalityType

    m, d = _chunkable_model()
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=2, T=8)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(chunked_vocab=True),
        pad_id=d.pad(),
    )
    logits, extra = m.apply({"params": params}, batch["net_input"]["slots"],
                            deterministic=True)
    assert crit._fused_plan({"params": params}, extra, batch, logits) is not None

    # (a) untied projection anywhere in the tree -> decline
    p_untied = dict(params)
    p_untied["decoder_adaptor_fake"] = {
        "output_projection": jnp.zeros((4, 4), jnp.float32)
    }
    assert crit._fused_plan({"params": p_untied}, extra, batch, logits) is None
    p_bias = dict(params)
    p_bias["decoder_adaptor_fake"] = {
        "output_projection_bias": jnp.zeros((4,), jnp.float32)
    }
    assert crit._fused_plan({"params": p_bias}, extra, batch, logits) is None

    # (b) non-TEXT target slot -> decline
    slots = batch["net_input"]["slots"]
    tgt = [s for s in slots if not s.is_src][0]
    img_tgt = dataclasses.replace(tgt, modality=ModalityType.IMAGE)
    b2 = dict(batch)
    b2["net_input"] = {"slots": [s if s.is_src else img_tgt for s in slots]}
    assert crit._fused_plan({"params": params}, extra, b2, logits) is None
