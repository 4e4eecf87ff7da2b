"""Int8 serving quantization (ofasys_tpu/ops/quant.py).

TPU-first addition (no reference counterpart): v5e int8 MXU is ~2x bf16
peak and decode GEMVs are weight-bandwidth-bound. These tests pin the
numerics of the W8A8 / W8 matmuls, the checkpoint-preserving param
transform, and end-to-end greedy-decode agreement with the fp32 model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.generator import SequenceGenerator
from ofasys_tpu.ops.quant import (
    DEFAULT_PATTERN,
    QuantDense,
    as_variables,
    int8_matmul,
    quantize_for_serving,
    quantize_weight,
)

from test_train_step import copy_batch, tiny_model


def test_int8_matmul_error_bounds():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 37, 96)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 64)).astype(np.float32))
    ref = x @ w
    q, scale = quantize_weight(w)
    assert q.dtype == jnp.int8 and scale.shape == (64,)
    for mode in ("w8a8", "w8"):
        got = int8_matmul(x, q, scale, mode=mode, out_dtype=jnp.float32)
        rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
        # int8 per-channel symmetric: ~1% relative error on gaussian data
        assert rel < 0.03, (mode, rel)
    with pytest.raises(ValueError):
        int8_matmul(x, q, scale, mode="w4")


def test_quant_dense_matches_dense_when_not_quantized():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 5, 16), jnp.float32)
    import flax.linen as nn

    qd = QuantDense(8, dtype=jnp.float32)
    dd = nn.Dense(8, dtype=jnp.float32, param_dtype=jnp.float32)
    pq = qd.init(rng, x)
    pd = dd.init(rng, x)
    # identical initializers and param layout -> identical outputs
    assert jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.array_equal(a, b)), pq, pd))
    np.testing.assert_allclose(qd.apply(pq, x), dd.apply(pd, x), rtol=1e-6)


def test_quantize_for_serving_prunes_and_mirrors():
    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=2, T=6)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    sv = quantize_for_serving(params)
    import re

    rx = re.compile(DEFAULT_PATTERN)

    def paths(tree, p=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from paths(v, p + (k,))
        else:
            yield "/".join(p), tree

    pruned = dict(paths(sv["params"]))
    qk = dict(paths(sv["qkern"]))
    orig = dict(paths(params))
    matched = [p for p in orig if rx.search(p)]
    assert matched, "tiny model should have q_proj/fc kernels"
    for p in matched:
        assert p not in pruned, f"fp32 copy of {p} not pruned"
        base = p.rsplit("/", 1)[0]
        assert qk[base + "/q"].dtype == jnp.int8
        assert qk[base + "/scale"].dtype == jnp.float32
    # biases and non-matmul params survive untouched
    for p, leaf in orig.items():
        if not rx.search(p):
            assert p in pruned
    # tied-logits int8 copy exists; fp32 embedding kept for lookups
    assert "embed_tokens/q" in qk and "embed_tokens/scale" in qk
    assert "embed_tokens/embedding" in pruned
    # weight bytes actually shrink: int8 + fp32 scales < fp32 kernels
    saved = sum(orig[p].size * 4 - qk[p.rsplit("/", 1)[0] + "/q"].size
                for p in matched)
    assert saved > 0


def test_quantize_for_serving_rejects_foreign_tree():
    with pytest.raises(ValueError):
        quantize_for_serving({"mlp": {"kernel": jnp.ones((4, 4))}})


@pytest.fixture(scope="module")
def trained():
    from ofasys_tpu.configure.configs import OptimizationConfig
    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState, make_train_step

    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=4, T=6)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(label_smoothing=0.0), pad_id=d.pad()
    )
    opt = build_optimizer(OptimizationConfig(lr=(1e-2,)), total_num_update=300)
    state = TrainState.create(params, opt)
    step = jax.jit(make_train_step(m, crit, opt))
    for _ in range(200):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    return m, d, state.params, batch


@pytest.mark.parametrize("mode", ["w8a8", "w8"])
def test_quantized_greedy_decode_agrees(trained, mode):
    """End to end: int8 serving variables reproduce the fp32 greedy decode
    on a memorized copy task (both modes, logits projection included)."""
    m, d, params, batch = trained
    m.cfg.quant_mode = mode
    sample = {"net_input": {"slots": batch["net_input"]["slots"]}}
    gen = SequenceGenerator(m, d, beam_size=1, max_len_b=8, min_len=1)
    ref = gen.generate(params, sample)
    sv = quantize_for_serving(params)
    got = SequenceGenerator(m, d, beam_size=1, max_len_b=8, min_len=1).generate(sv, sample)
    agree = sum(
        np.array_equal(a[0].tokens, b[0].tokens) for a, b in zip(ref, got)
    )
    assert agree == len(ref), [(a[0].tokens, b[0].tokens) for a, b in zip(ref, got)]


def test_quantized_full_forward_close(trained):
    """decode_full logits under int8 stay close to fp32 logits (cosine)."""
    m, d, params, batch = trained
    slots = batch["net_input"]["slots"]
    ref, _ = m.apply(params, slots)
    sv = quantize_for_serving(params)
    got, _ = m.apply(sv, slots)
    a = np.asarray(ref, np.float32).ravel()
    b = np.asarray(got, np.float32).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.995, cos


def test_as_variables_passthrough():
    p = {"encoder": {"x": jnp.ones(2)}}
    assert as_variables(p) == {"params": p}
    v = {"params": p, "qkern": {}}
    assert as_variables(v) is v


def test_fused_w8a8_matches_xla_path():
    """Pallas fused kernel (interpret mode on CPU) == the XLA int8 matmul
    epilogue to f32 rounding, including the ragged-M padded tail."""
    from ofasys_tpu.ops.pallas_int8 import fused_supported, fused_w8a8_matmul
    from ofasys_tpu.ops.quant import _quantize_rows

    rng = np.random.default_rng(0)
    for M in (256, 300):  # 300: ragged tail exercises the pad/slice path
        K, N = 128, 256
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
        q, scale = quantize_weight(w)
        assert fused_supported(M, K, N)
        xq, sx = _quantize_rows(x)
        ref = int8_matmul(x, q, scale, mode="w8a8", out_dtype=jnp.float32)
        got = fused_w8a8_matmul(xq, sx, q, scale, out_dtype=jnp.float32,
                                block_m=128, block_n=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_supported_gates():
    from ofasys_tpu.ops.pallas_int8 import fused_supported

    assert fused_supported(128, 768, 30464)
    assert not fused_supported(64, 768, 30464)    # too few rows
    assert not fused_supported(128, 700, 30464)   # K not lane-aligned
    assert not fused_supported(128, 768, 30000)   # N has no 128-divisor block
