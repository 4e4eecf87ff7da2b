"""Pallas TPU fused W8A8 matmul (serving path of ops/quant.py).

The XLA formulation of the int8 matmul (`int8_matmul` in ops/quant.py)
computes ``dequant(xq @ q)`` as dot_general(preferred int32) followed by
an elementwise f32 epilogue. XLA does NOT fuse that epilogue into the
matmul on TPU, so the int32 accumulator round-trips HBM — at the tied
logits projection (rows=B*T, K=E, N=vocab) that is a (rows, vocab) int32
tensor (4 bytes/elem) written + read + an f32 intermediate, which
measured SLOWER than the plain bf16 matmul at serving batch sizes
despite the ~2x int8 MXU rate (v5e: ~345 int8 TOPS vs ~187 bf16 TFLOPs,
readback-timed).

This kernel keeps the int32 accumulator in VMEM: each (Bm, Bn) output
block does an int8 x int8 -> int32 MXU contraction over the full K,
applies the per-row activation scale and per-column weight scale in
registers, and writes only the bf16 result to HBM — the same output
traffic as the bf16 matmul, at the int8 compute rate.

Activation quantization (dynamic, per row, symmetric — identical to
ops/quant.py `_quantize_rows`) stays OUTSIDE the kernel as a cheap XLA
pre-pass: it fuses with whatever produced the activations, and passing
xq int8 into the kernel also halves x-block HBM traffic vs re-reading
bf16 activations per N block.

No custom_vjp: quantized matmuls are serving-only (ops/quant.py is
never active during training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(xq_ref, sx_ref, q_ref, sc_ref, o_ref):
    # xq (Bm, K) int8; sx (Bm, 1) f32; q (K, Bn) int8; sc (1, Bn) f32
    acc = jax.lax.dot_general(
        xq_ref[:], q_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * sc_ref[:]).astype(o_ref.dtype)


def _pick_block(n: int, candidates=(1024, 512, 256, 128)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def fused_supported(M: int, K: int, N: int) -> bool:
    """Shapes the kernel handles: lane-aligned K/N and enough rows that
    an (Bm, Bn) MXU block is not mostly padding."""
    return K % 128 == 0 and K <= 8192 and _pick_block(N) != 0 and M >= 128


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_m", "block_n"))
def fused_w8a8_matmul(
    xq: jax.Array,        # (M, K) int8 — pre-quantized activation rows
    sx: jax.Array,        # (M, 1) f32 — per-row activation scales
    q: jax.Array,         # (K, N) int8
    scale: jax.Array,     # (N,) f32 — per-output-column weight scales
    *,
    out_dtype=jnp.bfloat16,
    block_m: int = 512,
    block_n: int = 1024,
) -> jax.Array:
    """dequant(xq @ q) with the epilogue fused in VMEM; returns (M, N)."""
    M, K = xq.shape
    N = q.shape[1]
    interpret = jax.default_backend() not in ("tpu", "axon")
    Bn = _pick_block(N, (block_n, 1024, 512, 256, 128))
    Bm = min(block_m, _round_up(M, 128))
    Mp = _round_up(M, Bm)
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)), constant_values=1.0)
    out = pl.pallas_call(
        _kernel,
        grid=(Mp // Bm, N // Bn),
        in_specs=[
            pl.BlockSpec((Bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((Bm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((K, Bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, Bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((Bm, Bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * N,
            bytes_accessed=Mp * K + K * N + Mp * N * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xq, sx, q, scale.reshape(1, N))
    return out[:M] if Mp != M else out
