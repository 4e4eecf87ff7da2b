"""Pallas TPU fused LayerNorm (forward + backward).

Counterpart of the reference's fused LayerNorm CUDA kernels
(ofasys/module/fused_kernels/layer_norm_cuda*). Available as an op, but
NOT wired into the model: measured in-context on the mixed multi-task
bench (v5e), swapping every transformer/adaptor LN for this kernel
REGRESSED throughput 1352 -> 1213 samples/s (-10%) — XLA fuses its LN ops
into the surrounding residual/convert/matmul fusions, and standalone
kernel boundaries reintroduce the HBM round-trips they save internally.
On TPU the fused-LN checkbox is best served by the compiler; this module
stays for odd shapes/stacks where fusion is unavailable, with each
direction in one bandwidth-bound pass:

  forward : grid over row blocks; per-row f32 stats (fast-variance form,
            matching flax.linen.LayerNorm), saves (y, mu, rstd)
  backward: one sequential grid; per-row dx needs only row stats, while
            dgamma/dbeta accumulate across row blocks in VMEM scratch and
            write once at the last block

Numerics match flax.linen.LayerNorm(use_fast_variance=True): stats in
f32 over the (possibly bf16) input, eps inside rsqrt, output cast to the
module dtype. The FusedLayerNorm module keeps nn.LayerNorm's parameter
names ("scale", "bias") so checkpoints and the torch importer are
unaffected; it falls back to plain XLA math off-TPU or for feature dims
that aren't lane-aligned.
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ----------------------------------------------------------------- kernels
def _ln_fwd_kernel(x_ref, g_ref, b_ref, y_ref, mu_ref, rstd_ref, *, eps, N, Bn):
    i = pl.program_id(0)
    xf = x_ref[:].astype(jnp.float32)                       # (Bn, E)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    g = g_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    y_ref[:] = (xhat * g[None, :] + b[None, :]).astype(y_ref.dtype)
    mu_ref[:] = mu
    rstd_ref[:] = rstd


def _ln_bwd_kernel(x_ref, g_ref, mu_ref, rstd_ref, dy_ref,
                   dx_ref, dg_ref, db_ref,
                   dg_scr, db_scr, *, N, Bn, n_blocks):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dg_scr[:] = jnp.zeros_like(dg_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    xf = x_ref[:].astype(jnp.float32)
    dyf = dy_ref[:].astype(jnp.float32)
    mu = mu_ref[:]
    rstd = rstd_ref[:]
    xhat = (xf - mu) * rstd
    if n_blocks * Bn != N:
        rows = i * Bn + jax.lax.broadcasted_iota(jnp.int32, (Bn, 1), 0)
        dyf = jnp.where(rows < N, dyf, 0.0)                 # padded rows out
    dg_scr[:] += jnp.sum(dyf * xhat, axis=0, keepdims=True)
    db_scr[:] += jnp.sum(dyf, axis=0, keepdims=True)

    g = g_ref[:].astype(jnp.float32)
    dxhat = dyf * g[None, :]
    E = xf.shape[1]
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx_ref[:] = ((dxhat - m1 - xhat * m2) * rstd).astype(dx_ref.dtype)

    @pl.when(i == n_blocks - 1)
    def _epilogue():
        dg_ref[:] = dg_scr[:]
        db_ref[:] = db_scr[:]


def _ln_forward(x, g, b, eps, block_rows: int = 256, return_stats: bool = False):
    N, E = x.shape
    Bn = min(block_rows, _round_up(N, 8))
    n = pl.cdiv(N, Bn)
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps, N=N, Bn=Bn),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((Bn, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bn, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, E), x.dtype),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * N * E, bytes_accessed=4 * N * E, transcendentals=N
        ),
    )(x, g, b)
    return out if return_stats else out[0]


def _ln_backward(x, g, mu, rstd, dy, block_rows: int = 256):
    N, E = x.shape
    Bn = min(block_rows, _round_up(N, 8))
    n = pl.cdiv(N, Bn)
    interpret = jax.default_backend() not in ("tpu", "axon")
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, N=N, Bn=Bn, n_blocks=n),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((Bn, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bn, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bn, E), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, E), x.dtype),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
            jax.ShapeDtypeStruct((1, E), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, E), jnp.float32),
            pltpu.VMEM((1, E), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * N * E, bytes_accessed=6 * N * E, transcendentals=0
        ),
    )(x, g, mu, rstd, dy)
    return dx, dg[0], db[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x, g, b, eps):
    """(N, E) fused LayerNorm; differentiable; flax-equivalent numerics."""
    return _ln_forward(x, g, b, eps)


def _fln_fwd(x, g, b, eps):
    y, mu, rstd = _ln_forward(x, g, b, eps, return_stats=True)
    return y, (x, g, mu, rstd)


def _fln_bwd(eps, res, dy):
    x, g, mu, rstd = res
    dx, dg, db = _ln_backward(x, g, mu, rstd, dy)
    return dx, dg.astype(g.dtype), db.astype(g.dtype)


fused_layer_norm.defvjp(_fln_fwd, _fln_bwd)


def ln_supported(E: int) -> bool:
    """Lane-aligned feature dims on a real TPU backend."""
    return E % 128 == 0 and jax.default_backend() in ("tpu", "axon")


# ------------------------------------------------- hybrid (XLA fwd, Pallas bwd)
# The full Pallas LN lost the in-context A/B because the forward kernel
# boundary broke XLA's producer/consumer fusions (module docstring). The
# backward looked like a different trade: the profile shows LN-backward
# fusions at ~13% of train-step device time, apparently standing alone.
# This variant keeps the forward as plain jnp math (XLA fuses it exactly
# as before) and routes only the backward through the one-pass Pallas
# kernel. MEASURED (mixed multi-task bench, v5e, BENCH_LN=hybrid):
# 1195 vs 1341 samples/s — the backward kernel boundary ALSO regresses
# (-11%); those "LN backward" fusions evidently absorb neighboring
# backward elementwise work that then needs its own kernels. Verdict:
# ln_impl stays 'xla' by default; both kernels remain for odd stacks
# where XLA fusion is unavailable.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def hybrid_layer_norm(x, g, b, eps):
    """(N, E) LayerNorm: XLA-fusable forward, Pallas backward."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


def _hln_fwd(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    y = ((xf - mu) * rstd * g + b).astype(x.dtype)
    return y, (x, g, mu, rstd)


def _hln_bwd(eps, res, dy):
    x, g, mu, rstd = res
    dx, dg, db = _ln_backward(x, g, mu, rstd, dy)
    return dx, dg.astype(g.dtype), db.astype(g.dtype)


hybrid_layer_norm.defvjp(_hln_fwd, _hln_bwd)


class FusedLayerNorm(nn.Module):
    """Drop-in for nn.LayerNorm (same param names/init/numerics); routes
    lane-aligned shapes through the Pallas kernel on TPU, XLA otherwise.

    mode: "fused"  — Pallas forward AND backward (the full kernel; loses
                     the in-context A/B, see module docstring)
          "hybrid" — XLA-fusable forward, Pallas backward only
    """

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    mode: str = "fused"

    @nn.compact
    def __call__(self, x):
        E = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (E,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (E,), jnp.float32)
        if not ln_supported(E):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
            y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
            y = y * scale + bias
            return y.astype(self.dtype or x.dtype)
        shape = x.shape
        fn = hybrid_layer_norm if self.mode == "hybrid" else fused_layer_norm
        y = fn(x.reshape(-1, E), scale, bias, self.epsilon)
        return y.reshape(shape).astype(self.dtype or x.dtype)
