"""Pallas TPU fused attention for SHORT sequences (whole-T blocks).

The multi-task training mix runs attention at T = 8..256 — far below the
regime where blocked/online-softmax flash attention pays off (measured
0.79x vs XLA at T=196 fwd+bwd; ops/pallas_attention.py:830-848). Yet the
XLA dense path is not free either: a round-3 xplane profile of the 5-task
bench showed ~24.7 ms of a 189 ms update touching (B,H,Tq,Tk) score
tensors, of which only ~2 ms is MXU work — the rest is softmax/mask/bias
fusions plus ~10 ms of layout-change copies XLA inserts around the score
matmuls and the (B,T,H,D)<->(B,H,T,D) transposes whose backward never
fuses into the projection GEMMs.

This kernel removes both costs for short T, where whole (Tq, Tk) score
matrices fit comfortably in VMEM (~16 MB/core):

  * rank-3 (B, T, E) IO — the projection GEMMs' natural output layout —
    so XLA inserts no transposes anywhere around the call; heads are
    split INSIDE the kernel by static 64-lane slices (Mosaic lowers
    these to register shuffles, not memory traffic).
  * grid (B,): one program computes every head of one sample end to end —
    plain softmax, no online rescaling, scores never touch HBM in either
    direction. The shared bias block (H, Tq, Tk) has a constant index
    map, so it is DMA'd once and stays VMEM-resident across the batch.
  * ONE fused backward kernel producing dq, dk, dv and the
    batch-accumulated shared-bias gradient in a single pass (one score
    recompute) — the generic flash backward needs three kernels (dq,
    dkv, dbias) and three recomputes, which is exactly why it lost at
    short T.

Replaces the reference's fused CUDA scaled-masked-softmax
(ofasys/module/fused_kernels/scaled_masked_softmax*.cu) for the shapes its
training actually uses (max_positions 1024, typical slots 8..256 tokens).

Conventions match ops/attention.dot_product_attention:
  q (B, Tq, H, D) - k/v (B, Tk, H, D) - bias additive (1, H, Tq, Tk),
  shared across batch (dbias sums over B) - mask bool/int8 (B, 1, 1, Tk)
  keep-mask - softmax math fp32; p and the MXU operands bf16 (the
  attn_logits='compute' policy the XLA path defaults to).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9

# kernel applies above this many score elements per (b, h); flash attention
# (tiled, online softmax) covers T >= 256 — see dense_supported
MAX_T = 256


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _scores(q, k, h, D, scale, bias_ref, mask_ref, causal):
    """fp32 (Tq, Tk) logits for head h from (T, E) blocks."""
    Tq, Tk = q.shape[0], k.shape[0]
    sl = slice(h * D, (h + 1) * D)
    s = jax.lax.dot_general(
        q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:
        s = s * scale
    if bias_ref is not None:
        s = s + bias_ref[h].astype(jnp.float32)
    if mask_ref is not None:
        # mask_ref is the loaded (1, Tk) row — keep it rank-2 (Mosaic
        # rejects rank-1 vector layouts) and broadcast over query rows
        s = jnp.where(mask_ref != 0, s, MASK_VALUE)
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
        s = jnp.where(cols <= rows + (Tk - Tq), s, MASK_VALUE)
    return s


# ------------------------------------------------------------------ forward
def _fwd_kernel(*refs, has_bias, has_mask, scale, causal, H, D, out_dtype):
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    bias_ref = refs[i] if has_bias else None
    i += has_bias
    mask_ref = refs[i][0] if has_mask else None
    i += has_mask
    o_ref, lse_ref = refs[i], refs[i + 1]

    q = q_ref[0]                                 # (Tq, E) storage dtype
    k = k_ref[0]                                 # (Tk, E)
    v = v_ref[0]
    for h in range(H):                           # static loop, static slices
        s = _scores(q, k, h, D, scale, bias_ref, mask_ref, causal)
        m = jnp.max(s, axis=1, keepdims=True)    # (Tq, 1)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        sl = slice(h * D, (h + 1) * D)
        acc = jax.lax.dot_general(
            p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # (Tq, D) fp32
        o_ref[0, :, sl] = (acc / l).astype(out_dtype)
        lse_ref[0, h] = m + jnp.log(l)           # (Tq, 1)


# ----------------------------------------------------------------- backward
def _bwd_kernel(*refs, has_bias, has_mask, scale, causal, H, D, n_b):
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    do_ref = refs[i]; i += 1
    lse_ref = refs[i]; i += 1
    bias_ref = refs[i] if has_bias else None
    i += has_bias
    mask_ref = refs[i][0] if has_mask else None
    i += has_mask
    dq_ref, dk_ref, dv_ref = refs[i], refs[i + 1], refs[i + 2]
    i += 3
    dbias_ref = refs[i] if has_bias else None
    i += has_bias
    dbias_scr = refs[i] if has_bias else None

    b = pl.program_id(0)
    q = q_ref[0]                                 # (Tq, E)
    k = k_ref[0]                                 # (Tk, E)
    v = v_ref[0]
    do = do_ref[0]                               # (Tq, E)
    in_dtype = q.dtype

    if dbias_scr is not None:
        @pl.when(b == 0)
        def _init():
            dbias_scr[:] = jnp.zeros_like(dbias_scr)

    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s = _scores(q, k, h, D, scale, bias_ref, mask_ref, causal)
        p = jnp.exp(s - lse_ref[0, h])           # (Tq, Tk) fp32, rows sum 1
        pb = p.astype(in_dtype)
        doh = do[:, sl]                          # (Tq, D)
        # dv = p^T @ do
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        # dp = do @ v^T ; softmax bwd: ds = p * (dp - rowsum(dp * p))
        dp = jax.lax.dot_general(
            doh, v[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dd = jnp.sum(dp * p, axis=1, keepdims=True)
        ds = p * (dp - dd)                       # (Tq, Tk) fp32, pre-scale
        if dbias_scr is not None:
            dbias_scr[h] += ds
        dsb = (ds * scale).astype(in_dtype) if scale != 1.0 else ds.astype(in_dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            dsb, k[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            dsb, q[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)

    if dbias_ref is not None:
        @pl.when(b == n_b - 1)
        def _flush():
            dbias_ref[...] = dbias_scr[...].astype(dbias_ref.dtype)


def _bwd_kernel_t(*refs, has_bias, has_mask, scale, H, D, n_b):
    """Transpose-free backward: all score-space math runs in the TRANSPOSED
    (Tk, Tq) orientation, chosen so every MXU contraction is canonical
    ((M,K) x (K,N)) — the row-major backward needs p^T (for dv) and ds^T
    (for dk), which Mosaic materializes as two full (Tq, Tk) transposes per
    head (24 per program at H=12; they measured ~4x the forward's cost).
    Here the only big transposes are ONE (E, Tq) flip of the accumulated
    dq^T per program and H dbias flips per kernel; the bias arrives
    pre-transposed (biasT, (H, Tk, Tq)) from the vjp wrapper."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    do_ref = refs[i]; i += 1
    lse_ref = refs[i]; i += 1
    biasT_ref = refs[i] if has_bias else None
    i += has_bias
    mask_ref = refs[i][0] if has_mask else None
    i += has_mask
    dq_ref, dk_ref, dv_ref = refs[i], refs[i + 1], refs[i + 2]
    i += 3
    dbiasT_ref = refs[i] if has_bias else None
    i += has_bias
    dqt_scr = refs[i]; i += 1
    dbias_scr = refs[i] if has_bias else None

    b = pl.program_id(0)
    q = q_ref[0]                                 # (Tq, E)
    k = k_ref[0]                                 # (Tk, E)
    v = v_ref[0]
    do = do_ref[0]                               # (Tq, E)
    in_dtype = q.dtype
    maskT = jnp.transpose(mask_ref) if mask_ref is not None else None  # (Tk, 1)

    if dbias_scr is not None:
        @pl.when(b == 0)
        def _init():
            dbias_scr[:] = jnp.zeros_like(dbias_scr)

    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        st = jax.lax.dot_general(                # (Tk, Tq) fp32
            kh, qh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if scale != 1.0:
            st = st * scale
        if biasT_ref is not None:
            st = st + biasT_ref[h].astype(jnp.float32)
        if maskT is not None:
            st = jnp.where(maskT != 0, st, MASK_VALUE)
        pt = jnp.exp(st - jnp.transpose(lse_ref[0, h]))   # rows sum over Tk
        ptb = pt.astype(in_dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(  # (Tk, D), canonical
            ptb, doh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        dpt = jax.lax.dot_general(               # (Tk, Tq)
            vh, doh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ddt = jnp.sum(dpt * pt, axis=0, keepdims=True)    # (1, Tq)
        dst = pt * (dpt - ddt)                   # (Tk, Tq) fp32, pre-scale
        if dbias_scr is not None:
            dbias_scr[h] += dst
        dstb = (dst * scale).astype(in_dtype) if scale != 1.0 else dst.astype(in_dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(  # (Tk, D), canonical
            dstb, qh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        dqt = jax.lax.dot_general(               # (D, Tq); small lhs flip
            kh, dstb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqt_scr[sl, :] = dqt.astype(in_dtype)
    dq_ref[0] = jnp.transpose(dqt_scr[...]).astype(dq_ref.dtype)

    if dbiasT_ref is not None:
        @pl.when(b == n_b - 1)
        def _flush():
            dbiasT_ref[...] = dbias_scr[...].astype(dbiasT_ref.dtype)


def _backward_t(q, k, v, biasT, mask, lse, do, scale, H):
    B, Tq, E = q.shape
    Tk = k.shape[1]
    D = E // H
    spec = lambda T: pl.BlockSpec((1, T, E), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [spec(Tq), spec(Tk), spec(Tk), spec(Tq),
                pl.BlockSpec((1, H, Tq, 1), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [q, k, v, do, lse]
    if biasT is not None:                        # (H, Tk, Tq)
        in_specs.append(pl.BlockSpec((H, Tk, Tq), lambda b: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(biasT)
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, Tk), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    out_specs = [spec(Tq), spec(Tk), spec(Tk)]
    out_shape = [
        jax.ShapeDtypeStruct((B, Tq, E), q.dtype),
        jax.ShapeDtypeStruct((B, Tk, E), k.dtype),
        jax.ShapeDtypeStruct((B, Tk, E), v.dtype),
    ]
    scratch = [pltpu.VMEM((E, Tq), q.dtype)]     # dq^T accumulator
    if biasT is not None:
        out_specs.append(pl.BlockSpec((H, Tk, Tq), lambda b: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((H, Tk, Tq), jnp.float32))
        scratch.append(pltpu.VMEM((H, Tk, Tq), jnp.float32))
    kernel = functools.partial(
        _bwd_kernel_t, has_bias=biasT is not None, has_mask=mask is not None,
        scale=scale, H=H, D=D, n_b=B,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * Tq * Tk * E,
            bytes_accessed=4 * B * (Tq + 2 * Tk) * E,
            transcendentals=B * H * Tq * Tk,
        ),
    )(*args)
    if biasT is not None:
        dq, dk, dv, dbiasT = outs
        dbias = jnp.swapaxes(dbiasT, 1, 2)
    else:
        dq, dk, dv = outs
        dbias = None
    return dq, dk, dv, dbias


def _backward(q, k, v, bias, mask, lse, do, scale, causal, H):
    B, Tq, E = q.shape
    Tk = k.shape[1]
    D = E // H
    spec = lambda T: pl.BlockSpec((1, T, E), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [spec(Tq), spec(Tk), spec(Tk), spec(Tq),
                pl.BlockSpec((1, H, Tq, 1), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [q, k, v, do, lse]
    if bias is not None:
        in_specs.append(pl.BlockSpec((H, Tq, Tk), lambda b: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, Tk), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    out_specs = [spec(Tq), spec(Tk), spec(Tk)]
    out_shape = [
        jax.ShapeDtypeStruct((B, Tq, E), q.dtype),
        jax.ShapeDtypeStruct((B, Tk, E), k.dtype),
        jax.ShapeDtypeStruct((B, Tk, E), v.dtype),
    ]
    scratch = []
    if bias is not None:
        # batch-accumulated shared-bias gradient: the (B,) grid runs b
        # sequentially, the dbias output block has a constant index map, and
        # a VMEM scratch carries the running sum — (H, Tq, Tk) HBM, never
        # the B-times larger per-batch intermediate (same pattern as the
        # flash dbias kernel, ops/pallas_attention.py:379-431)
        out_specs.append(pl.BlockSpec((H, Tq, Tk), lambda b: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((H, Tq, Tk), jnp.float32))
        scratch.append(pltpu.VMEM((H, Tq, Tk), jnp.float32))
    kernel = functools.partial(
        _bwd_kernel, has_bias=bias is not None, has_mask=mask is not None,
        scale=scale, causal=causal, H=H, D=D, n_b=B,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * Tq * Tk * E,
            bytes_accessed=4 * B * (Tq + 2 * Tk) * E,
            transcendentals=B * H * Tq * Tk,
        ),
    )(*args)
    if bias is not None:
        dq, dk, dv, dbias = outs
    else:
        dq, dk, dv = outs
        dbias = None
    return dq, dk, dv, dbias


# ------------------------------------------- G-blocked kernels (grid B//G)
# The per-sample grid above dispatches H tiny (T,T) VPU/MXU ops per program
# x B programs — an r4 xplane profile measured the resulting kernels at only
# ~20% of HBM peak (the work per dispatch is too small to cover Mosaic's
# per-op overhead at T<=256). These variants process G samples per grid
# step: every dot_general gains a G-sized batch dimension and every softmax
# /mask/bias pass runs on (G, Tq, Tk) at G-times the vector utilization.
def _pick_g(B, Tq, Tk, E, H, backward):
    """Largest divisor of B the kernel compiles AND profits at.

    Backward: conservative byte model under ~10 MB (G=2 at T≈200 already
    fails Mosaic scoped-VMEM compile — measured r4; G stays 1 there).

    Forward: calibrated against an r4 on-chip compile/speed sweep at the
    production shapes — a pure byte model could NOT separate the compile
    failures from the passes ((128,64) G=16 fails at a SMALLER estimated
    working set than (48,212) G=4, which passes). What does separate all
    8 sweep points is the block row count: g*max(Tq,Tk) <= 848 compiled
    everywhere (784/848/512/480) and >= 960 failed everywhere
    (1568/1696/1024/960), with a ~10 MB single-buffered byte cap as a
    second guard. Speed at the passing picks: 0.258 -> 0.214 ms (64,196),
    0.205 -> 0.178 (48,212) vs the old G=2."""
    if backward:
        n_q, n_k, n_scores = 3, 4, 3
        for g in range(min(B, 64), 0, -1):
            if B % g:
                continue
            io = 2 * g * (n_q * Tq + n_k * Tk) * E * 2   # 2x double-buffer
            sc = g * Tq * Tk * 4 * n_scores + g * E * Tq * 2
            if io + sc + H * Tq * Tk * 6 < 10 * 1024 * 1024:
                return g
        return 1
    for g in range(min(B, 64), 0, -1):
        if B % g or g * max(Tq, Tk) > 848:
            continue
        io = g * (2 * Tq + 2 * Tk) * E * 2               # single-buffered
        sc = 2 * g * Tq * Tk * 4
        if io + sc + H * Tq * Tk * 2 <= 10 * 1024 * 1024:
            return g
    return 1


def _fwd_kernel_g(*refs, has_bias, has_mask, scale, H, D, out_dtype):
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    bias_ref = refs[i] if has_bias else None
    i += has_bias
    mask_ref = refs[i] if has_mask else None
    i += has_mask
    o_ref, lse_ref = refs[i], refs[i + 1]

    q = q_ref[...]                               # (G, Tq, E)
    k = k_ref[...]                               # (G, Tk, E)
    v = v_ref[...]
    keep = (mask_ref[...] != 0) if mask_ref is not None else None   # (G,1,Tk)
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        s = jax.lax.dot_general(                 # (G, Tq, Tk) fp32
            q[:, :, sl], k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if scale != 1.0:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[h].astype(jnp.float32)[None]
        if keep is not None:
            s = jnp.where(keep, s, MASK_VALUE)
        m = jnp.max(s, axis=2, keepdims=True)    # (G, Tq, 1)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=2, keepdims=True)
        acc = jax.lax.dot_general(               # (G, Tq, D) fp32
            p.astype(v.dtype), v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = (acc / l).astype(out_dtype)
        lse_ref[:, h] = m + jnp.log(l)           # (G, Tq, 1)


def _bwd_kernel_tg(*refs, has_bias, has_mask, scale, H, D, n_b):
    """G-blocked transpose-free backward: the _bwd_kernel_t score math with
    a G-sample batch dimension on every contraction and VPU pass."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    do_ref = refs[i]; i += 1
    lse_ref = refs[i]; i += 1
    biasT_ref = refs[i] if has_bias else None
    i += has_bias
    mask_ref = refs[i] if has_mask else None
    i += has_mask
    dq_ref, dk_ref, dv_ref = refs[i], refs[i + 1], refs[i + 2]
    i += 3
    dbiasT_ref = refs[i] if has_bias else None
    i += has_bias
    dqt_scr = refs[i]; i += 1
    dbias_scr = refs[i] if has_bias else None

    b = pl.program_id(0)
    q = q_ref[...]                               # (G, Tq, E)
    k = k_ref[...]                               # (G, Tk, E)
    v = v_ref[...]
    do = do_ref[...]
    in_dtype = q.dtype
    G = q.shape[0]
    Tk = k.shape[1]
    # (G,1,Tk) -> (G,Tk,1): pure size-1 axis move, same element order
    # (via i32 — Mosaic only lowers non-no-op minor-dim insertion at 32 bit)
    maskT = (mask_ref[...].astype(jnp.int32).reshape(G, Tk, 1) != 0) \
        if mask_ref is not None else None

    if dbias_scr is not None:
        @pl.when(b == 0)
        def _init():
            dbias_scr[:] = jnp.zeros_like(dbias_scr)

    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        qh, kh, vh, doh = q[:, :, sl], k[:, :, sl], v[:, :, sl], do[:, :, sl]
        st = jax.lax.dot_general(                # (G, Tk, Tq) fp32
            kh, qh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if scale != 1.0:
            st = st * scale
        if biasT_ref is not None:
            st = st + biasT_ref[h].astype(jnp.float32)[None]
        if maskT is not None:
            st = jnp.where(maskT, st, MASK_VALUE)
        # lse (G,Tq,1) -> (G,1,Tq): size-1 axis move, same element order
        lseT = lse_ref[:, h].reshape(G, 1, st.shape[2])
        pt = jnp.exp(st - lseT)                  # cols sum to 1 over Tk
        ptb = pt.astype(in_dtype)
        dv_ref[:, :, sl] = jax.lax.dot_general(  # (G, Tk, D), canonical
            ptb, doh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dpt = jax.lax.dot_general(               # (G, Tk, Tq)
            vh, doh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        ddt = jnp.sum(dpt * pt, axis=1, keepdims=True)    # (G, 1, Tq)
        dst = pt * (dpt - ddt)                   # (G, Tk, Tq) fp32, pre-scale
        if dbias_scr is not None:
            dbias_scr[h] += jnp.sum(dst, axis=0)
        dstb = (dst * scale).astype(in_dtype) if scale != 1.0 else dst.astype(in_dtype)
        dk_ref[:, :, sl] = jax.lax.dot_general(  # (G, Tk, D), canonical
            dstb, qh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        dqt = jax.lax.dot_general(               # (G, D, Tq)
            kh, dstb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dqt_scr[:, sl, :] = dqt.astype(in_dtype)
    dq_ref[...] = jnp.swapaxes(dqt_scr[...], 1, 2).astype(dq_ref.dtype)

    if dbiasT_ref is not None:
        @pl.when(b == n_b - 1)
        def _flush():
            dbiasT_ref[...] = dbias_scr[...].astype(dbiasT_ref.dtype)


def _fwd_call_g(q, k, v, bias, mask, scale, H, G):
    B, Tq, E = q.shape
    Tk = k.shape[1]
    nB = B // G
    spec = lambda T: pl.BlockSpec((G, T, E), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [spec(Tq), spec(Tk), spec(Tk)]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((H, Tq, Tk), lambda b: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    if mask is not None:
        in_specs.append(pl.BlockSpec((G, 1, Tk), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    kernel = functools.partial(
        _fwd_kernel_g, has_bias=bias is not None, has_mask=mask is not None,
        scale=scale, H=H, D=E // H, out_dtype=q.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(nB,),
        in_specs=in_specs,
        out_specs=[
            spec(Tq),
            pl.BlockSpec((G, H, Tq, 1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tq, E), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Tq * Tk * E,
            bytes_accessed=2 * B * (Tq + 2 * Tk) * E,
            transcendentals=B * H * Tq * Tk,
        ),
    )(*args)


def _backward_tg(q, k, v, biasT, mask, lse, do, scale, H, G):
    B, Tq, E = q.shape
    Tk = k.shape[1]
    D = E // H
    nB = B // G
    spec = lambda T: pl.BlockSpec((G, T, E), lambda b: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
    in_specs = [spec(Tq), spec(Tk), spec(Tk), spec(Tq),
                pl.BlockSpec((G, H, Tq, 1), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [q, k, v, do, lse]
    if biasT is not None:                        # (H, Tk, Tq)
        in_specs.append(pl.BlockSpec((H, Tk, Tq), lambda b: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(biasT)
    if mask is not None:
        in_specs.append(pl.BlockSpec((G, 1, Tk), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    out_specs = [spec(Tq), spec(Tk), spec(Tk)]
    out_shape = [
        jax.ShapeDtypeStruct((B, Tq, E), q.dtype),
        jax.ShapeDtypeStruct((B, Tk, E), k.dtype),
        jax.ShapeDtypeStruct((B, Tk, E), v.dtype),
    ]
    scratch = [pltpu.VMEM((G, E, Tq), q.dtype)]  # dq^T accumulator
    if biasT is not None:
        out_specs.append(pl.BlockSpec((H, Tk, Tq), lambda b: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((H, Tk, Tq), jnp.float32))
        scratch.append(pltpu.VMEM((H, Tk, Tq), jnp.float32))
    kernel = functools.partial(
        _bwd_kernel_tg, has_bias=biasT is not None, has_mask=mask is not None,
        scale=scale, H=H, D=D, n_b=nB,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(nB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * Tq * Tk * E,
            bytes_accessed=4 * B * (Tq + 2 * Tk) * E,
            transcendentals=B * H * Tq * Tk,
        ),
    )(*args)
    if biasT is not None:
        dq, dk, dv, dbiasT = outs
        dbias = jnp.swapaxes(dbiasT, 1, 2)
    else:
        dq, dk, dv = outs
        dbias = None
    return dq, dk, dv, dbias


# -------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _dense_attention(q, k, v, bias, mask, scale, causal, H):
    out, _ = _fwd_call(q, k, v, bias, mask, scale, causal, H)
    return out


def _use_g_grid(causal: bool, B: int) -> int:
    """G>1 selects the G-blocked kernels (measured ~1.9x the per-sample grid
    on the r4 mixed-bench shapes; see module docstring). OFASYS_DENSE_GRID=b
    forces the original per-sample grid for A/B."""
    if causal or os.environ.get("OFASYS_DENSE_GRID") == "b":
        return 1
    return B


def _fwd_call(q, k, v, bias, mask, scale, causal, H):
    B, Tq, E = q.shape
    Tk = k.shape[1]
    if _use_g_grid(causal, B) > 1:
        G = _pick_g(B, Tq, Tk, E, H, backward=False)
        if G > 1:
            return _fwd_call_g(q, k, v, bias, mask, scale, H, G)
    in_specs = [
        pl.BlockSpec((1, Tq, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tk, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((H, Tq, Tk), lambda b: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bias)
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, Tk), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
    kernel = functools.partial(
        _fwd_kernel, has_bias=bias is not None, has_mask=mask is not None,
        scale=scale, causal=causal, H=H, D=E // H, out_dtype=q.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, Tq, E), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Tq, 1), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Tq, E), q.dtype),
            jax.ShapeDtypeStruct((B, H, Tq, 1), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * Tq * Tk * E,
            bytes_accessed=2 * B * (Tq + 2 * Tk) * E,
            transcendentals=B * H * Tq * Tk,
        ),
    )(*args)


def _vjp_fwd(q, k, v, bias, mask, scale, causal, H):
    out, lse = _fwd_call(q, k, v, bias, mask, scale, causal, H)
    return out, (q, k, v, bias, mask, lse)


def _vjp_bwd(scale, causal, H, residuals, g):
    q, k, v, bias, mask, lse = residuals
    if os.environ.get("OFASYS_DENSE_XLA_BWD") == "1":
        # debugging fallback: gradients through an XLA reference with
        # identical softmax semantics
        def f(q, k, v, bias):
            return _xla_reference(q, k, v, bias, mask, scale, causal, H)

        _, vjp = jax.vjp(f, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
    elif causal or os.environ.get("OFASYS_DENSE_BWD") == "rowmajor":
        # row-major variant kept for A/B (OFASYS_DENSE_BWD=rowmajor) and for
        # direct calls that pass causal=True (the public wrapper folds the
        # causal mask into the bias, so the hot path never lands here)
        dq, dk, dv, dbias = _backward(q, k, v, bias, mask, lse, g, scale,
                                      causal, H)
    else:
        biasT = jnp.swapaxes(bias, 1, 2) if bias is not None else None
        B, Tq, E = q.shape
        G = 1
        if _use_g_grid(False, B) > 1:
            G = _pick_g(B, Tq, k.shape[1], E, H, backward=True)
        if G > 1:
            dq, dk, dv, dbias = _backward_tg(q, k, v, biasT, mask, lse, g,
                                             scale, H, G)
        else:
            dq, dk, dv, dbias = _backward_t(q, k, v, biasT, mask, lse, g,
                                            scale, H)
    if bias is not None and dbias is not None:
        dbias = dbias.astype(bias.dtype)
    return dq, dk, dv, dbias, None


_dense_attention.defvjp(_vjp_fwd, _vjp_bwd)


def _xla_reference(q, k, v, bias, mask, scale, causal, H):
    B, Tq, E = q.shape
    Tk = k.shape[1]
    D = E // H
    qh = q.reshape(B, Tq, H, D)
    kh = k.reshape(B, Tk, H, D)
    vh = v.reshape(B, Tk, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh.astype(jnp.float32),
                   kh.astype(jnp.float32)) * scale
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask[:, None] != 0, s, MASK_VALUE)
    if causal:
        i = jnp.arange(Tq)[:, None]
        j = jnp.arange(Tk)[None, :]
        s = jnp.where(j <= i + (Tk - Tq), s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), vh)
    return o.reshape(B, Tq, E).astype(q.dtype)


# ------------------------------------------------------------- public entry
def dense_attention(
    q: jax.Array,                       # (B, Tq, H, D)
    k: jax.Array,                       # (B, Tk, H, D)
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,   # (1, H, Tq, Tk) additive, batch-shared
    mask: Optional[jax.Array] = None,   # bool/int8 (B, 1, 1, Tk) keep-mask
    scale: float = 1.0,
    causal: bool = False,
) -> jax.Array:
    """Fused short-sequence attention; drop-in for
    ops.attention.dot_product_attention on the no-dropout training path.

    The (B, T, H, D) <-> (B, T, H*D) reshapes below are free (minor-dim
    merge/split of a contiguous axis) — the kernel's IO really is the
    projection GEMMs' output buffer.

    VPU-pass economics (the per-score-element work dominates at short T —
    an xplane profile showed the T=64 task's kernels cost as much as the
    T=196 ones, all overhead): the q-scaling and the causal mask are folded
    OUTSIDE the kernel, where they cost O(T*E) fused into the projection
    epilogue / O(1) fused into the bias materialization, instead of O(T^2)
    VPU passes per head inside. Backward stays exact: the kernel sees a
    pre-scaled q (its dk = ds^T (q*scale) is the true gradient; the outer
    multiply's autodiff rescales dq), and the causal -1e9 rides the bias."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    if causal:
        i = jnp.arange(Tq)[:, None]
        j = jnp.arange(Tk)[None, :]
        cm = j <= i + (Tk - Tq)                     # (Tq, Tk) static
        if bias is None:
            bias = jnp.where(cm, 0.0, MASK_VALUE)[None, None]
        else:
            bias = jnp.where(cm[None, None], bias, MASK_VALUE)
    bf = None
    if bias is not None:
        if bias.ndim == 4:
            if bias.shape[0] != 1:
                raise ValueError("dense_attention bias must be batch-shared (1,H,Tq,Tk)")
            bias = bias[0]
        # bf16 bias halves its VMEM residency + one HBM read; matches the
        # attn_logits='compute' storage policy
        bf = jnp.broadcast_to(bias, (H, Tq, Tk)).astype(jnp.bfloat16)
    mf = None
    if mask is not None:
        m = mask.astype(jnp.int8)
        m = jnp.broadcast_to(m, (B, 1, 1, Tk))
        mf = m.reshape(B, 1, Tk)
    out = _dense_attention(
        q.reshape(B, Tq, H * D), k.reshape(B, Tk, H * D), v.reshape(B, Tk, H * D),
        bf, mf, 1.0, False, H,
    )
    return out.reshape(B, Tq, H, D)


def dense_supported(B: int, Tq: int, Tk: int, D: int, H: int,
                    dropout_rate: float) -> bool:
    """Gate: shapes where the whole-T kernel applies and is expected to beat
    XLA. T is capped at MAX_T=256: above it flash attention takes over
    (flash_supported), and the backward's (H, Tq, Tk) fp32 dbias scratch
    stays small (12 heads x 256^2 x 4B ~ 3 MB). The VMEM working set per
    program is q/k/v/o rows (T x E bf16) plus a few fp32 (Tq, Tk) score
    temps — ~4 MB at the cap."""
    if dropout_rate > 0.0:
        return False
    if Tq > MAX_T or Tk > MAX_T or D > 256 or H * D > 4096:
        return False
    # A/B knob: route score matrices below a Tq*Tk floor to XLA
    # (microbenched: XLA wins some small-score shapes in isolation, but the
    # r4 end-to-end A/B measured the kernel better everywhere — see below)
    if Tq * Tk < int(os.environ.get("OFASYS_DENSE_MIN_SCORE", "0")):
        return False
    # tiny dispatches (B=1 encoder inside a decode program) stay on XLA
    return B * Tq >= 256
