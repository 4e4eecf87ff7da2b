"""Pallas TPU flash attention (forward) with additive bias + padding mask.

Replaces the reference's fused CUDA scaled-masked-softmax kernels
(ofasys/module/fused_kernels/*.cu) with the stronger primitive: blocked
online-softmax attention that never materializes the (Tq, Tk) probability
matrix in HBM.

Kernel layout (one grid step = one (batch*head, q-block, k-block) tile):
  grid = (B*H, Tq/Bq, Tk/Bk); k is the innermost (sequential) dimension so
  VMEM scratch (running max m, normalizer l, accumulator acc) carries across
  k-blocks of the same q-block — the standard TPU flash pattern.

Backward: custom_vjp recomputes attention with XLA einsums (fp32 softmax).
O(T^2) transient in backward only; forward memory is O(T * D).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -1e9


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref,   # inputs (some may be None)
    o_ref,                                     # output (1, Bq, D)
    m_scr, l_scr, acc_scr,                     # VMEM scratch
    *, scale: float, causal: bool, Bq: int, Bk: int, n_k: int, Tk: int,
):
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = pl.program_id(1) * Bq
    k_start = kb * Bk

    def _compute():
        # keep inputs in their storage dtype (bf16): the MXU runs bf16 x bf16
        # with fp32 accumulation at full rate; upcasting first would drop to
        # the fp32 path (~8x slower)
        q = q_ref[0]                                 # (Bq, D)
        k = k_ref[0]                                 # (Bk, D)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                    # (Bq, Bk) fp32
        if bias_ref is not None:
            s = s + bias_ref[0].astype(jnp.float32)
        if mask_ref is not None:
            keep = mask_ref[0] != 0                  # (1, Bk) -> broadcast
            s = jnp.where(keep, s, MASK_VALUE)
        if causal:
            rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 0)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 1)
            s = jnp.where(cols <= rows, s, MASK_VALUE)
        if n_k * Bk != Tk:
            # partial final k-block: pallas pads out-of-bounds reads with
            # garbage — mask key columns past Tk (applied last so padded
            # bias/mask garbage is overridden too)
            cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 1)
            s = jnp.where(cols < Tk, s, MASK_VALUE)

        m_prev = m_scr[:]                            # (Bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                       # (Bq, Bk)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        v = v_ref[0]                                 # (Bk, D) storage dtype
        if n_k * Bk != Tk:
            # padded v rows may be NaN/garbage; p is 0 there but 0*NaN=NaN
            vrows = k_start + jax.lax.broadcasted_iota(jnp.int32, (Bk, 1), 0)
            v = jnp.where(vrows < Tk, v, 0)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:] = m_new

    if causal:
        # skip tiles strictly above the diagonal
        pl.when(k_start <= q_start + Bq - 1)(_compute)
    else:
        _compute()

    @pl.when(kb == n_k - 1)
    def _epilogue():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def _flash_forward(
    q: jax.Array,                 # (BH, Tq, D)
    k: jax.Array,                 # (BH, Tk, D)
    v: jax.Array,
    bias: Optional[jax.Array],    # (BH or H, Tq, Tk) or None
    mask: Optional[jax.Array],    # (BH, 1, Tk) int8 keep-mask or None
    scale: float,
    causal: bool,
    block_q: int = 512,
    block_k: int = 512,
) -> jax.Array:
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    Bq = min(block_q, Tq)
    Bk = min(block_k, Tk)
    n_q = pl.cdiv(Tq, Bq)
    n_k = pl.cdiv(Tk, Bk)

    in_specs = [
        pl.BlockSpec((1, Bq, D), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bk, D), lambda bh, qb, kb: (bh, kb, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bk, D), lambda bh, qb, kb: (bh, kb, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        nb = bias.shape[0]
        if nb == BH:
            bias_map = lambda bh, qb, kb: (bh, qb, kb)
        else:  # per-head bias shared across batch: (H, Tq, Tk)
            H = nb
            bias_map = lambda bh, qb, kb: (bh % H, qb, kb)
        in_specs.append(pl.BlockSpec((1, Bq, Bk), bias_map, memory_space=pltpu.VMEM))
        args.append(bias)
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, 1, Bk), lambda bh, qb, kb: (bh, 0, kb), memory_space=pltpu.VMEM))
        args.append(mask)

    kernel = functools.partial(
        _flash_kernel_dispatch,
        has_bias=bias is not None,
        has_mask=mask is not None,
        scale=scale, causal=causal, Bq=Bq, Bk=Bk, n_k=n_k, Tk=Tk,
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    return pl.pallas_call(
        kernel,
        grid=(BH, n_q, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Bq, D), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tq, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bq, 1), jnp.float32),
            pltpu.VMEM((Bq, 1), jnp.float32),
            pltpu.VMEM((Bq, D), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tq * Tk * D,
            bytes_accessed=2 * BH * (Tq + 2 * Tk) * D,
            transcendentals=BH * Tq * Tk,
        ),
    )(*args)


def _flash_kernel_dispatch(*refs, has_bias, has_mask, **kw):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    mask_ref = next(it) if has_mask else None
    o_ref = next(it)
    m_scr, l_scr, acc_scr = next(it), next(it), next(it)
    _flash_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr, **kw)


def _xla_reference(q, k, v, bias, mask, scale, causal):
    """fp32 reference used by the backward pass (and CPU fallback)."""
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if bias is not None:
        b = bias if bias.shape[0] == q.shape[0] else jnp.tile(bias, (q.shape[0] // bias.shape[0], 1, 1))
        s = s + b.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask != 0, s, MASK_VALUE)
    if causal:
        Tq, Tk = s.shape[-2:]
        i = jnp.arange(Tq)[:, None]
        j = jnp.arange(Tk)[None, :]
        s = jnp.where(j <= i + (Tk - Tq), s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_flat(q, k, v, bias, mask, scale, causal):
    return _flash_forward(q, k, v, bias, mask, scale, causal)


def _fwd(q, k, v, bias, mask, scale, causal):
    out = _flash_forward(q, k, v, bias, mask, scale, causal)
    return out, (q, k, v, bias, mask)


def _bwd(scale, causal, residuals, g):
    q, k, v, bias, mask = residuals
    # re-derive gradients through the XLA reference (numerically identical
    # softmax semantics); O(T^2) transient lives only in backward
    def f(q, k, v, bias):
        return _xla_reference(q, k, v, bias, mask, scale, causal)

    _, vjp = jax.vjp(f, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    if bias is None:
        dbias = None
    return dq, dk, dv, dbias, None


flash_attention_flat.defvjp(_fwd, _bwd)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_attention(
    q: jax.Array,                  # (B, Tq, H, D)
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,   # (1|B, H, Tq, Tk)
    mask: Optional[jax.Array] = None,   # bool (B, 1, 1, Tk) keep
    scale: float = 1.0,
    causal: bool = False,
) -> jax.Array:
    """Drop-in for ops.attention.dot_product_attention (no-dropout path).

    Short/ragged sequences (the multi-task encoder mix runs T=196/120/64)
    are tile-aligned here by zero-padding: queries to the sublane tile,
    keys to the lane tile with the padding masked out, and the output
    sliced back — the kernel itself only ever sees aligned blocks."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    Tq_p = _round_up(Tq, 16)
    Tk_p = _round_up(Tk, 128)
    if causal:
        if Tq != Tk:
            raise ValueError("flash_attention causal requires Tq == Tk")
        # keep the causal diagonal offset at zero after padding: the kernel
        # masks with start-aligned `col <= row` while the vjp's XLA
        # reference uses the end-aligned `j <= i + (Tk - Tq)` — equal only
        # when the padded lengths match
        Tq_p = Tk_p = max(Tq_p, Tk_p)
    if Tq_p != Tq or Tk_p != Tk:
        if mask is None:
            mask = jnp.ones((B, 1, 1, Tk), bool)
        qp = [(0, 0), (0, Tq_p - Tq), (0, 0), (0, 0)]
        kp = [(0, 0), (0, Tk_p - Tk), (0, 0), (0, 0)]
        q = jnp.pad(q, qp)
        k = jnp.pad(k, kp)
        v = jnp.pad(v, kp)
        mask = jnp.pad(mask, [(0, 0), (0, 0), (0, 0), (0, Tk_p - Tk)])
        if bias is not None:
            bias = jnp.pad(
                bias, [(0, 0), (0, 0), (0, Tq_p - Tq), (0, Tk_p - Tk)]
            )
        out = flash_attention(q, k, v, bias=bias, mask=mask, scale=scale,
                              causal=causal)
        return out[:, :Tq]
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Tq, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Tk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Tk, D)
    bf = None
    if bias is not None:
        bias = bias.astype(jnp.bfloat16)           # halve HBM reads
        if bias.shape[0] == 1:
            bf = bias[0]                           # (H, Tq, Tk) shared
        else:
            bf = bias.reshape(B * H, Tq, Tk)
    mf = None
    if mask is not None:
        m = mask.astype(jnp.int8)
        m = jnp.broadcast_to(m, (B, 1, 1, Tk)).reshape(B, 1, Tk)
        mf = jnp.repeat(m, H, axis=0)              # (BH, 1, Tk)
    out = flash_attention_flat(qf, kf, vf, bf, mf, scale, causal)
    return out.reshape(B, H, Tq, D).transpose(0, 2, 1, 3)


def flash_supported(Tq: int, Tk: int, D: int, dropout_rate: float) -> bool:
    """Shapes where the kernel beats (or matches) XLA; otherwise the XLA
    path runs.

    Ragged lengths are tile-aligned by the flash_attention pad/slice
    wrapper, so alignment is no longer a gate — only dropout (not fused),
    head dims past the lane budget, and the measured length crossover.
    v5e, bf16, bias+mask, readback-timed: forward-only flash wins 1.26x at
    T=196 / 1.70x at T=1024, but fwd+bwd is neutral-to-slower below
    T~256 (the custom_vjp backward recomputes through XLA, so training
    gains only the forward's HBM savings: T196 B64 measured 0.77x). The
    T>=256 floor keeps short-sequence training on XLA while long — now
    including ragged — sequences get the kernel."""
    if dropout_rate > 0.0:
        return False
    if D > 256:
        return False
    return Tq >= 16 and Tk >= 256
