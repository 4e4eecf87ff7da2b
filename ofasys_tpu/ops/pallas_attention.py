"""Pallas TPU flash attention (forward) with additive bias + padding mask.

Replaces the reference's fused CUDA scaled-masked-softmax kernels
(ofasys/module/fused_kernels/*.cu) with the stronger primitive: blocked
online-softmax attention that never materializes the (Tq, Tk) probability
matrix in HBM.

Kernel layout (one grid step = one (batch*head, q-block, k-block) tile):
  grid = (B*H, Tq/Bq, Tk/Bk); k is the innermost (sequential) dimension so
  VMEM scratch (running max m, normalizer l, accumulator acc) carries across
  k-blocks of the same q-block — the standard TPU flash pattern.

Backward: FlashAttention-2 style Pallas kernels (dQ grid + dKV grid) that
recompute P = exp(S - lse) from the forward's logsumexp residual — the
O(T^2) probability matrix never round-trips HBM in either direction. When
the additive bias needs a gradient, the only T^2 HBM output is that
gradient itself: per-(b,h) dS blocks fused into the dQ kernel for a
per-(b,h) bias, or a dedicated batch-accumulating kernel (grid
(H, n_q, n_k, B), b innermost, VMEM accumulation) that writes the
(H, Tq, Tk) sum directly for the shared rel-pos bias — never the
B-times-larger per-batch intermediate. Set OFASYS_FLASH_XLA_BWD=1 to fall
back to the XLA-recompute backward for debugging.

flash_attention_with_lse additionally returns the logsumexp and accepts
its cotangent (ring attention's differentiable online merge).
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


def _exp_bk(x):
    """exp over a (Bq, Bk) score block. The flash kernels at D=64 are
    VPU-bound (the exp over T^2 scores outweighs the two D=64 MXU dots per
    tile), so OFASYS_FLASH_EXP=bf16 computes the block exp at bf16 (2x VPU
    lanes; probabilities in [0,1] keep ~3 significant digits — the same
    budget as attn_logits='compute' bf16 score storage). Default f32."""
    mode = os.environ.get("OFASYS_FLASH_EXP")
    if mode == "bf16":
        return jnp.exp(x.astype(jnp.bfloat16)).astype(jnp.float32)
    if mode == "exp2":
        # exp(x) == exp2(x * log2(e)) to ~1 ulp; wins if the VPU's exp2 path
        # is cheaper than exp's polynomial
        return jnp.exp2(x * 1.4426950408889634)
    return jnp.exp(x)


def _flash_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref,   # inputs (some may be None)
    o_ref,                                     # output (1, Bq, D)
    lse_ref,                                   # output (1, Bq, 1) f32 or None
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

    def _compute(mask_causal: bool = True):
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
        if causal and mask_causal:
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
        p = _exp_bk(s - m_new)                       # (Bq, Bk)
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
        # skip tiles strictly above the diagonal; INTERIOR tiles (fully
        # below it) run a specialization without the causal iota/compare/
        # select — the kernel is VPU-bound, so thinning elementwise passes
        # on the ~half of computed tiles that never see the diagonal counts
        on_diag = (k_start <= q_start + Bq - 1) & (k_start + Bk - 1 > q_start)
        interior = k_start + Bk - 1 <= q_start
        pl.when(on_diag)(lambda: _compute(True))
        pl.when(interior)(lambda: _compute(False))
    else:
        _compute(False)

    @pl.when(kb == n_k - 1)
    def _epilogue():
        l = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        if lse_ref is not None:
            # logsumexp residual for the pallas backward (m is finite after
            # the always-computed kb=0 block, even for fully-masked rows)
            lse_ref[0] = m_scr[:] + jnp.log(l)


def _env_block(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


def default_blocks(Tq: int, Tk: int, backward: bool, has_bias: bool = False) -> tuple:
    """(block_q, block_k) policy, calibrated on-chip (round 5, v5e, D=64,
    RTT-corrected isolated microbenches at T=2048/4096): Bk is the big lever
    (k is the innermost grid dim — larger Bk means fewer online-softmax
    rescale passes and longer DMA pipelines): fwd (1024, 1024) measured
    1.76x the old (512, 512) at T=2048 full, 1.46x causal; the backward
    kernels prefer (512, 1024). Bias'd paths keep (512, 512): the dbias
    batch-accumulating kernel + (Bq, Bk) f32 dS blocks hit the 16 MB
    scoped-VMEM ceiling at larger blocks (the r4 compile-OOM family), and
    the bias'd short-seq shapes run the dense kernel anyway. Env overrides
    OFASYS_FLASH_BQ[_BWD]/OFASYS_FLASH_BK[_BWD] for A/B."""
    if has_bias:
        bq_d = bk_d = 512
    elif backward:
        bq_d, bk_d = 512, 1024
    else:
        bq_d, bk_d = 1024, 1024
    suffix = "_BWD" if backward else ""
    return (_env_block(f"OFASYS_FLASH_BQ{suffix}", bq_d),
            _env_block(f"OFASYS_FLASH_BK{suffix}", bk_d))


def _causal_kmap(kmap, Bq: int, Bk: int, n_k: int):
    """Clamp a k-indexed block map to the causal diagonal: tiles strictly
    above the diagonal are compute-skipped in the kernel (pl.when), and with
    the clamp their k/v/bias DMA is skipped too — the revisited block index
    is unchanged, so Mosaic issues no copy. Halves HBM traffic at long T.
    (The extra n_k-1 bound keeps ragged last q-blocks in range.)"""

    def m(bh, qb, kb):
        kb_eff = jnp.minimum(jnp.minimum(kb, (qb * Bq + Bq - 1) // Bk), n_k - 1)
        return kmap(bh, qb, kb_eff)

    return m


def _flash_forward(
    q: jax.Array,                 # (BH, Tq, D)
    k: jax.Array,                 # (BH, Tk, D)
    v: jax.Array,
    bias: Optional[jax.Array],    # (BH or H, Tq, Tk) or None
    mask: Optional[jax.Array],    # (BH, 1, Tk) int8 keep-mask or None
    scale: float,
    causal: bool,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    return_lse: bool = False,
) -> jax.Array:
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    if block_q is None or block_k is None:
        dq, dk = default_blocks(Tq, Tk, backward=False, has_bias=bias is not None)
        block_q = block_q or dq
        block_k = block_k or dk
    Bq = min(block_q, Tq)
    Bk = min(block_k, Tk)
    n_q = pl.cdiv(Tq, Bq)
    n_k = pl.cdiv(Tk, Bk)

    def kv_map(bh, qb, kb):
        return (bh, kb, 0)

    if causal:
        kv_map = _causal_kmap(kv_map, Bq, Bk, n_k)
    in_specs = [
        pl.BlockSpec((1, Bq, D), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bk, D), kv_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bk, D), kv_map, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        nb = bias.shape[0]
        if nb == BH:
            bias_map = lambda bh, qb, kb: (bh, qb, kb)
        else:  # per-head bias shared across batch: (H, Tq, Tk)
            H = nb
            bias_map = lambda bh, qb, kb: (bh % H, qb, kb)
        if causal:
            bias_map = _causal_kmap(bias_map, Bq, Bk, n_k)
        in_specs.append(pl.BlockSpec((1, Bq, Bk), bias_map, memory_space=pltpu.VMEM))
        args.append(bias)
    if mask is not None:
        mask_map = lambda bh, qb, kb: (bh, 0, kb)
        if causal:
            mask_map = _causal_kmap(mask_map, Bq, Bk, n_k)
        in_specs.append(pl.BlockSpec((1, 1, Bk), mask_map, memory_space=pltpu.VMEM))
        args.append(mask)

    kernel = functools.partial(
        _flash_kernel_dispatch,
        has_bias=bias is not None,
        has_mask=mask is not None,
        has_lse=return_lse,
        scale=scale, causal=causal, Bq=Bq, Bk=Bk, n_k=n_k, Tk=Tk,
    )
    out_specs = pl.BlockSpec((1, Bq, D), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((BH, Tq, D), q.dtype)
    if return_lse:
        out_specs = [out_specs, pl.BlockSpec((1, Bq, 1), lambda bh, qb, kb: (bh, qb, 0), memory_space=pltpu.VMEM)]
        out_shape = [out_shape, jax.ShapeDtypeStruct((BH, Tq, 1), jnp.float32)]
    interpret = jax.default_backend() not in ("tpu", "axon")
    out = pl.pallas_call(
        kernel,
        grid=(BH, n_q, n_k),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
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
    return out


def _flash_kernel_dispatch(*refs, has_bias, has_mask, has_lse, **kw):
    it = iter(refs)
    q_ref, k_ref, v_ref = next(it), next(it), next(it)
    bias_ref = next(it) if has_bias else None
    mask_ref = next(it) if has_mask else None
    o_ref = next(it)
    lse_ref = next(it) if has_lse else None
    m_scr, l_scr, acc_scr = next(it), next(it), next(it)
    _flash_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, lse_ref,
                  m_scr, l_scr, acc_scr, **kw)


# ------------------------------------------------------------- backward
# FlashAttention-2 style backward in two kernels (one accumulator family
# per grid layout, so nothing needs cross-step HBM accumulation):
#   dQ kernel : grid (BH, n_q, n_k), k innermost — dq accumulates in VMEM;
#               also emits per-(b,h) dS blocks when the bias needs a grad.
#   dKV kernel: grid (BH, n_k, n_q), q innermost — dk/dv accumulate in VMEM.
# Both recompute S and P = exp(S - lse) from the forward's logsumexp
# residual; the O(T^2) probability matrix never round-trips HBM (except
# the dS output when a bias gradient is required — that IS the gradient).


def _recompute_p(q_ref, k_ref, bias_ref, mask_ref, *, scale, causal,
                 q_start, k_start, Bq, Bk, ragged_q, ragged_k, Tq, Tk, lse,
                 mask_causal=True):
    """Shared S/P recompute for the backward kernels (fp32). Partial final
    blocks are padded with garbage by pallas, so P is hard-zeroed outside
    the (Tq, Tk) bounds (exp of masked-garbage can still be inf/NaN when
    the padded lse rows are garbage too)."""
    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        s = jnp.where(mask_ref[0] != 0, s, MASK_VALUE)
    if causal and mask_causal:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 0)
        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 1)
        s = jnp.where(cols <= rows, s, MASK_VALUE)
    p = _exp_bk(s - lse)
    if ragged_k:
        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 1)
        p = jnp.where(cols < Tk, p, 0.0)
    if ragged_q:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 0)
        p = jnp.where(rows < Tq, p, 0.0)
    return p


def _zero_ragged_rows(x, start, bound, ragged):
    """Zero padded rows of a (Bn, D) block (0 * NaN = NaN otherwise)."""
    if not ragged:
        return x
    rows = start + jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where(rows < bound, x, 0)


def _inbounds(q_start, k_start, Bq, Bk, Tq, Tk, ragged_q, ragged_k):
    """(Bq, Bk) bool: True inside the real (Tq, Tk) extent; None if aligned."""
    ok = None
    if ragged_q:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 0)
        ok = rows < Tq
    if ragged_k:
        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (Bq, Bk), 1)
        ck = cols < Tk
        ok = ck if ok is None else ok & ck
    return ok


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref, lse_ref, dd_ref,
    dq_ref, ds_ref,
    dq_scr,
    *, scale, causal, Bq, Bk, n_q, n_k, Tq, Tk,
):
    kb = pl.program_id(2)
    ragged_q = n_q * Bq != Tq
    ragged_k = n_k * Bk != Tk

    @pl.when(kb == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q_start = pl.program_id(1) * Bq
    k_start = kb * Bk

    def _compute(mask_causal: bool = True):
        p = _recompute_p(
            q_ref, k_ref, bias_ref, mask_ref, scale=scale, causal=causal,
            q_start=q_start, k_start=k_start, Bq=Bq, Bk=Bk,
            ragged_q=ragged_q, ragged_k=ragged_k, Tq=Tq, Tk=Tk,
            lse=lse_ref[0],                                    # (Bq, 1)
            mask_causal=mask_causal,
        )
        do = do_ref[0].astype(jnp.float32)                     # (Bq, D)
        v = _zero_ragged_rows(v_ref[0], k_start, Tk, ragged_k)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (Bq, Bk)
        ds = p * (dp - dd_ref[0])                              # (Bq, Bk)
        ok = _inbounds(q_start, k_start, Bq, Bk, Tq, Tk, ragged_q, ragged_k)
        if ok is not None:
            # p is 0 outside bounds but (dp - dd) can be inf/NaN there
            ds = jnp.where(ok, ds, 0.0)
        if ds_ref is not None:
            ds_ref[0] = ds.astype(ds_ref.dtype)
        k = _zero_ragged_rows(k_ref[0], k_start, Tk, ragged_k)
        dq_scr[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    if causal:
        # interior tiles skip the causal select inside _recompute_p
        on_diag = (k_start <= q_start + Bq - 1) & (k_start + Bk - 1 > q_start)
        interior = k_start + Bk - 1 <= q_start
        pl.when(on_diag)(lambda: _compute(True))
        pl.when(interior)(lambda: _compute(False))
    else:
        _compute(False)
    if causal and ds_ref is not None:
        # skipped upper-diagonal tiles still own their dS output block
        pl.when(k_start > q_start + Bq - 1)(
            lambda: ds_ref.__setitem__(0, jnp.zeros_like(ds_ref[0]))
        )

    @pl.when(kb == n_k - 1)
    def _epilogue():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref, lse_ref, dd_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale, causal, Bq, Bk, n_q, n_k, Tq, Tk,
):
    qb = pl.program_id(2)
    ragged_q = n_q * Bq != Tq
    ragged_k = n_k * Bk != Tk

    @pl.when(qb == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q_start = qb * Bq
    k_start = pl.program_id(1) * Bk

    def _compute(mask_causal: bool = True):
        p = _recompute_p(
            q_ref, k_ref, bias_ref, mask_ref, scale=scale, causal=causal,
            q_start=q_start, k_start=k_start, Bq=Bq, Bk=Bk,
            ragged_q=ragged_q, ragged_k=ragged_k, Tq=Tq, Tk=Tk,
            lse=lse_ref[0],
            mask_causal=mask_causal,
        )
        do_raw = _zero_ragged_rows(do_ref[0], q_start, Tq, ragged_q)
        do = do_raw.astype(jnp.float32)
        pt = p.astype(do_raw.dtype)
        dv_scr[:] += jax.lax.dot_general(
            pt, do_raw, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                      # (Bk, D)
        v = _zero_ragged_rows(v_ref[0], k_start, Tk, ragged_k)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dd_ref[0])                              # (Bq, Bk)
        ok = _inbounds(q_start, k_start, Bq, Bk, Tq, Tk, ragged_q, ragged_k)
        if ok is not None:
            ds = jnp.where(ok, ds, 0.0)
        q = _zero_ragged_rows(q_ref[0], q_start, Tq, ragged_q)
        dk_scr[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                              # (Bk, D)

    if causal:
        on_diag = (k_start <= q_start + Bq - 1) & (k_start + Bk - 1 > q_start)
        interior = k_start + Bk - 1 <= q_start
        pl.when(on_diag)(lambda: _compute(True))
        pl.when(interior)(lambda: _compute(False))
    else:
        _compute(False)

    @pl.when(qb == n_q - 1)
    def _epilogue():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd_dbias_kernel(
    q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref, lse_ref, dd_ref,
    ds_ref,
    ds_scr,
    *, scale, causal, Bq, Bk, n_q, n_k, Tq, Tk, B,
):
    """Shared-bias gradient: grid (H, n_q, n_k, B), batch innermost.

    dS for the shared (H, Tq, Tk) rel-pos bias is sum_b p_b * (dp_b - dd_b);
    accumulating that sum over b in VMEM scratch means HBM only ever holds
    the (H, Tq, Tk) result — B-fold smaller than emitting per-(b,h) dS
    blocks and batch-reducing them in XLA (the round-1 design), which at
    B=32, H=12, T=2048 would stage 6.4 GB of f32 dS."""
    b = pl.program_id(3)
    ragged_q = n_q * Bq != Tq
    ragged_k = n_k * Bk != Tk

    @pl.when(b == 0)
    def _init():
        ds_scr[:] = jnp.zeros_like(ds_scr)

    q_start = pl.program_id(1) * Bq
    k_start = pl.program_id(2) * Bk

    def _compute():
        p = _recompute_p(
            q_ref, k_ref, bias_ref, mask_ref, scale=scale, causal=causal,
            q_start=q_start, k_start=k_start, Bq=Bq, Bk=Bk,
            ragged_q=ragged_q, ragged_k=ragged_k, Tq=Tq, Tk=Tk,
            lse=lse_ref[0],
        )
        do = do_ref[0].astype(jnp.float32)
        v = _zero_ragged_rows(v_ref[0], k_start, Tk, ragged_k)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - dd_ref[0])
        ok = _inbounds(q_start, k_start, Bq, Bk, Tq, Tk, ragged_q, ragged_k)
        if ok is not None:
            ds = jnp.where(ok, ds, 0.0)
        ds_scr[:] += ds

    if causal:
        pl.when(k_start <= q_start + Bq - 1)(_compute)
    else:
        _compute()

    @pl.when(b == B - 1)
    def _epilogue():
        ds_ref[0] = ds_scr[:].astype(ds_ref.dtype)


def _shared_dbias(q, k, v, bias, mask, g, lse, dd, scale, causal,
                  Bq, Bk, n_q, n_k, Tq, Tk, interpret):
    """Batch-accumulated gradient for a shared (H, Tq, Tk) bias."""
    BH = q.shape[0]
    D = q.shape[2]
    H = bias.shape[0]
    B = BH // H

    # bh = b * H + h throughout (flash_attention flattens (B, H) that way)
    specs = [
        pl.BlockSpec((1, Bq, D), lambda h, a, c, b: (b * H + h, a, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bk, D), lambda h, a, c, b: (b * H + h, c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bk, D), lambda h, a, c, b: (b * H + h, c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Bq, Bk), lambda h, a, c, b: (h, a, c), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, bias]
    if mask is not None:
        specs.append(pl.BlockSpec((1, 1, Bk), lambda h, a, c, b: (b * H + h, 0, c), memory_space=pltpu.VMEM))
        args.append(mask)
    specs.extend([
        pl.BlockSpec((1, Bq, D), lambda h, a, c, b: (b * H + h, a, 0), memory_space=pltpu.VMEM),   # dO
        pl.BlockSpec((1, Bq, 1), lambda h, a, c, b: (b * H + h, a, 0), memory_space=pltpu.VMEM),   # lse
        pl.BlockSpec((1, Bq, 1), lambda h, a, c, b: (b * H + h, a, 0), memory_space=pltpu.VMEM),   # D_i
    ])
    args.extend([g, lse, dd])

    def dispatch(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref, bias_ref = next(it), next(it), next(it), next(it)
        mask_ref = next(it) if mask is not None else None
        do_ref, lse_ref, dd_ref = next(it), next(it), next(it)
        ds_ref = next(it)
        ds_scr = next(it)
        _flash_bwd_dbias_kernel(
            q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref, lse_ref, dd_ref,
            ds_ref, ds_scr,
            scale=scale, causal=causal, Bq=Bq, Bk=Bk, n_q=n_q, n_k=n_k,
            Tq=Tq, Tk=Tk, B=B,
        )

    return pl.pallas_call(
        dispatch,
        grid=(H, n_q, n_k, B),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, Bq, Bk), lambda h, a, c, b: (h, a, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Tq, Tk), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bq, Bk), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * BH * Tq * Tk * D,
            bytes_accessed=2 * BH * (Tq + Tk) * D + 4 * H * Tq * Tk,
            transcendentals=BH * Tq * Tk,
        ),
    )(*args)


def _flash_backward(
    q, k, v, bias, mask, out, lse, g, scale, causal,
    block_q: Optional[int] = None, block_k: Optional[int] = None, g_lse=None,
):
    """dq, dk, dv, dbias via the backward kernels. Shapes as in
    _flash_forward; lse is the forward's (BH, Tq, 1) logsumexp.

    g_lse, when given, is the cotangent of the lse output itself
    (flash_attention_with_lse): since d lse / d s = p, its contribution is
    ds += g_lse * p, which folds into the existing ds = p * (dp - dd) as
    dd -> dd - g_lse — zero kernel changes."""
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    if block_q is None or block_k is None:
        dbq, dbk = default_blocks(Tq, Tk, backward=True, has_bias=bias is not None)
        block_q = block_q or dbq
        block_k = block_k or dbk
    Bq = min(block_q, Tq)
    Bk = min(block_k, Tk)
    n_q = pl.cdiv(Tq, Bq)
    n_k = pl.cdiv(Tk, Bk)
    need_dbias = bias is not None
    nb = bias.shape[0] if need_dbias else 0

    # D_i = rowsum(dO * O): one fused XLA pass, O(T*D)
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                 axis=-1, keepdims=True)                        # (BH, Tq, 1)
    if g_lse is not None:
        dd = dd - g_lse.astype(jnp.float32)

    interpret = jax.default_backend() not in ("tpu", "axon")

    def common_specs(order):
        # order: 'q' -> grid (BH, n_q, n_k), 'k' -> grid (BH, n_k, n_q).
        # Under causal the varying (inner) index is clamped to the diagonal,
        # so compute-skipped tiles skip their input DMA too (see
        # _causal_kmap); output maps stay unclamped — skipped tiles still
        # own (and zero) their output blocks.
        if order == "q":
            def clamp(f):
                # same grid meaning as the forward: a = q-block, b = k-block
                return _causal_kmap(f, Bq, Bk, n_k) if causal else f

            qm = lambda bh, a, b: (bh, a, 0)
            km = clamp(lambda bh, a, b: (bh, b, 0))
            bm_bh = clamp(lambda bh, a, b: (bh, a, b))
            bm_h = clamp(lambda bh, a, b: (bh % nb, a, b))
            mm = clamp(lambda bh, a, b: (bh, 0, b))
        else:
            def clamp(f):
                if not causal:
                    return f
                return lambda bh, a, b: f(
                    bh, a, jnp.maximum(b, (a * Bk) // Bq))

            qm = clamp(lambda bh, a, b: (bh, b, 0))
            km = lambda bh, a, b: (bh, a, 0)
            bm_bh = clamp(lambda bh, a, b: (bh, b, a))
            bm_h = clamp(lambda bh, a, b: (bh % nb, b, a))
            mm = lambda bh, a, b: (bh, 0, a)
        specs = [
            pl.BlockSpec((1, Bq, D), qm, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bk, D), km, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bk, D), km, memory_space=pltpu.VMEM),
        ]
        args = [q, k, v]
        if bias is not None:
            specs.append(pl.BlockSpec((1, Bq, Bk), bm_bh if nb == BH else bm_h,
                                      memory_space=pltpu.VMEM))
            args.append(bias)
        if mask is not None:
            specs.append(pl.BlockSpec((1, 1, Bk), mm, memory_space=pltpu.VMEM))
            args.append(mask)
        specs.append(pl.BlockSpec((1, Bq, D), qm, memory_space=pltpu.VMEM))   # dO
        args.append(g)
        specs.append(pl.BlockSpec((1, Bq, 1), lambda bh, a, b: qm(bh, a, b), memory_space=pltpu.VMEM))  # lse
        args.append(lse)
        specs.append(pl.BlockSpec((1, Bq, 1), lambda bh, a, b: qm(bh, a, b), memory_space=pltpu.VMEM))  # D_i
        args.append(dd)
        return specs, args

    # ---- dQ (+ dS when a per-(b,h) bias needs its gradient; a bias shared
    # across the batch gets the dedicated batch-accumulating kernel below,
    # so its B-times-larger per-(b,h) dS never touches HBM)
    fuse_ds = need_dbias and nb == BH
    in_specs, args = common_specs("q")
    dq_spec = pl.BlockSpec((1, Bq, D), lambda bh, a, b: (bh, a, 0), memory_space=pltpu.VMEM)
    out_specs = [dq_spec]
    out_shape = [jax.ShapeDtypeStruct((BH, Tq, D), q.dtype)]
    if fuse_ds:
        out_specs.append(pl.BlockSpec((1, Bq, Bk), lambda bh, a, b: (bh, a, b),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((BH, Tq, Tk), jnp.float32))

    def dq_dispatch(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref = next(it), next(it), next(it)
        bias_ref = next(it) if bias is not None else None
        mask_ref = next(it) if mask is not None else None
        do_ref, lse_ref, dd_ref = next(it), next(it), next(it)
        dq_ref = next(it)
        ds_ref = next(it) if fuse_ds else None
        dq_scr = next(it)
        _flash_bwd_dq_kernel(
            q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref, lse_ref, dd_ref,
            dq_ref, ds_ref, dq_scr,
            scale=scale, causal=causal, Bq=Bq, Bk=Bk, n_q=n_q, n_k=n_k,
            Tq=Tq, Tk=Tk,
        )

    dq_out = pl.pallas_call(
        dq_dispatch,
        grid=(BH, n_q, n_k),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((Bq, D), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * BH * Tq * Tk * D,
            bytes_accessed=4 * BH * (Tq + Tk) * D,
            transcendentals=BH * Tq * Tk,
        ),
    )(*args)
    if fuse_ds:
        dq, ds = dq_out
        dbias = ds.astype(bias.dtype)
    else:
        dq = dq_out[0] if isinstance(dq_out, (list, tuple)) else dq_out
        dbias = None
    if need_dbias and not fuse_ds:
        dbias = _shared_dbias(
            q, k, v, bias, mask, g, lse, dd, scale, causal,
            Bq, Bk, n_q, n_k, Tq, Tk, interpret,
        ).astype(bias.dtype)

    # ---- dK / dV
    in_specs, args = common_specs("k")

    def dkv_dispatch(*refs):
        it = iter(refs)
        q_ref, k_ref, v_ref = next(it), next(it), next(it)
        bias_ref = next(it) if bias is not None else None
        mask_ref = next(it) if mask is not None else None
        do_ref, lse_ref, dd_ref = next(it), next(it), next(it)
        dk_ref, dv_ref = next(it), next(it)
        dk_scr, dv_scr = next(it), next(it)
        _flash_bwd_dkv_kernel(
            q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref, lse_ref, dd_ref,
            dk_ref, dv_ref, dk_scr, dv_scr,
            scale=scale, causal=causal, Bq=Bq, Bk=Bk, n_q=n_q, n_k=n_k,
            Tq=Tq, Tk=Tk,
        )

    dk, dv = pl.pallas_call(
        dkv_dispatch,
        grid=(BH, n_k, n_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, Bk, D), lambda bh, a, b: (bh, a, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bk, D), lambda bh, a, b: (bh, a, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Tk, D), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Bk, D), jnp.float32),
            pltpu.VMEM((Bk, D), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * BH * Tq * Tk * D,
            bytes_accessed=4 * BH * (Tq + Tk) * D,
            transcendentals=BH * Tq * Tk,
        ),
    )(*args)
    return dq, dk, dv, dbias


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
    out, lse = _flash_forward(q, k, v, bias, mask, scale, causal,
                              return_lse=True)
    return out, (q, k, v, bias, mask, out, lse)


def _bwd(scale, causal, residuals, g):
    q, k, v, bias, mask, out, lse = residuals
    if os.environ.get("OFASYS_FLASH_XLA_BWD") == "1":
        # debugging fallback: re-derive gradients through the XLA
        # reference (numerically identical softmax semantics)
        def f(q, k, v, bias):
            return _xla_reference(q, k, v, bias, mask, scale, causal)

        _, vjp = jax.vjp(f, q, k, v, bias)
        dq, dk, dv, dbias = vjp(g)
    else:
        dq, dk, dv, dbias = _flash_backward(
            q, k, v, bias, mask, out, lse, g, scale, causal
        )
    if bias is None:
        dbias = None
    return dq, dk, dv, dbias, None


flash_attention_flat.defvjp(_fwd, _bwd)


# -------------------------------------------------- (out, lse) variant
# Differentiable flash that also returns the logsumexp residual, so callers
# that merge partial attention results with online-softmax statistics (ring
# attention's per-ring-step combine) can differentiate THROUGH the merge.
# The lse cotangent folds into the standard backward as dd -> dd - g_lse
# (see _flash_backward).


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_with_lse(q, k, v, bias, mask, scale, causal):
    """(out (BH, Tq, D), lse (BH, Tq, 1) f32); shapes as flash_attention_flat."""
    return _flash_forward(q, k, v, bias, mask, scale, causal, return_lse=True)


def _fwd_lse(q, k, v, bias, mask, scale, causal):
    out, lse = _flash_forward(q, k, v, bias, mask, scale, causal,
                              return_lse=True)
    return (out, lse), (q, k, v, bias, mask, out, lse)


def _xla_reference_lse(q, k, v, bias, mask, scale, causal):
    """fp32 (out, lse) reference matching the kernel contract."""
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
    lse = jax.nn.logsumexp(s, axis=-1, keepdims=True)
    o = jnp.einsum("bqk,bkd->bqd", jnp.exp(s - lse), v.astype(jnp.float32))
    return o.astype(q.dtype), lse


def _bwd_lse(scale, causal, residuals, g):
    q, k, v, bias, mask, out, lse = residuals
    g_out, g_lse = g
    if os.environ.get("OFASYS_FLASH_XLA_BWD") == "1":
        # same debugging fallback as the plain variant, covering the lse
        # cotangent too
        def f(q, k, v, bias):
            o, l = _xla_reference_lse(q, k, v, bias, mask, scale, causal)
            return o, l

        _, vjp = jax.vjp(f, q, k, v, bias)
        dq, dk, dv, dbias = vjp((g_out, g_lse))
    else:
        dq, dk, dv, dbias = _flash_backward(
            q, k, v, bias, mask, out, lse, g_out, scale, causal, g_lse=g_lse
        )
    if bias is None:
        dbias = None
    return dq, dk, dv, dbias, None


flash_attention_with_lse.defvjp(_fwd_lse, _bwd_lse)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_attention(
    q: jax.Array,                  # (B, Tq, H, D) — or (B, H, Tq, D) bhtd
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,   # (1|B, H, Tq, Tk)
    mask: Optional[jax.Array] = None,   # bool (B, 1, 1, Tk) keep
    scale: float = 1.0,
    causal: bool = False,
    layout: str = "bthd",
) -> jax.Array:
    """Drop-in for ops.attention.dot_product_attention (no-dropout path).

    Short/ragged sequences (the multi-task encoder mix runs T=196/120/64)
    are tile-aligned here by zero-padding: queries to the sublane tile,
    keys to the lane tile with the padding masked out, and the output
    sliced back — the kernel itself only ever sees aligned blocks.

    ``layout='bhtd'``: caller supplies (B, H, T, D) and gets (B, H, T, D)
    back. The (BH, T, D) kernel view is then a FREE reshape — no standalone
    (B,T,H,D)<->(B,H,T,D) relayout around the custom call. Callers should
    transpose right after the q/k/v projections (XLA fuses that transpose
    into the projection GEMM's epilogue — ~10 ms/step of layout copies on
    the T=4096 longseq profile otherwise)."""
    bhtd = layout == "bhtd"
    if bhtd:
        B, H, Tq, D = q.shape
        Tk = k.shape[2]
    else:
        B, Tq, H, D = q.shape
        Tk = k.shape[1]
    t_ax = 2 if bhtd else 1
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
        qp = [(0, 0)] * 4
        kp = [(0, 0)] * 4
        qp[t_ax] = (0, Tq_p - Tq)
        kp[t_ax] = (0, Tk_p - Tk)
        q = jnp.pad(q, qp)
        k = jnp.pad(k, kp)
        v = jnp.pad(v, kp)
        mask = jnp.pad(mask, [(0, 0), (0, 0), (0, 0), (0, Tk_p - Tk)])
        if bias is not None:
            bias = jnp.pad(
                bias, [(0, 0), (0, 0), (0, Tq_p - Tq), (0, Tk_p - Tk)]
            )
        out = flash_attention(q, k, v, bias=bias, mask=mask, scale=scale,
                              causal=causal, layout=layout)
        return out[:, :, :Tq] if bhtd else out[:, :Tq]
    if bhtd:
        qf = q.reshape(B * H, Tq, D)
        kf = k.reshape(B * H, Tk, D)
        vf = v.reshape(B * H, Tk, D)
    else:
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
    if bhtd:
        return out.reshape(B, H, Tq, D)
    return out.reshape(B, H, Tq, D).transpose(0, 2, 1, 3)


def flash_supported(Tq: int, Tk: int, D: int, dropout_rate: float) -> bool:
    """Shapes where the kernel beats (or matches) XLA; otherwise the XLA
    path runs.

    Ragged lengths are tile-aligned by the flash_attention pad/slice
    wrapper, so alignment is no longer a gate — only dropout (not fused),
    head dims past the lane budget, and the measured length crossover.
    v5e, bf16, bias+mask, readback-timed, with the Pallas backward:
    fwd-only 1.9x at T=1024 / 3.2x at T=2048; fwd+bwd including the bias
    gradient (the training-realistic case) 1.67x at T=1024 / 2.11x at
    T=2048 — but below T~256 XLA's fused attention still wins fwd+bwd
    (T=196 B64: 0.79x; tiny tiles leave the MXU idle). The T>=256 floor
    keeps short-sequence training on XLA while long — now including
    ragged — sequences get the kernel."""
    if dropout_rate > 0.0:
        return False
    if D > 256:
        return False
    return Tq >= 16 and Tk >= 256
