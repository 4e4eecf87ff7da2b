"""Chunked-vocab fused cross-entropy statistics.

The criterion's logsumexp-form loss (engine/criterion/
label_smoothed_cross_entropy.py; reference hot path
ofasys/engine/criterion/label_smoothed_cross_entropy.py:95) consumes the
(N, V) logits only through three per-row reductions: logsumexp, the target
gather z_t, and the row sum. When the logits are a plain tied-embedding
projection ``x @ W^T``, the full (N, V) tensor is pure intermediate — yet
the unfused path writes it to HBM once in the forward and again as dlogits
in the backward (~820 MB each at N=8K, V=50K bf16; ~2-3 ms/update of pure
bandwidth on v5e).

``chunked_ce_stats`` computes the three reductions chunk-by-chunk over the
vocab with a custom VJP that recomputes each chunk's logits in the
backward, so no (N, V) tensor ever exists in HBM in either direction — the
classic fused linear-CE / "chunked softmax" structure, expressed as a
lax.scan of large MXU-shaped GEMMs rather than a hand-scheduled kernel
(each chunk IS a (N, E) x (E, Vc) matmul; XLA fuses the online-softmax
epilogue into it, which is all a Pallas version would add).

Numerics match the unfused criterion: the per-chunk logits are rounded to
the projection's bf16 output dtype before the f32 reductions, exactly like
flax's ``embed.attend`` output feeding ``z.astype(f32)``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def pick_chunks(V: int, target: int = 4096) -> Optional[int]:
    """Number of chunks C such that V % C == 0, V/C is lane-aligned (128),
    and V/C is closest to ``target``; None when V has no usable divisor
    (caller falls back to the unfused path)."""
    best = None
    for C in range(1, 65):
        if V % C:
            continue
        Vc = V // C
        if Vc % 128:
            continue
        if C == 1:
            continue  # one chunk == unfused; no point
        if best is None or abs(Vc - target) < abs(V // best - target):
            best = C
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def chunked_ce_stats(x2, emb, tgt, n_chunks: int, compute_dtype=jnp.bfloat16):
    """(lse, z_t, zsum) over the virtual logits ``x2 @ emb.T``.

    x2:  (N, E) hidden states (any float dtype; cast to compute_dtype)
    emb: (V, E) tied embedding table (V % n_chunks == 0)
    tgt: (N,) int32 target ids

    Returns f32 (N,) each: logsumexp of the row, the target logit, and the
    row sum — everything the label-smoothed CE needs. Gradients flow to x2
    and emb (cotangents for the stats combine into one dlogits-per-chunk
    recompute in the VJP).
    """
    lse, z_t, zsum = _fwd_scan(x2, emb, tgt, n_chunks, compute_dtype)
    return lse, z_t, zsum


def _fwd_scan(x2, emb, tgt, n_chunks, compute_dtype):
    N, E = x2.shape
    V = emb.shape[0]
    Vc = V // n_chunks
    xc = x2.astype(compute_dtype)
    Wc = emb.reshape(n_chunks, Vc, E)

    def body(carry, w):
        m, l, z_t, zsum, c = carry
        # (N, Vc) = (N, E) @ (E, Vc): bf16 MXU with f32 accumulation, then
        # rounded to the projection dtype for unfused-numerics parity
        s = jax.lax.dot_general(
            xc, w.astype(compute_dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype).astype(jnp.float32)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, m_cur)
        l = l * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new[:, None]), axis=-1)
        local = tgt - c * Vc
        hit = (local >= 0) & (local < Vc)
        got = jnp.take_along_axis(s, jnp.clip(local, 0, Vc - 1)[:, None], axis=-1)[:, 0]
        z_t = jnp.where(hit, got, z_t)
        zsum = zsum + jnp.sum(s, axis=-1)
        return (m_new, l, z_t, zsum, c + 1), None

    init = (
        jnp.full((N,), -jnp.inf, jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.zeros((N,), jnp.float32),
        jnp.int32(0),
    )
    (m, l, z_t, zsum, _), _ = jax.lax.scan(body, init, Wc)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))
    return lse, z_t, zsum


def _ce_fwd(x2, emb, tgt, n_chunks, compute_dtype):
    lse, z_t, zsum = _fwd_scan(x2, emb, tgt, n_chunks, compute_dtype)
    return (lse, z_t, zsum), (x2, emb, tgt, lse)


def _ce_bwd(n_chunks, compute_dtype, res, g):
    """ds_j = g_lse * p_j + g_zt * 1[j = tgt] + g_zsum, per chunk; the (N,
    Vc) dlogits block feeds both GEMMs (dx accumulation, dW emission) and
    dies in VMEM/registers — never the full (N, V) in HBM."""
    x2, emb, tgt, lse = res
    g_lse, g_zt, g_zsum = (t.astype(jnp.float32) for t in g)
    N, E = x2.shape
    V = emb.shape[0]
    Vc = V // n_chunks
    xc = x2.astype(compute_dtype)
    Wc = emb.reshape(n_chunks, Vc, E)

    def body(carry, w):
        dx, c = carry
        s = jax.lax.dot_general(
            xc, w.astype(compute_dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(compute_dtype).astype(jnp.float32)
        p = jnp.exp(s - lse[:, None])
        local = tgt - c * Vc
        hit = ((local >= 0) & (local < Vc))
        onehot = (
            (jnp.arange(Vc, dtype=jnp.int32)[None, :] == local[:, None])
            & hit[:, None]
        )
        ds = (
            g_lse[:, None] * p
            + jnp.where(onehot, g_zt[:, None], 0.0)
            + g_zsum[:, None]
        ).astype(compute_dtype)                               # (N, Vc)
        dx = dx + jax.lax.dot_general(
            ds, w.astype(compute_dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (N, E)
        dw = jax.lax.dot_general(
            ds, xc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                     # (Vc, E)
        return (dx, c + 1), dw

    (dx, _), dW = jax.lax.scan(
        body, (jnp.zeros((N, E), jnp.float32), jnp.int32(0)), Wc
    )
    return dx.astype(x2.dtype), dW.reshape(V, E).astype(emb.dtype), None


chunked_ce_stats.defvjp(_ce_fwd, _ce_bwd)
