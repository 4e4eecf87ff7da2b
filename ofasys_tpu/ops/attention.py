"""Attention ops.

Replaces the reference's fused CUDA scaled-masked-softmax kernels
(ofasys/module/fused_kernels/, ~1.8k LoC C++/CUDA) and its materialized
B×H×T×T bias tensors. Two paths behind one signature:

  * ``dot_product_attention`` — XLA einsum path. fp32 logits/softmax
    regardless of compute dtype (TPU-safe bf16 policy); XLA fuses the
    bias-add + mask + softmax into the matmul epilogue, which is exactly
    what the reference's hand-written CUDA kernels did.
  * ``flash_attention`` — Pallas blocked/online-softmax kernel for long
    sequences (ofasys_tpu/ops/pallas_attention.py), same signature.

Conventions: q (B, Tq, H, D); k/v (B, Tk, H, D); bias additive fp32
broadcastable to (B, H, Tq, Tk); mask bool broadcastable to
(B, 1|H, Tq, Tk) with True = attend.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Large-negative used for masking. The reference uses -1e8 (fp32) / -1e4
# (fp16) via masked_fill (module/transformer_layer.py:165); here logits are
# always fp32 so one constant suffices. Not -inf: fully-masked query rows
# (pad queries) would produce NaNs that poison gradients.
MASK_VALUE = -1e9


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    scale: float = 1.0,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    dtype: Optional[jnp.dtype] = None,
    logits_dtype: Optional[jnp.dtype] = None,
    layout: str = "bthd",
) -> jax.Array:
    """Batched multi-head attention with additive bias (XLA path).

    ``layout`` is the q/k/v (and output) memory layout:
      'bthd' — (B, T, H, D), the projection GEMMs' natural reshape
      'bhtd' — (B, H, T, D), the batched-matmul-native form; the caller
               transposes around the call so the transposes sit adjacent to
               the projection/output GEMMs where XLA can fuse them, instead
               of XLA inserting its own copies around the score matmuls
    """
    out_dtype = dtype or q.dtype
    if layout == "bhtd":
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = _finish_logits(logits, bias, mask, scale, logits_dtype)
        probs = jax.nn.softmax(logits, axis=-1)
        if dropout_rate > 0.0 and dropout_rng is not None:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
            probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
        probs = probs.astype(out_dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(out_dtype))
    # fp32 logits on the MXU: preferred_element_type keeps the accumulator
    # fp32 even when q/k are bf16.
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = _finish_logits(logits, bias, mask, scale, logits_dtype)
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(out_dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(out_dtype))


def _finish_logits(logits, bias, mask, scale, logits_dtype):
    logits = logits * jnp.float32(scale)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, MASK_VALUE)
    if logits_dtype is not None and logits_dtype != jnp.float32:
        # store the materialized (B,H,Tq,Tk) scores in the compute dtype,
        # halving their HBM traffic; softmax math stays fp32 over the
        # rounded values — the torch reference behaves exactly this way
        # under fp16 (bmm in half, softmax(dtype=float32),
        # multihead_attention.py:334-349)
        logits = logits.astype(logits_dtype).astype(jnp.float32)
    return logits


def causal_mask(tq: int, tk: int, dtype=jnp.bool_) -> jax.Array:
    """(1, 1, tq, tk) lower-triangular keep-mask; offset aligns the last query
    step with the last key step (incremental decoding slices)."""
    i = jnp.arange(tq)[:, None]
    j = jnp.arange(tk)[None, :]
    return (j <= i + (tk - tq)).astype(dtype)[None, None]


def combine_masks(*masks):
    """AND together keep-masks, ignoring Nones. Returns None if all None."""
    out = None
    for m in masks:
        if m is None:
            continue
        out = m if out is None else jnp.logical_and(out, m)
    return out
