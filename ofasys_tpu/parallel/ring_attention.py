"""Ring attention: sequence/context parallelism over the 'sequence' mesh axis.

The reference has NO sequence parallelism of any kind (SURVEY §5: max
positions 1024, full quadratic attention) — this is the beyond-reference
capability. Queries stay local to their sequence shard; K/V blocks rotate
around the ring via ppermute, and partial attention is merged with online-
softmax statistics (the flash-attention combine), so per-device score
memory is O(T/n * T/n) while total sequence length scales with the ring
size.

The per-step block attention runs through the Pallas flash kernel
(ops.pallas_attention.flash_attention_with_lse) when the local shard is
long enough for the kernel to win (flash_supported) — its custom_vjp
propagates the lse cotangent, so the online merge differentiates straight
through the kernel. Short shards keep the XLA einsum path, which
materializes only the local (B, H, Tq/n, Tk/n) block.

Model integration (cfg.sequence_parallel): additive attention bias and
key padding masks are supported — each device keeps only its own
(H, Tq/n, Tk) bias rows (in_spec sharded on the q-row axis) and slices the
current ring step's column block out of them, so the full (H, T, T) bias
never lives on one device.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ofasys_tpu.ops.pallas_attention import (
    flash_attention_with_lse,
    flash_supported,
)

NEG_INF = -1e9


def _block_attn(q, k, v, scale, causal=False, bias=None, mask=None):
    """XLA partial attention: returns (normalized out f32, lse (B, H, Tq)).

    bias: (1|B, H, Tq, Tk) additive, already sliced to this ring block.
    mask: (B, 1, 1, Tk) bool keep, already sliced to this ring block.
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask, s, NEG_INF)
    if causal:
        Tq, Tk = s.shape[-2:]
        vis = jnp.arange(Tk)[None, :] <= jnp.arange(Tq)[:, None]
        s = jnp.where(vis, s, NEG_INF)
    m = s.max(axis=-1)                                         # (B, H, Tq)
    p = jnp.exp(s - m[..., None])
    l = jnp.maximum(p.sum(axis=-1), 1e-30)                     # (B, H, Tq)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)    # (B, Tq, H, D)
    return o.astype(jnp.float32) / l.transpose(0, 2, 1)[..., None], m + jnp.log(l)


def _block_attn_flash(q, k, v, scale, causal=False, bias=None, mask=None):
    """Flash partial attention: same contract via the Pallas kernel."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Tq, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Tk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Tk, D)
    bf = None
    if bias is not None:
        # bias reads at the compute dtype: bf16 in production (halves HBM
        # traffic, like the flash_attention wrapper); f32 inputs keep the
        # bias in f32 so full-precision callers lose nothing
        bf = (bias[0] if bias.shape[0] == 1            # (H, Tq, Tk) shared
              else bias.reshape(B * H, Tq, Tk)).astype(q.dtype)
    mf = None
    if mask is not None:
        mf = jnp.repeat(
            jnp.broadcast_to(mask, (B, 1, 1, Tk)).astype(jnp.int8).reshape(B, 1, Tk),
            H, axis=0,
        )                                              # (BH, 1, Tk)
    out, lse = flash_attention_with_lse(qf, kf, vf, bf, mf, scale, causal)
    out = out.reshape(B, H, Tq, D).transpose(0, 2, 1, 3).astype(jnp.float32)
    return out, lse.reshape(B, H, Tq)


def ring_attention(
    q: jax.Array,               # (B, T, H, D) sharded (batch_axis, 'sequence')
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    scale: float = 1.0,
    axis: str = "sequence",
    use_flash: Optional[bool] = None,
    causal: bool = False,
    bias: Optional[jax.Array] = None,   # (1|B, H, Tq, Tk) — global T axes
    mask: Optional[jax.Array] = None,   # bool keep (B, 1, 1, Tk) — global Tk
    batch_axis=None,                    # mesh axis (or tuple) sharding B
    head_axis=None,                     # mesh axis sharding H (tensor parallel)
) -> jax.Array:
    """Attention over the ring; output sharded like q.

    use_flash: force the Pallas inner kernel on/off; None auto-selects
    (TPU backend AND the local shard length clears the measured
    flash_supported crossover).

    causal: device i's queries (global rows [i*Tl, (i+1)*Tl)) may only see
    keys from ring blocks j <= i. At ring step s the resident block is
    j = (i - s) mod n, so lax.cond dispatches: j < i -> full block,
    j == i -> locally-causal block (step 0), j > i -> skipped entirely —
    upper-triangle ring steps cost no FLOPs, only the ppermute.

    bias/mask keep their GLOBAL key axis: bias rows are sharded with the
    queries (each device holds (1|B, H, T/n, T)) and the ring step's
    column block is sliced out locally; the (B, 1, 1, T) mask is tiny and
    kept whole. batch_axis additionally shards the batch dimension (data
    parallel composes with sequence parallel in one shard_map).
    """
    n = mesh.shape[axis]
    ba, ha = batch_axis, head_axis
    has_bias, has_mask = bias is not None, mask is not None

    in_specs = [P(ba, axis, ha, None)] * 3
    args = [q, k, v]
    if has_bias:
        # batch-sharded only if the bias is per-sample
        in_specs.append(P(ba if bias.shape[0] != 1 else None, ha, axis, None))
        args.append(bias)
    if has_mask:
        in_specs.append(P(ba, None, None, None))
        args.append(mask)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(ba, axis, ha, None),
        check_vma=False,
    )
    def run(q, k, v, *extra):
        it = iter(extra)
        bias_loc = next(it) if has_bias else None    # (1|B, H, Tq_loc, Tk_glob)
        mask_loc = next(it) if has_mask else None    # (B_loc, 1, 1, Tk_glob)
        B, Tq, H, D = q.shape
        Tk = k.shape[1]
        flash = use_flash
        if flash is None:
            # the flat kernel is called without the pad/slice wrapper here,
            # so the local shard must already be tile-aligned
            flash = (jax.default_backend() in ("tpu", "axon")
                     and flash_supported(Tq, Tk, D, 0.0)
                     and Tq % 16 == 0 and Tk % 128 == 0)
        block = _block_attn_flash if flash else _block_attn
        my = jax.lax.axis_index(axis)

        def step_inputs(j):
            b = None
            if bias_loc is not None:
                b = jax.lax.dynamic_slice_in_dim(bias_loc, j * Tk, Tk, axis=3)
            m = None
            if mask_loc is not None:
                m = jax.lax.dynamic_slice_in_dim(mask_loc, j * Tk, Tk, axis=3)
            return dict(bias=b, mask=m)

        def body(s, carry):
            o_acc, lse_acc, k_cur, v_cur = carry
            j = jax.lax.rem(my - s + n, n)           # owner of the block
            if causal:
                # bias/mask column slices happen INSIDE the compute branches
                # so skipped upper-triangle steps pay neither FLOPs nor the
                # slice copy
                skip = (jnp.zeros((B, Tq, H, D), jnp.float32),
                        jnp.full((B, H, Tq), -jnp.inf, jnp.float32))
                o_i, lse_i = jax.lax.cond(
                    j == my,
                    lambda kv: block(q, kv[0], kv[1], scale, causal=True,
                                     **step_inputs(j)),
                    lambda kv: jax.lax.cond(
                        j < my,
                        lambda kv: block(q, kv[0], kv[1], scale,
                                         **step_inputs(j)),
                        lambda kv: skip,
                        kv,
                    ),
                    (k_cur, v_cur),
                )
            else:
                o_i, lse_i = block(q, k_cur, v_cur, scale, **step_inputs(j))
            lse_new = jnp.logaddexp(lse_acc, lse_i)
            a_old = jnp.exp(lse_acc - lse_new)
            a_new = jnp.where(jnp.isfinite(lse_i), jnp.exp(lse_i - lse_new), 0.0)
            o_acc = (o_acc * a_old.transpose(0, 2, 1)[..., None]
                     + o_i * a_new.transpose(0, 2, 1)[..., None])
            perm = [(s, (s + 1) % n) for s in range(n)]
            k_next = jax.lax.ppermute(k_cur, axis, perm)
            v_next = jax.lax.ppermute(v_cur, axis, perm)
            return (o_acc, lse_new, k_next, v_next)

        o0 = jnp.zeros((B, Tq, H, D), jnp.float32)
        lse0 = jnp.full((B, H, Tq), -jnp.inf, jnp.float32)
        o, _, _, _ = jax.lax.fori_loop(0, n, body, (o0, lse0, k, v))
        return o.astype(q.dtype)

    return run(*args)
