"""Ring attention: sequence/context parallelism over the 'sequence' mesh axis.

The reference has NO sequence parallelism of any kind (SURVEY §5: max
positions 1024, full quadratic attention) — this is the beyond-reference
capability. Queries stay local to their sequence shard; K/V blocks rotate
around the ring via ppermute, and partial attention is merged with online-
softmax statistics (the flash-attention combine), so per-device memory is
O(T/n * T/n) while total sequence length scales with the ring size.

The per-step block attention runs through the Pallas flash kernel
(ops.pallas_attention.flash_attention_with_lse) when the local shard is
long enough for the kernel to win (flash_supported) — its custom_vjp
propagates the lse cotangent, so the online merge differentiates straight
through the kernel. Short shards keep the XLA einsum path, which
materializes only the local (B, H, Tq/n, Tk/n) block.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ofasys_tpu.ops.pallas_attention import (
    flash_attention_with_lse,
    flash_supported,
)

NEG_INF = -1e9


def _block_attn(q, k, v, scale, causal=False):
    """XLA partial attention: returns (normalized out f32, lse (B, H, Tq))."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        Tq, Tk = s.shape[-2:]
        vis = jnp.arange(Tk)[None, :] <= jnp.arange(Tq)[:, None]
        s = jnp.where(vis, s, NEG_INF)
    m = s.max(axis=-1)                                         # (B, H, Tq)
    p = jnp.exp(s - m[..., None])
    l = jnp.maximum(p.sum(axis=-1), 1e-30)                     # (B, H, Tq)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)    # (B, Tq, H, D)
    return o.astype(jnp.float32) / l.transpose(0, 2, 1)[..., None], m + jnp.log(l)


def _block_attn_flash(q, k, v, scale, causal=False):
    """Flash partial attention: same contract via the Pallas kernel."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    qf = q.transpose(0, 2, 1, 3).reshape(B * H, Tq, D)
    kf = k.transpose(0, 2, 1, 3).reshape(B * H, Tk, D)
    vf = v.transpose(0, 2, 1, 3).reshape(B * H, Tk, D)
    out, lse = flash_attention_with_lse(qf, kf, vf, None, None, scale, causal)
    out = out.reshape(B, H, Tq, D).transpose(0, 2, 1, 3).astype(jnp.float32)
    return out, lse.reshape(B, H, Tq)


def ring_attention(
    q: jax.Array,               # (B, T, H, D) sharded P(None, 'sequence')
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    scale: float = 1.0,
    axis: str = "sequence",
    use_flash: Optional[bool] = None,
    causal: bool = False,
) -> jax.Array:
    """Attention over the ring; output sharded like q.

    use_flash: force the Pallas inner kernel on/off; None auto-selects
    (TPU backend AND the local shard length clears the measured
    flash_supported crossover).

    causal: device i's queries (global rows [i*Tl, (i+1)*Tl)) may only see
    keys from ring blocks j <= i. At ring step s the resident block is
    j = (i - s) mod n, so lax.cond dispatches: j < i -> full block,
    j == i -> locally-causal block (step 0), j > i -> skipped entirely —
    upper-triangle ring steps cost no FLOPs, only the ppermute."""
    n = mesh.shape[axis]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_rep=False,
    )
    def run(q, k, v):
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

        def body(s, carry):
            o_acc, lse_acc, k_cur, v_cur = carry
            if causal:
                j = jax.lax.rem(my - s + n, n)       # owner of the block
                skip = (jnp.zeros((B, Tq, H, D), jnp.float32),
                        jnp.full((B, H, Tq), -jnp.inf, jnp.float32))
                o_i, lse_i = jax.lax.cond(
                    j == my,
                    lambda kv: block(q, kv[0], kv[1], scale, causal=True),
                    lambda kv: jax.lax.cond(
                        j < my,
                        lambda kv: block(q, kv[0], kv[1], scale),
                        lambda kv: skip,
                        kv,
                    ),
                    (k_cur, v_cur),
                )
            else:
                o_i, lse_i = block(q, k_cur, v_cur, scale)
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

    return run(q, k, v)
