"""Ring attention: sequence/context parallelism over the 'sequence' mesh axis.

The reference has NO sequence parallelism of any kind (SURVEY §5: max
positions 1024, full quadratic attention) — this is the beyond-reference
capability. Queries stay local to their sequence shard; K/V blocks rotate
around the ring via ppermute, and partial attention is merged with online-
softmax statistics (the flash-attention combine), so per-device memory is
O(T/n * T/n) while total sequence length scales with the ring size.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

NEG_INF = -1e9


def _block_attn(q, k, v, scale):
    """Partial attention: returns (unnorm_out, row_max, row_sumexp)."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    m = s.max(axis=-1)                                         # (B, H, Tq)
    p = jnp.exp(s - m[..., None])
    l = p.sum(axis=-1)                                         # (B, H, Tq)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)    # (B, Tq, H, D)
    return o.astype(jnp.float32), m, l


def ring_attention(
    q: jax.Array,               # (B, T, H, D) sharded P(None, 'sequence')
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    scale: float = 1.0,
    axis: str = "sequence",
) -> jax.Array:
    """Full (non-causal) attention over the ring; output sharded like q."""
    n = mesh.shape[axis]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_rep=False,
    )
    def run(q, k, v):
        B, Tq, H, D = q.shape

        def body(i, carry):
            o_acc, m_acc, l_acc, k_cur, v_cur = carry
            o_i, m_i, l_i = _block_attn(q, k_cur, v_cur, scale)
            m_new = jnp.maximum(m_acc, m_i)
            a_old = jnp.exp(m_acc - m_new)
            a_new = jnp.exp(m_i - m_new)
            o_acc = o_acc * a_old.transpose(0, 2, 1)[..., None] + o_i * a_new.transpose(0, 2, 1)[..., None]
            l_acc = l_acc * a_old + l_i * a_new
            perm = [(s, (s + 1) % n) for s in range(n)]
            k_next = jax.lax.ppermute(k_cur, axis, perm)
            v_next = jax.lax.ppermute(v_cur, axis, perm)
            return (o_acc, m_new, l_acc, k_next, v_next)

        o0 = jnp.zeros((B, Tq, H, D), jnp.float32)
        m0 = jnp.full((B, H, Tq), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((B, H, Tq), jnp.float32)
        o, m, l, _, _ = jax.lax.fori_loop(0, n, body, (o0, m0, l0, k, v))
        out = o / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
        return out.astype(q.dtype)

    return run(q, k, v)
