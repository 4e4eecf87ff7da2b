"""Mixture-of-experts FFN with expert parallelism.

TPU-native replacement for the reference's BaseLayer MoE
(ofasys/module/base_layer.py:16-142: one expert per DP rank, balanced
assignment via a fairseq C++ extension, autograd All2All over NCCL):
switch-style top-1 routing with capacity clipping, experts sharded over the
mesh 'expert' axis, dispatch/return via jax.lax.all_to_all inside shard_map.

Dense path (no mesh / expert axis 1): einsum dispatch — still one program,
XLA parallelizes across experts on-chip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def top1_routing(
    logits: jax.Array,          # (N, E) router logits
    capacity: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Switch routing: returns (expert_idx (N,), gate (N,), slot (N,)) where
    slot is the position within the expert's capacity buffer (>= capacity
    means dropped)."""
    probs = jax.nn.softmax(logits, axis=-1)
    expert_idx = jnp.argmax(probs, axis=-1)
    gate = jnp.take_along_axis(probs, expert_idx[:, None], axis=-1)[:, 0]
    onehot = jax.nn.one_hot(expert_idx, logits.shape[-1], dtype=jnp.int32)
    slot = jnp.cumsum(onehot, axis=0) * onehot - 1
    slot = slot.max(axis=-1)
    return expert_idx, gate, slot


def aux_load_balance_loss(logits: jax.Array, expert_idx: jax.Array) -> jax.Array:
    """Switch-transformer load-balancing loss."""
    E = logits.shape[-1]
    probs = jax.nn.softmax(logits, axis=-1)
    me = probs.mean(axis=0)
    ce = jax.nn.one_hot(expert_idx, E).mean(axis=0)
    return E * jnp.sum(me * ce)


def moe_ffn_dense(
    x: jax.Array,               # (N, D)
    router_w: jax.Array,        # (D, E)
    w1: jax.Array,              # (E, D, H)
    w2: jax.Array,              # (E, H, D)
    capacity_factor: float = 1.25,
    activation=jax.nn.gelu,
) -> Tuple[jax.Array, jax.Array]:
    """Single-device / replicated MoE via capacity-buffer einsum dispatch.
    Returns (out (N, D), aux_loss)."""
    N, D = x.shape
    E = router_w.shape[-1]
    capacity = max(int(capacity_factor * N / E), 1)
    logits = (x.astype(jnp.float32) @ router_w.astype(jnp.float32))
    expert_idx, gate, slot = top1_routing(logits, capacity)
    keep = slot < capacity
    # dispatch: (N, E, C) one-hot combine tensor
    disp = (
        jax.nn.one_hot(expert_idx, E, dtype=x.dtype)[:, :, None]
        * jax.nn.one_hot(jnp.where(keep, slot, capacity), capacity + 1, dtype=x.dtype)[:, None, :capacity]
    )
    xs = jnp.einsum("nd,nec->ecd", x, disp)                 # (E, C, D)
    h = activation(jnp.einsum("ecd,edh->ech", xs, w1.astype(x.dtype)))
    ys = jnp.einsum("ech,ehd->ecd", h, w2.astype(x.dtype))  # (E, C, D)
    out = jnp.einsum("ecd,nec->nd", ys, disp)
    out = out * gate.astype(x.dtype)[:, None]
    return out, aux_load_balance_loss(logits, expert_idx)


def moe_ffn_sharded(
    x: jax.Array,               # (N, D) tokens (already flat)
    router_w: jax.Array,
    w1: jax.Array,              # (E, D, H) sharded P('expert', None, None)
    w2: jax.Array,
    mesh: Mesh,
    capacity_factor: float = 1.25,
    activation=jax.nn.gelu,
) -> Tuple[jax.Array, jax.Array]:
    """Expert-parallel MoE: tokens sharded over 'expert', experts local to
    their shard; all_to_all exchanges capacity buffers both ways (the
    reference's autograd All2All, base_layer.py:101-120)."""
    E = w1.shape[0]
    ep = mesh.shape["expert"]
    local_e = E // ep

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("expert"), P(), P("expert"), P("expert")),
        out_specs=(P("expert"), P()),
        check_vma=False,
    )
    def run(xs, rw, w1s, w2s):
        n_local, D = xs.shape
        capacity = max(int(capacity_factor * n_local / E), 1)
        logits = xs.astype(jnp.float32) @ rw.astype(jnp.float32)
        expert_idx, gate, slot = top1_routing(logits, capacity)
        keep = slot < capacity
        disp = (
            jax.nn.one_hot(expert_idx, E, dtype=xs.dtype)[:, :, None]
            * jax.nn.one_hot(jnp.where(keep, slot, capacity), capacity + 1, dtype=xs.dtype)[:, None, :capacity]
        )
        buf = jnp.einsum("nd,nec->ecd", xs, disp)                  # (E, C, D)
        # exchange: each shard keeps its local experts' buffers from everyone
        buf = buf.reshape(ep, local_e, capacity, D)
        buf = jax.lax.all_to_all(buf, "expert", split_axis=0, concat_axis=1, tiled=False)
        # (ep_src, local_e, C, D) tokens from every source shard
        buf = buf.reshape(local_e, ep * capacity, D)
        h = activation(jnp.einsum("ecd,edh->ech", buf, w1s.astype(xs.dtype)))
        ys = jnp.einsum("ech,ehd->ecd", h, w2s.astype(xs.dtype))
        ys = ys.reshape(ep, local_e, capacity, D)
        ys = jax.lax.all_to_all(ys, "expert", split_axis=0, concat_axis=1, tiled=False)
        ys = ys.reshape(local_e * ep, capacity, D)  # back to (E, C, D) local tokens
        out = jnp.einsum("ecd,nec->nd", ys, disp)
        out = out * gate.astype(xs.dtype)[:, None]
        aux = jax.lax.pmean(aux_load_balance_loss(logits, expert_idx), "expert")
        return out, aux

    return run(x, router_w, w1, w2)
