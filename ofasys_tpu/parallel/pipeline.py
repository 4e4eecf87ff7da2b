"""GPipe-style pipeline parallelism over the ``pipe`` mesh axis.

The reference shipped only config scaffolding for pipeline parallelism
(ofasys/configure/configs.py:306-351 — pipeline_model_parallel fields that
engine/trainer.py never consumes); this is a real TPU implementation.

Design (TPU-first, scaling-book pipelining recipe):
  * layers are stacked along a leading layer axis (the scan-over-layers
    param layout, model/transformer.py layers_scan) and that axis is sharded
    over the ``pipe`` mesh axis — each stage physically holds L/S layers.
  * the batch splits into n_micro microbatches; activations rotate stage to
    stage with ``lax.ppermute`` inside a ``lax.scan`` over
    T = n_micro + S - 1 ticks (the GPipe schedule; bubble fraction
    (S-1)/T). Backward runs the reverse schedule automatically via the
    transpose of ppermute/scan — no hand-written backward pipeline.
  * ``jax.shard_map`` in PARTIAL-manual mode (axis_names={'pipe'}): only the
    pipe axis is manual; data/fsdp/tensor axes stay automatic, so batch
    sharding and Megatron-style tensor parallelism inside each layer keep
    working unchanged (XLA still inserts those collectives).

Used by model/transformer.py when cfg.pipeline_stages > 1; layers must be in
scan (stacked) layout and L %% stages == 0.

Schedule choice (why GPipe and not 1F1B/interleaved): 1F1B's advantage over
GPipe is not throughput — both run n_micro + S - 1 forward ticks and the
same backward work; the bubble fraction is identical — but the activation
stash: 1F1B holds <= S microbatch activations vs GPipe's n_micro. Under JAX
autodiff the backward schedule is the transpose of the forward scan, and the
stash concern is addressed the XLA-native way instead: per-layer remat
(cfg.parallel.remat) already bounds residuals to the tick-level carries, and
raising n_micro (the bubble lever, bubble = (S-1)/(n_micro + S - 1)) costs
only O(n_micro) tick inputs, each 1/n_micro of the batch — i.e. O(1) batch
memory total. A hand-scheduled interleaved 1F1B would add a custom-vjp
pipeline with v in-flight activations per stage for an unmeasurable win on
this design; revisit only if a profile on real multi-chip hardware shows the
stash, not the bubble, binding.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

PIPE_AXIS = "pipe"


def pipeline_stack(
    mesh: Mesh,
    layer_apply: Callable,     # (layer_params, global_layer_idx, micro_idx, x_mb, micro_mb, bcast) -> x_mb
    stacked_params: Any,       # pytree; every leaf (L, ...) — layer-major stack
    x: jax.Array,              # (B, ...) activations, batch-leading
    micro_args: Any = None,    # pytree of (B, ...) arrays split with the batch (None leaves ok)
    bcast_args: Any = None,    # pytree replicated to every stage (None leaves ok)
    n_micro: int = 0,
    axis: str = PIPE_AXIS,
) -> jax.Array:
    """Run a stacked layer sequence as an S-stage GPipe pipeline.

    Semantically identical to
        for i in range(L): x = layer_apply(params[i], i, x, micro, bcast)
    but with layers sharded over ``axis`` and microbatches streamed through
    the stages. Returns the final activations, batch-major like ``x``.
    """
    S = mesh.shape[axis]
    leaves = jax.tree.leaves(stacked_params)
    L = leaves[0].shape[0]
    if S == 1:
        # degenerate pipeline: plain sequential application
        for i in range(L):
            lp = jax.tree.map(lambda a, i=i: a[i], stacked_params)
            x = layer_apply(lp, i, 0, x, micro_args, bcast_args)
        return x

    if L % S != 0:
        raise ValueError(f"pipeline: {L} layers not divisible by {S} stages")
    Lp = L // S
    B = x.shape[0]
    n_micro = n_micro or S
    if B % n_micro != 0:
        raise ValueError(f"pipeline: batch {B} not divisible by {n_micro} microbatches")
    mb = B // n_micro

    xm = x.reshape((n_micro, mb) + x.shape[1:])
    micro_m = jax.tree.map(
        lambda a: a.reshape((n_micro, mb) + a.shape[1:]), micro_args
    )

    def stage_fn(local_params, xm, micro, bcast):
        s = jax.lax.axis_index(axis)

        def apply_local(x_mb, m):
            mm = jax.tree.map(lambda a: a[m], micro)
            for l in range(Lp):
                lp = jax.tree.map(lambda a, l=l: a[l], local_params)
                x_mb = layer_apply(lp, s * Lp + l, m, x_mb, mm, bcast)
            return x_mb

        def tick(carry, t):
            state, outs = carry
            m = t - s                              # this stage's microbatch
            mc = jnp.clip(m, 0, n_micro - 1)
            inp = jnp.where(s == 0, xm[mc], state)
            out = apply_local(inp, mc)
            # the LAST stage stores finished microbatches
            store = jnp.logical_and(
                jnp.logical_and(m >= 0, m < n_micro), s == S - 1
            )
            outs = jnp.where(
                store, jax.lax.dynamic_update_index_in_dim(outs, out, mc, 0), outs
            )
            nxt = jax.lax.ppermute(out, axis, [(i, (i + 1) % S) for i in range(S)])
            return (nxt, outs), None

        init = (jnp.zeros_like(xm[0]), jnp.zeros_like(xm))
        (_, outs), _ = jax.lax.scan(
            tick, init, jnp.arange(n_micro + S - 1, dtype=jnp.int32)
        )
        return outs[None]                          # (1, n_micro, mb, ...) per stage

    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(axis),
        axis_names={axis},
        check_vma=False,
    )(stacked_params, xm, micro_m, bcast_args)
    # global (S, n_micro, mb, ...): only the last stage's slot holds results
    y = out[-1]
    return y.reshape((B,) + x.shape[1:])
