"""Parameter/optimizer sharding rules.

One rule table replaces the reference's DDP/FSDP/ZeRO wrapper classes
(distributed/distributed_model_dispatcher.py:25, fully_sharded_data_parallel.py,
optim/shard.py): a leaf's PartitionSpec is chosen by regex match on its tree
path, GSPMD does the rest. Because optimizer moments mirror the param tree,
the same rules shard optax state for free (ZeRO-1/3 become one code path).

Megatron-style tensor layout:
  column-parallel (output dim on 'tensor'):  q/k/v_proj, fc1   -> P(fsdp, tensor)
  row-parallel   (input dim on 'tensor'):    out_proj, fc2     -> P(tensor, fsdp)
  token embedding (V, E): vocab on 'tensor', E on 'fsdp'       -> P(tensor, fsdp)
XLA inserts the psum after row-parallel matmuls and at the logits — the
collectives the reference issued by hand via NCCL (distributed/utils.py:467+).
"""

from __future__ import annotations

import re
from typing import Any, List, Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec factory by rank). First match wins; default = replicated.
DEFAULT_RULES: List[Tuple[str, Any]] = [
    # attention projections: (E_in, E_out)
    (r"(q_proj|k_proj|v_proj)/kernel$", P("fsdp", "tensor")),
    (r"(q_proj|k_proj|v_proj)/bias$", P("tensor")),
    (r"out_proj/kernel$", P("tensor", "fsdp")),
    (r"out_proj/bias$", P()),
    # FFN
    (r"(fc1|experts_fc1_\d+)/kernel$", P("fsdp", "tensor")),
    (r"(fc1|experts_fc1_\d+)/bias$", P("tensor")),
    (r"(fc2|experts_fc2_\d+)/kernel$", P("tensor", "fsdp")),
    (r"(fc2|experts_fc2_\d+)/bias$", P()),
    # shared token embedding (V, E)
    (r"embed_tokens/embedding$", P("tensor", "fsdp")),
    # learned positions / type embeddings: small, shard E over fsdp only
    (r"embed_positions/embedding$", P(None, "fsdp")),
    (r"embed_image_positions/embedding$", P(None, "fsdp")),
    # abs-pos bias projections behave like attention projections
    (r"(pos_q_linear|pos_k_linear|cross_pos_q_linear|cross_pos_k_linear)/kernel$", P("fsdp", "tensor")),
    (r"(pos_q_linear|pos_k_linear|cross_pos_q_linear|cross_pos_k_linear)/bias$", P("tensor")),
    # relative-position tables (n_tables, buckets, heads): heads on tensor
    (r"rel_pos_table$", P(None, None, "tensor")),
    # per-head scaling
    (r"c_attn$", P("tensor")),
    # MoE expert weights (E, D, H)/(E, H, D): experts over the 'expert'
    # axis only — matching moe_ffn_sharded's shard_map in_specs exactly, so
    # entering the expert region never reshards; router stays replicated
    (r"moe_ffn/moe_w[12]$", P("expert")),
    # int8 serving kernels (ops/quant.py quantize_for_serving): the 'qkern'
    # collection mirrors each fp32 kernel as <name>/q (same (in, out) layout,
    # so the same Megatron placement applies) + <name>/scale (per-OUT-channel,
    # so it shards with the kernel's output axis) — sharded int8 serving
    # then splits the halved weight bytes across chips too
    (r"(q_proj|k_proj|v_proj|fc1|experts_fc1_\d+|pos_q_linear|pos_k_linear|cross_pos_q_linear|cross_pos_k_linear)/q$", P("fsdp", "tensor")),
    (r"(q_proj|k_proj|v_proj|fc1|experts_fc1_\d+|pos_q_linear|pos_k_linear|cross_pos_q_linear|cross_pos_k_linear)/scale$", P("tensor")),
    (r"(out_proj|fc2|experts_fc2_\d+)/q$", P("tensor", "fsdp")),
    (r"(out_proj|fc2|experts_fc2_\d+)/scale$", P("fsdp")),
    # int8 tied-logits table is stored pre-transposed (E, V) — see attend()
    (r"embed_tokens/q$", P("fsdp", "tensor")),
    (r"embed_tokens/scale$", P("tensor")),
    # layernorms, w_resid, type embeddings: replicated
    (r".*", P()),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_path(path: str, rules=None) -> P:
    for pattern, spec in rules or DEFAULT_RULES:
        if re.search(pattern, path):
            return spec
    return P()


def _fit_spec(spec: P, ndim: int) -> P:
    """Trim/pad a spec to the leaf's rank (scalars -> fully replicated)."""
    entries = list(spec)
    if len(entries) > ndim:
        entries = entries[:ndim]
    while len(entries) < ndim:
        entries.append(None)
    return P(*entries)


def tree_shardings(tree: Any, mesh: Mesh, rules=None, log_unmatched: bool = False):
    """NamedSharding pytree for an arbitrary state tree (params, optimizer
    moments, EMA): path-based first-match rules, rank-adjusted."""

    def leaf_sharding(path, leaf):
        ndim = getattr(leaf, "ndim", 0)
        p = _path_str(path)
        spec = spec_for_path(p, rules)
        if "layers_scan" in p and ndim > 0:
            # scan-over-layers stacks params with a leading layer axis:
            # shard it over the pipeline axis (size-1 'pipe' == replicated)
            # and shift the rule's axes right by one
            pipe = "pipe" if "pipe" in mesh.shape else None
            spec = P(pipe, *spec)
            if len(list(spec)) > ndim:
                spec = P(*list(spec)[:ndim])
        spec = _fit_spec(spec, ndim)
        if ndim > 0:
            # jax requires every sharded dim to divide by its axis size;
            # axes that don't divide fall back to replicated for that dim
            # (e.g. zero1's blanket data-axis rule on small moment leaves)
            entries = []
            for dim, ax in zip(leaf.shape, spec):
                if ax is None:
                    entries.append(None)
                    continue
                axes = ax if isinstance(ax, tuple) else (ax,)
                n = 1
                for a in axes:
                    n *= mesh.shape[a]
                entries.append(ax if n > 0 and dim % n == 0 else None)
            spec = P(*entries)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf_sharding, tree)


def shard_tree(tree: Any, mesh: Mesh, rules=None):
    """Device-put a host tree onto the mesh with rule-derived shardings.
    Under multi-host JAX, every process holds an identical host copy (same
    init seed) and contributes only its addressable shards."""
    shardings = tree_shardings(tree, mesh, rules)
    if jax.process_count() > 1:
        import numpy as np

        def put(x, s):
            arr = np.asarray(x)
            return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

        return jax.tree.map(put, tree, shardings)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
