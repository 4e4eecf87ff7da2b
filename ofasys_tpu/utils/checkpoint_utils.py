"""Checkpoint save/load (reference ofasys/utils/checkpoint_utils.py, 753 LoC).

orbax for the array state (sharded, multi-host safe), JSON sidecar for the
python state (configs, dictionary, iterator positions, meters) — together
they reproduce the reference's resume contract (engine/trainer.py:474-517):
model + optimizer + step + per-task iterator state + vocab + task configs.

Rotation policy: checkpoint_last + checkpoint_best + epoch/update-named
checkpoints with keep-N pruning (reference save_checkpoint:34-180).
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


_async_ckptr = None


def _get_async_ckptr():
    global _async_ckptr
    if _async_ckptr is None:
        ocp = _ocp()
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_async_saves():
    """Block until every in-flight async checkpoint write has committed.
    Call before loading a just-saved checkpoint and at the end of fit."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(
    save_dir: str,
    name: str,
    state: Any,                       # TrainState pytree
    meta: Optional[Dict[str, Any]] = None,
    keep_last: int = -1,
    is_best: bool = False,
    async_save: bool = False,
    keep_best: int = -1,            # rotate checkpoint_best_<tag> mirrors
    best_tag: int = 0,
    keep_epochs: int = -1,          # rotate checkpoint_e<N> epoch saves
    mirror_last: bool = True,       # maintain the checkpoint_last mirror
    keep_pattern: int = -1,         # never prune updates divisible by this
):
    """``async_save``: the reference ships async checkpoint writes (iopath,
    utils/checkpoint_utils.py:433); here orbax's AsyncCheckpointer blocks
    only until arrays are copied off the device (donation-safe — the train
    loop may immediately overwrite device buffers), then serializes to disk
    in a background thread and finalizes the directory atomically."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(save_dir), name)
    ocp = _ocp()
    if async_save:
        ckptr = _get_async_ckptr()
        ckptr.wait_until_finished()   # one in-flight save at a time
        _remove(path)
        # orbax writes to its own tmp dir and renames on finalize; the
        # mirror symlinks below may dangle until the background commit
        ckptr.save(path, state)
    else:
        ckptr = ocp.PyTreeCheckpointer()
        tmp = path + ".tmp"
        _remove(tmp)
        # state goes to orbax as-is: jax.Array leaves are serialized shard-by
        # -shard via tensorstore (the reference's per-rank -shard{rank} files,
        # engine/trainer.py:345-350 / use_sharded_state,
        # distributed/fully_sharded_data_parallel.py:23-128, fall out of the
        # format for free) — a mesh-sharded 10b TrainState is NEVER gathered
        # into one host array the way a full-tree jax.device_get would
        ckptr.save(tmp, state)
        # path may be a symlink left by _mirror (e.g. the final explicit
        # checkpoint_last save after interval saves) — rmtree raises on symlinks
        _remove(path)
        os.rename(tmp, path)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    # maintain checkpoint_last symlink-style copy
    last = os.path.join(save_dir, "checkpoint_last")
    if name != "checkpoint_last" and mirror_last:
        _mirror(path, last)
    if is_best:
        _mirror(path, os.path.join(save_dir, "checkpoint_best"))
        if keep_best > 0:
            _mirror(path, os.path.join(save_dir, f"checkpoint_best_{best_tag}"))
            _prune(save_dir, keep_best, pattern=r"^checkpoint_best_(\d+)$")
    # under async_save the just-written checkpoint may not be on disk yet
    # (orbax finalizes in the background) — count it explicitly so rotation
    # keeps exactly N including the in-flight one
    if keep_last > 0:
        _prune(save_dir, keep_last, extra=name, keep_multiple=keep_pattern)
    if keep_epochs > 0:
        _prune(save_dir, keep_epochs, pattern=r"^checkpoint_e(\d+)$", extra=name)


def _remove(path: str):
    if os.path.islink(path) or os.path.isfile(path):
        os.remove(path)
    elif os.path.isdir(path):
        shutil.rmtree(path)


def _mirror(src: str, dst: str):
    _remove(dst)
    os.symlink(os.path.abspath(src), dst)
    meta = src + ".meta.json"
    if os.path.exists(meta):
        shutil.copy(meta, dst + ".meta.json")


def _prune(save_dir: str, keep: int, pattern: str = r"^checkpoint_(\d+)_(\d+)$",
           extra: Optional[str] = None, keep_multiple: int = -1):
    pat = re.compile(pattern)
    names = set(os.listdir(save_dir))
    if extra is not None:
        names.add(extra)
    cands = []
    for n in names:
        m = pat.match(n)
        if m:
            cands.append((int(m.group(m.lastindex)), n))
    cands.sort(reverse=True)
    if keep_multiple > 0:
        # reference keep_interval_updates_pattern (checkpoint_utils.py:99):
        # updates divisible by the pattern survive rotation indefinitely
        cands = [(t, n) for t, n in cands if t % keep_multiple != 0]
    for _, n in cands[keep:]:
        p = os.path.join(save_dir, n)
        if os.path.islink(p):
            os.remove(p)
        else:
            shutil.rmtree(p, ignore_errors=True)
        if os.path.exists(p + ".meta.json"):
            os.remove(p + ".meta.json")


def load_checkpoint(path: str, target: Optional[Any] = None):
    """Returns (state, meta). ``target`` provides structure/dtypes for
    restore (required for exact dtype round-trip).

    Sharded restore: when ``target`` carries jax.Array leaves, each leaf is
    restored DIRECTLY to that leaf's sharding (tensorstore reads only the
    slices each device owns — no full-array host materialization), so a
    checkpoint saved on one mesh restores onto any other mesh shape simply
    by passing a target laid out on the new mesh (the reference's ZeRO
    broadcast-sharded load, engine/trainer.py:568-577, without the
    same-world-size restriction). Numpy/host targets restore to host arrays
    as before."""
    wait_for_async_saves()   # same-process save-then-load sees committed data
    ocp = _ocp()
    path = os.path.abspath(path)
    if os.path.islink(path):
        path = os.readlink(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        if any(isinstance(l, jax.Array) for l in jax.tree.leaves(target)):
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
                if isinstance(x, jax.Array) else x,
                target,
            )
            restore_args = ocp.checkpoint_utils.construct_restore_args(abstract)
            state = ckptr.restore(path, item=abstract, restore_args=restore_args)
        else:
            # host target: force numpy restore so a checkpoint written with
            # sharded jax.Arrays on some other mesh/topology (e.g. a pod
            # training run) loads on any box — without this orbax tries to
            # rebuild the SAVED shardings, whose devices don't exist here
            host = jax.device_get(target)
            restore_args = jax.tree.map(
                lambda x: ocp.RestoreArgs(restore_type=np.ndarray,
                                          dtype=getattr(x, "dtype", None)),
                host,
            )
            state = ckptr.restore(path, item=host, restore_args=restore_args)
    else:
        # structure from checkpoint metadata; every leaf restored as numpy
        # (a sharded save records its mesh in the metadata — restoring
        # without explicit numpy RestoreArgs would try to rebuild devices
        # that may not exist in this process)
        meta_tree = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree
        )
        state = ckptr.restore(path, restore_args=restore_args)
    meta = None
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def load_ema_from_checkpoint(path: str, target: Optional[Any] = None):
    """Return the EMA shadow weights of a checkpoint as a plain params tree
    (reference utils/checkpoint_utils.py:712 load_ema_from_checkpoint —
    there it rewrites extra_state['ema'] into the model key; here the EMA
    tree IS params-shaped already). Raises if the run trained without
    ``ema.store_ema``."""
    state, meta = load_checkpoint(path, target=target)
    ema = state.get("ema_params") if isinstance(state, dict) else getattr(state, "ema_params", None)
    if ema is None:
        raise ValueError(f"checkpoint {path} has no EMA shadow (train with ema.store_ema=True)")
    return ema, meta


def latest_checkpoint(save_dir: str) -> Optional[str]:
    last = os.path.join(save_dir, "checkpoint_last")
    return last if os.path.exists(last) else None


def read_meta(path: str) -> Optional[Dict[str, Any]]:
    """Read only the JSON sidecar (cheap pre-restore schema checks)."""
    path = os.path.abspath(path)
    if os.path.islink(path):
        path = os.readlink(path)
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None


# ------------------------------------------------------- checkpoint surgery
# (reference model/ofa.py:443-511 upgrade_state_dict_named/update_embedding,
#  utils/checkpoint_utils.py:465 _upgrade_state_dict, :579 prune_state_dict)

def remap_vocab_rows(state: Any, saved_symbols: List[str], new_dict, seed: int = 0) -> Any:
    """Vocab-remap on resume (reference update_embedding, model/ofa.py:495-511):
    when the global dictionary changed between save and resume (a new task
    grew the vocab), re-scatter every ``embed_tokens/embedding``-shaped leaf
    from old row order to new. Old tokens keep their learned rows
    bit-identically; new tokens get normal(0, E^-0.5) rows in params/EMA and
    zero rows in optimizer moments; dropped tokens are discarded."""
    new_V = len(new_dict)
    old_rows = []
    new_rows = []
    for old_idx, sym in enumerate(saved_symbols):
        ni = new_dict.indices.get(sym)
        if ni is not None:
            old_rows.append(old_idx)
            new_rows.append(ni)
    old_rows = np.asarray(old_rows, np.int64)
    new_rows = np.asarray(new_rows, np.int64)

    def remap(path, leaf):
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
                     for k in path)
        if not p.endswith("embed_tokens/embedding") or getattr(leaf, "ndim", 0) != 2:
            return leaf
        if leaf.shape[0] == new_V:
            return leaf
        E = leaf.shape[1]
        arr = np.asarray(leaf)
        is_params = "params" in p.split("/") or "ema_params" in p.split("/")
        if is_params:
            rng = np.random.default_rng(seed)
            out = (rng.standard_normal((new_V, E)) * E ** -0.5).astype(arr.dtype)
        else:  # optimizer moments: fresh rows start at zero
            out = np.zeros((new_V, E), arr.dtype)
        out[new_rows] = arr[old_rows]
        return out

    return jax.tree_util.tree_map_with_path(remap, state)


def resize_vocab_rows(state: Any, V: int) -> Any:
    """Zero-filled copy of ``state`` with every embed_tokens/embedding-shaped
    leaf resized to V rows — the restore *target* when the saved checkpoint
    was written under a different vocabulary size."""

    def resize(path, leaf):
        p = "/".join(str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
                     for k in path)
        if not p.endswith("embed_tokens/embedding") or getattr(leaf, "ndim", 0) != 2:
            return leaf
        return np.zeros((V, leaf.shape[1]), np.asarray(leaf).dtype)

    return jax.tree_util.tree_map_with_path(resize, state)


def prune_state_dict(state: Any, keep: Optional[List[str]] = None,
                     drop: Optional[List[str]] = None) -> Any:
    """Drop param subtrees by path substring (reference prune_state_dict,
    utils/checkpoint_utils.py:579 — used there for layerdrop-pruned
    inference models). Returns a new tree with dropped leaves replaced by
    None (flax tolerates missing optional modules)."""
    import jax.tree_util as jtu

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                p = f"{prefix}/{k}" if prefix else str(k)
                if drop and any(d in p for d in drop):
                    continue
                if keep and not isinstance(v, dict) and not any(s in p for s in keep):
                    continue
                w = walk(v, p)
                if w is not None and (not isinstance(w, dict) or w):
                    out[k] = w
            return out
        return tree

    return walk(state)


def upgrade_state_meta(meta: Dict[str, Any]) -> Dict[str, Any]:
    """Legacy-checkpoint upgrader hook (reference _upgrade_state_dict,
    utils/checkpoint_utils.py:465): normalize older sidecar layouts in place
    so resume code only sees the current schema."""
    if meta is None:
        return meta
    # v0 sidecars stored the dictionary under "dictionary"
    if "global_dict" not in meta and "dictionary" in meta:
        meta["global_dict"] = meta.pop("dictionary")
    # iterator states were once a flat list ordered like tasks
    its = meta.get("iterator_states")
    if isinstance(its, list):
        meta["iterator_states"] = {str(i): s for i, s in enumerate(its)}
    return meta
