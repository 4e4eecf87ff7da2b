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


def save_checkpoint(
    save_dir: str,
    name: str,
    state: Any,                       # TrainState pytree
    meta: Optional[Dict[str, Any]] = None,
    keep_last: int = -1,
    is_best: bool = False,
):
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(save_dir), name)
    ocp = _ocp()
    ckptr = ocp.PyTreeCheckpointer()
    tmp = path + ".tmp"
    _remove(tmp)
    ckptr.save(tmp, jax.device_get(state))
    # path may be a symlink left by _mirror (e.g. the final explicit
    # checkpoint_last save after interval saves) — rmtree raises on symlinks
    _remove(path)
    os.rename(tmp, path)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    # maintain checkpoint_last symlink-style copy
    last = os.path.join(save_dir, "checkpoint_last")
    if name != "checkpoint_last":
        _mirror(path, last)
    if is_best:
        _mirror(path, os.path.join(save_dir, "checkpoint_best"))
    if keep_last > 0:
        _prune(save_dir, keep_last)


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


def _prune(save_dir: str, keep: int):
    pat = re.compile(r"^checkpoint_(\d+)_(\d+)$")
    cands = []
    for n in os.listdir(save_dir):
        m = pat.match(n)
        if m:
            cands.append((int(m.group(2)), n))
    cands.sort(reverse=True)
    for _, n in cands[keep:]:
        p = os.path.join(save_dir, n)
        shutil.rmtree(p, ignore_errors=True)
        if os.path.exists(p + ".meta.json"):
            os.remove(p + ".meta.json")


def load_checkpoint(path: str, target: Optional[Any] = None):
    """Returns (state, meta). ``target`` provides structure/dtypes for
    restore (required for exact dtype round-trip)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    if os.path.islink(path):
        path = os.readlink(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        kwargs = {"item": jax.device_get(target)}
        state = ckptr.restore(path, **kwargs)
    else:
        state = ckptr.restore(path)
    meta = None
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_checkpoint(save_dir: str) -> Optional[str]:
    last = os.path.join(save_dir, "checkpoint_last")
    return last if os.path.exists(last) else None
