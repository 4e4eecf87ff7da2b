"""YAML launcher (reference ofasys/launch.py:258-348).

``python -m ofasys_tpu.launch cfg.yaml [--set a.b.c=v ...]``

The reference merges YAMLs (_include inheritance, ${var} substitution),
base64-encodes the config and shells out to torch.distributed.launch with
one process per GPU. On TPU there is nothing to spawn: single-controller JAX
sees every local device; multi-host jobs just run the same script per host
with jax.distributed.initialize().

YAML schema::

    _include: base.yaml          # optional parent (deep-merged under self)
    env: {name: value}           # ${name} substitutions
    model: {arch: base, ...}     # GeneralistModelConfig fields
    trainer: {...}               # TrainerConfig fields
    tasks:
      caption:
        instruction: {template: '[IMAGE:img] ... -> [TEXT:cap]'}
        dataset: {train_data: path.tsv, batch_size: 8}
"""

from __future__ import annotations

import os
import re
import sys
from typing import Any, Dict, List, Optional

_VAR_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _deep_merge(base: Dict, override: Dict) -> Dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _substitute(obj: Any, env: Dict[str, str]) -> Any:
    if isinstance(obj, str):
        return _VAR_RE.sub(lambda m: str(env.get(m.group(1), os.environ.get(m.group(1), m.group(0)))), obj)
    if isinstance(obj, dict):
        return {k: _substitute(v, env) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute(v, env) for v in obj]
    return obj


def load_yaml_config(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    include = data.pop("_include", None)
    if include:
        parent = load_yaml_config(os.path.join(os.path.dirname(path), include))
        data = _deep_merge(parent, data)
    env = data.pop("env", {}) or {}
    return _substitute(data, env)


def apply_overrides(data: Dict[str, Any], sets: List[str]) -> Dict[str, Any]:
    for item in sets:
        key, _, val = item.partition("=")
        node = data
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        import yaml

        node[parts[-1]] = yaml.safe_load(val)
    return data


def build_from_config(data: Dict[str, Any]):
    """Config dict -> (trainer, model, tasks)."""
    from ofasys_tpu.configure import ConfigStore, TrainerConfig, from_dict
    from ofasys_tpu.model.ofa import GeneralistModel
    from ofasys_tpu.task.base import Task

    trainer_cfg = from_dict(TrainerConfig, data.get("trainer", {}))
    if trainer_cfg.common.user_dir:
        import_user_dir(trainer_cfg.common.user_dir)
    model_kwargs = dict(data.get("model", {}))
    arch = model_kwargs.pop("arch", None)
    model = GeneralistModel(arch=arch)
    if model_kwargs:
        model.cfg.update(**_flatten(model_kwargs))

    tasks = []
    for name, tcfg in (data.get("tasks", {}) or {}).items():
        registry_name = tcfg.pop("task", "default") if isinstance(tcfg, dict) else "default"
        node = ConfigStore().get("ofasys.task", registry_name)
        # merge overrides into the config BEFORE construction: task
        # __init__s derive templates/metrics from config fields (e.g.
        # GlueTask reads cfg.subtask), so post-hoc cfg.update is too late
        import copy

        cfg = copy.deepcopy(node.config)
        crit_args = None
        if isinstance(tcfg, dict):
            if isinstance(tcfg.get("criterion"), dict):
                # `criterion: {name: ..., label_smoothing: 0.2, ...}` — split
                # the registry name from the field overrides
                # (TaskConfig.criterion_args). An explicit criterion_args
                # mapping merges UNDER these (dict-criterion wins on clash)
                c = dict(tcfg["criterion"])
                tcfg["criterion"] = c.pop("name", cfg.criterion)
                tcfg["criterion_args"] = {**(tcfg.get("criterion_args") or {}), **c}
            # keep the args as ONE dict value (dotted update would try to
            # navigate into plain-dict fields)
            crit_args = tcfg.pop("criterion_args", None)
        if tcfg:
            cfg.update(**_flatten(tcfg))
        if crit_args:
            cfg.criterion_args = dict(crit_args)
        task = node.target_cls(cfg, name=name)
        tasks.append(task)

    from ofasys_tpu.engine.trainer import Trainer

    return Trainer(trainer_cfg), model, tasks


def import_user_dir(path: str):
    """Import every module in ``path`` so user @register_config /
    register_config side effects fire before tasks are built (reference
    common.user_dir, utils/__init__.py import_user_module)."""
    import importlib.util

    path = os.path.abspath(os.path.expanduser(path))
    if not os.path.isdir(path):
        raise FileNotFoundError(f"user_dir {path!r} is not a directory")
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".py") or fname.startswith("_"):
            continue
        mod_name = f"ofasys_user_{fname[:-3]}"
        spec = importlib.util.spec_from_file_location(mod_name, os.path.join(path, fname))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = mod
        spec.loader.exec_module(mod)


def _flatten(d: Dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def main(argv: Optional[List[str]] = None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    path = argv[0]
    sets = []
    i = 1
    while i < len(argv):
        if argv[i] == "--set":
            sets.append(argv[i + 1])
            i += 2
        else:
            i += 1
    data = apply_overrides(load_yaml_config(path), sets)
    # multi-host bootstrap (env-driven; no-op single-process) BEFORE any
    # backend use so jax.devices() spans the slice
    from ofasys_tpu.parallel.distributed import distributed_init

    distributed_init()
    trainer, model, tasks = build_from_config(data)
    trainer.fit(model, tasks)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
