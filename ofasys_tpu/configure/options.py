"""fairseq-style flag bridge (reference ofasys/configure/options.py +
parser.py + config_store.add_args/import_args): the reference's second
config entry style next to YAML.

Flag grammar (values YAML-parsed)::

    --ofasys.task=caption,text_infilling        activate task nodes
    --ofasys.task.caption.dataset.batch_size=8  per-task override
    --ofasys.model.arch=base                    model override
    --ofasys.optimization.lr=[0.0001]           trainer override
    --ofasys.checkpoint.save_dir=/tmp/ck        trainer override

``parse_flags`` converts a flag list into the SAME config dict the YAML
launcher consumes, so both entry styles share one build path
(launch.build_from_config)."""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any, Dict, List, Optional, Tuple


def parse_flags(argv: List[str]) -> Tuple[Dict[str, Any], List[str]]:
    """Returns (config data dict, leftover argv)."""
    import yaml

    data: Dict[str, Any] = {"trainer": {}, "model": {}, "tasks": {}}
    rest: List[str] = []
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--ofasys."):
            rest.append(tok)
            i += 1
            continue
        key = tok[len("--ofasys."):]
        if "=" in key:
            key, _, raw = key.partition("=")
        else:
            i += 1
            if i >= len(argv):
                raise ValueError(f"flag {tok} expects a value")
            raw = argv[i]
        try:
            val = yaml.safe_load(raw)
        except Exception:
            val = raw  # raw strings (instruction templates) are not YAML
        parts = key.split(".")
        if parts[0] == "task" and len(parts) == 1:
            # activation list: --ofasys.task=caption,gigaword
            for name in str(raw).split(","):
                name = name.strip()
                if name:
                    data["tasks"].setdefault(name, {})["task"] = name
        elif parts[0] == "task":
            name = parts[1]
            node = data["tasks"].setdefault(name, {})
            node.setdefault("task", name)
            _assign(node, parts[2:], val)
        elif parts[0] == "model":
            _assign(data["model"], parts[1:], val)
        else:
            _assign(data["trainer"], parts, val)
        i += 1
    return data, rest


def _assign(node: Dict[str, Any], parts: List[str], val: Any):
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = val


def _add_dataclass_args(parser: argparse.ArgumentParser, obj, prefix: str):
    # walk INSTANCES (configs.py uses string annotations, so f.type is a str)
    for f in dataclasses.fields(obj):
        val = getattr(obj, f.name)
        if dataclasses.is_dataclass(val):
            _add_dataclass_args(parser, val, f"{prefix}.{f.name}" if prefix else f.name)
        else:
            try:
                parser.add_argument(
                    f"--ofasys.{prefix}.{f.name}" if prefix else f"--ofasys.{f.name}",
                    default=None, help=f"(default: {val!r})",
                )
            except argparse.ArgumentError:
                pass


def get_training_parser() -> argparse.ArgumentParser:
    """Argparse view of the config tree — used for --help; actual parsing
    goes through parse_flags so dynamically-registered task nodes work
    (reference options.get_training_parser)."""
    from ofasys_tpu.configure.configs import TrainerConfig

    parser = argparse.ArgumentParser(
        "ofasys_tpu.cli.train",
        description="Train via fairseq-style flags (--ofasys.*) or a YAML config.",
    )
    parser.add_argument("config", nargs="?", help="optional YAML config path")
    parser.add_argument("--ofasys.task", dest="_task", default=None,
                        help="comma list of task nodes to activate")
    _add_dataclass_args(parser, TrainerConfig(), "")
    return parser


def parse_args_and_build(argv: List[str]):
    """Flags -> (trainer, model, tasks) via the shared YAML build path; a
    positional YAML path merges under the flags (flags win)."""
    from ofasys_tpu.launch import _deep_merge, build_from_config, load_yaml_config

    data, rest = parse_flags(argv)
    yaml_paths = [a for a in rest if not a.startswith("-")]
    if yaml_paths:
        base = load_yaml_config(yaml_paths[0])
        data = _deep_merge(base, {k: v for k, v in data.items() if v})
    return build_from_config(data)
