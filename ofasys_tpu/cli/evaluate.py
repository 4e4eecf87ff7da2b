"""Evaluation CLI (reference ofasys/cli/evaluate.py):
``python -m ofasys_tpu.cli.evaluate cfg.yaml --ckpt <path> [--split test]``
Runs each task's generator over the split and reports its metrics.
"""

import json
import sys

from ofasys_tpu.launch import apply_overrides, build_from_config, load_yaml_config


def main(argv):
    if not argv:
        print(__doc__)
        return 2
    path, ckpt, split = argv[0], None, "test"
    sets = []
    i = 1
    while i < len(argv):
        if argv[i] == "--ckpt":
            ckpt = argv[i + 1]; i += 2
        elif argv[i] == "--split":
            split = argv[i + 1]; i += 2
        elif argv[i] == "--set":
            sets.append(argv[i + 1]); i += 2
        else:
            i += 1
    data = apply_overrides(load_yaml_config(path), sets)
    trainer, model, tasks = build_from_config(data)

    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils import checkpoint_utils

    global_dict = Dictionary()
    for task in tasks:
        task.initialize(global_dict, is_train=False)
    global_dict.pad_to_multiple_(128)
    adaptors = []
    for task in tasks:
        for a in task.required_adaptors():
            if a not in adaptors:
                adaptors.append(a)
    model.initialize(global_dict, active_adaptors=tuple(adaptors))
    import jax

    raw, meta = checkpoint_utils.load_checkpoint(ckpt)
    params = raw["params"] if isinstance(raw, dict) and "params" in raw else raw
    results = {}
    for task in tasks:
        results[task.name] = task.evaluate(model, params, split=split)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
