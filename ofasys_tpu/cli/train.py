"""Training CLI (reference ofasys/cli/train.py): two entry styles converge
on one build path —

  YAML:   python -m ofasys_tpu.cli.train cfg.yaml [--set a.b=v]
  flags:  python -m ofasys_tpu.cli.train --ofasys.task=caption \\
              --ofasys.task.caption.dataset.train_data=data.tsv \\
              --ofasys.model.arch=base --ofasys.optimization.lr=[1e-4]
"""

import sys


def main(argv):
    if any(a.startswith("--ofasys.") for a in argv):
        from ofasys_tpu.configure.options import parse_args_and_build
        from ofasys_tpu.parallel.distributed import distributed_init

        distributed_init()
        trainer, model, tasks = parse_args_and_build(argv)
        trainer.fit(model, tasks)
        return 0
    from ofasys_tpu.launch import main as launch_main

    return launch_main(argv)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
