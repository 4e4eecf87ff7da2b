"""Training CLI: ``python -m ofasys_tpu.cli.train cfg.yaml [--set k=v]``
(reference ofasys/cli/train.py; the launcher handles YAML merge)."""

import sys

from ofasys_tpu.launch import main

if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
