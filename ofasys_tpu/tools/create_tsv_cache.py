"""Pre-build line indexes for TSV datasets (reference tools/create_tsv_cache.py):
``python -m ofasys_tpu.tools.create_tsv_cache a.tsv b.tsv ...`` warms the
native line_locate cache so dataloader workers never race on index builds."""

import sys

from ofasys_tpu.io.reader.file_reader import build_line_index


def main(paths):
    for p in paths:
        offsets = build_line_index(p)
        print(f"{p}: {len(offsets) - 1} lines indexed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
