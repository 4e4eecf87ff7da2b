"""Offline text tokenization (reference tools/preprocess_text.py): encode a
text file line-by-line with the configured tokenizer into an .npy id matrix
for fixed-block LM pretraining."""

import sys

import numpy as np

from ofasys_tpu.preprocessor.tokenizer.gpt2_bpe import build_tokenizer


def main(argv):
    if len(argv) < 2:
        print(__doc__)
        return 2
    src, out = argv[0], argv[1]
    tok = build_tokenizer(argv[2] if len(argv) > 2 else "bytes")
    ids = []
    with open(src) as f:
        for line in f:
            ids.extend(tok.encode(line.rstrip("\n")))
    np.save(out, np.asarray(ids, np.int32))
    print(f"{src}: {len(ids)} tokens -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
