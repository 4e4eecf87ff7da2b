"""Tokenizer interface.

A tokenizer maps text <-> a list of integer ids in its OWN id space
(0..vocab_size). The text preprocessor reserves a contiguous ``<text>_i``
namespace in the global Dictionary and adds the namespace offset, so
dict_index = text_start + bpe_id with no per-symbol string lookups
(the reference stores '<text>_<id>' symbols and string-indexes each one,
preprocessor/tokenizer/gpt2_bpe.py + dictionary.py).
"""

from __future__ import annotations

from typing import List


class BaseTokenizer:
    vocab_size: int

    def encode(self, text: str) -> List[int]:
        raise NotImplementedError

    def decode(self, ids: List[int]) -> str:
        raise NotImplementedError
