"""ctypes bridge to the native GPT-2 BPE encoder (native/bpe_encode.cpp).

``NativeGPT2BPE`` is a drop-in ``GPT2BPE``: same assets, same ids (the C++
scanner's unicode tables are generated from the same ``regex`` module —
tools/gen_unicode_tables.py — and its merge loop mirrors ``GPT2BPE._bpe``).
Encoding runs ~10-40x faster, which matters for the TSV-cache builder and
streaming text pipelines (reference gpt2_bpe is pure Python too; this is the
framework's native data-plane component, like the reference's C++ extensions
under ofasys/module/extensions).

``build()`` returns None when the shared library is missing (hermetic
installs fall back to the Python encoder transparently).
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import List, Optional

from ofasys_tpu.preprocessor.tokenizer.gpt2_bpe import GPT2BPE

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "..", "native", "libbpe_encode.so"),
    os.path.join(os.path.dirname(__file__), "libbpe_encode.so"),
]


def _load_lib() -> Optional[ctypes.CDLL]:
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            lib.ofa_bpe_create.restype = ctypes.c_void_p
            lib.ofa_bpe_create.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.ofa_bpe_free.argtypes = [ctypes.c_void_p]
            lib.ofa_bpe_encode.restype = ctypes.c_int64
            lib.ofa_bpe_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            return lib
    return None


def _serialize_tables(bpe: GPT2BPE) -> bytes:
    """Vocab + merges, translated from the byte->unicode remapped strings the
    Python tables use back into RAW BYTE strings (the remap is a per-byte
    bijection, so the native side can merge in plain byte space)."""
    bd = bpe.byte_decoder

    def to_bytes(tok: str) -> bytes:
        return bytes(bd[c] for c in tok)

    parts = []
    n_tok = max(bpe.encoder.values()) + 1
    by_id = [""] * n_tok
    for tok, idx in bpe.encoder.items():
        by_id[idx] = tok
    parts.append(struct.pack("<I", n_tok))
    for tok in by_id:
        b = to_bytes(tok)
        parts.append(struct.pack("<I", len(b)))
        parts.append(b)
    merges = sorted(bpe.bpe_ranks.items(), key=lambda kv: kv[1])
    parts.append(struct.pack("<I", len(merges)))
    for (a, b), _rank in merges:
        ab, bb = to_bytes(a), to_bytes(b)
        parts.append(struct.pack("<I", len(ab)))
        parts.append(ab)
        parts.append(struct.pack("<I", len(bb)))
        parts.append(bb)
    return b"".join(parts)


class NativeGPT2BPE(GPT2BPE):
    """GPT2BPE whose ``encode`` runs in the C++ library. ``decode`` and all
    tables stay Python-side (decode is cold)."""

    def __init__(self, encoder_json: str, vocab_bpe: str):
        super().__init__(encoder_json, vocab_bpe)
        self._lib = _load_lib()
        if self._lib is None:
            raise FileNotFoundError(
                "libbpe_encode.so not built (run `make -C native`)"
            )
        blob = _serialize_tables(self)
        self._handle = self._lib.ofa_bpe_create(blob, len(blob))
        if not self._handle:
            raise RuntimeError("ofa_bpe_create rejected the vocab blob")
        self._buf_n = 4096
        self._buf = (ctypes.c_int32 * self._buf_n)()

    def encode(self, text: str) -> List[int]:
        raw = text.encode("utf-8")
        n = self._lib.ofa_bpe_encode(self._handle, raw, len(raw), self._buf, self._buf_n)
        if n < -1:
            self._buf_n = -n
            self._buf = (ctypes.c_int32 * self._buf_n)()
            n = self._lib.ofa_bpe_encode(self._handle, raw, len(raw), self._buf, self._buf_n)
        if n < 0:
            raise RuntimeError("native BPE encode failed")
        ids = self._buf[:n]
        if any(i < 0 for i in ids):
            # symbol missing from the vocab (truncated assets): fall back
            return super().encode(text)
        return ids

    def __del__(self):
        lib = getattr(self, "_lib", None)
        h = getattr(self, "_handle", None)
        if lib is not None and h:
            try:
                lib.ofa_bpe_free(h)
            except Exception:
                pass


def build(encoder_json: str, vocab_bpe: str) -> Optional[NativeGPT2BPE]:
    """NativeGPT2BPE when the shared library exists, else None."""
    if _load_lib() is None:
        return None
    return NativeGPT2BPE(encoder_json, vocab_bpe)
