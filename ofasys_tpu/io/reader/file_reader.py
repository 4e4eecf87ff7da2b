"""Line-indexed local file reader (reference ofasys/io/reader/file_reader.py:18-99).

Random access into huge text/TSV files via a newline-offset index built by
the native ``line_locate`` tool (native/line_locate.cpp) or a numpy mmap
scan fallback. Indexes are cached next to the data (or $OFA_CACHE_HOME)
under a flock to survive concurrent dataloader workers.
"""

from __future__ import annotations

import fcntl
import hashlib
import mmap
import os
import subprocess
from typing import Optional

import numpy as np

from ofasys_tpu.io.reader.base_reader import BaseReader

_NATIVE_BIN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))),
    "native",
    "line_locate",
)


def _cache_path(path: str) -> str:
    home = os.environ.get("OFA_CACHE_HOME", os.path.expanduser("~/.cache/ofasys_tpu"))
    os.makedirs(home, exist_ok=True)
    st = os.stat(path)
    key = hashlib.md5(f"{os.path.abspath(path)}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()
    return os.path.join(home, f"{os.path.basename(path)}.{key}.idx")


def build_line_index(path: str, use_native: bool = True) -> np.ndarray:
    """Returns int64 offsets array of length n_lines+1 (line i spans
    offsets[i]:offsets[i+1])."""
    cache = _cache_path(path)
    lock = cache + ".lock"
    with open(lock, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            if not os.path.exists(cache):
                if use_native and os.path.exists(_NATIVE_BIN):
                    subprocess.run([_NATIVE_BIN, path, cache], check=True)
                else:
                    _build_index_numpy(path, cache)
            with open(cache, "rb") as f:
                raw = np.fromfile(f, dtype=np.uint64)
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)
    n = int(raw[0])
    starts = raw[1:1 + n]
    size = raw[1 + n]
    return np.concatenate([starts, [size]]).astype(np.int64)


def _build_index_numpy(path: str, out: str):
    """Vectorized newline scan in 256MB windows (python fallback for the
    native indexer; same output format)."""
    size = os.path.getsize(path)
    starts = [0] if size > 0 else []
    window = 256 * 1024 * 1024
    with open(path, "rb") as f:
        base = 0
        while base < size:
            chunk = f.read(window)
            if not chunk:
                break
            arr = np.frombuffer(chunk, dtype=np.uint8)
            nls = np.nonzero(arr == 10)[0]
            starts.extend((base + nls + 1).tolist())
            base += len(chunk)
    if starts and starts[-1] == size:
        starts.pop()  # trailing newline: no final empty line
    with open(out, "wb") as f:
        np.asarray([len(starts)], np.uint64).tofile(f)
        np.asarray(starts, np.uint64).tofile(f)
        np.asarray([size], np.uint64).tofile(f)


class FileLineReader(BaseReader):
    def __init__(self, path: str, use_native: bool = True):
        self.path = path
        self.use_native = use_native
        self._offsets: Optional[np.ndarray] = None
        self._mm: Optional[mmap.mmap] = None
        self._fh = None

    def open(self):
        if self._mm is None:
            self._offsets = build_line_index(self.path, self.use_native)
            self._fh = open(self.path, "rb")
            if os.path.getsize(self.path) > 0:
                self._mm = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        return self

    def close(self):
        if self._mm is not None:
            self._mm.close()
            self._mm = None
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __len__(self):
        if self._offsets is None:
            self.open()
        return max(len(self._offsets) - 1, 0)

    def read(self, index: int) -> str:
        if self._mm is None:
            self.open()
        start, end = int(self._offsets[index]), int(self._offsets[index + 1])
        line = self._mm[start:end]
        return line.rstrip(b"\n").decode("utf-8")
