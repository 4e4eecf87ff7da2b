"""Object-store readers (reference ofasys/io/reader/oss_reader.py +
odps_reader.py) behind the BaseReader API.

The reference streamed Aliyun OSS with a FIFO buffer and read ODPS tables
via common-io; neither SDK exists in this image, so these readers resolve
remote objects through the cached_path scheme-fetcher plug point
(utils/file_utils.py — register oss://, http:// etc. fetchers at runtime)
and expose injectable clients for tests/air-gapped runs."""

from __future__ import annotations

import io
import os
from typing import Any, Callable, Dict, List, Optional, Sequence

from ofasys_tpu.io.reader.base_reader import BaseReader


class ObjectStoreLineReader(BaseReader):
    """Random-access lines of a remote text object (oss://... or http://...):
    the object is fetched once into the local cache (cached_path), then line
    offsets are indexed in memory — the reference's OssLineReader semantics
    with the streaming replaced by cache-then-mmap (reference
    oss_reader.py + io/reader/utils.py:167-258)."""

    def __init__(self, url: str, fetcher: Optional[Callable[[str], str]] = None):
        self.url = url
        self._fetch = fetcher
        self._lines: Optional[List[str]] = None

    def open(self):
        if self._lines is None:
            if self._fetch is not None:
                path = self._fetch(self.url)
            else:
                from ofasys_tpu.utils.file_utils import cached_path

                path = cached_path(self.url)
            with open(path, encoding="utf-8") as f:
                self._lines = [ln.rstrip("\n") for ln in f]
        return self

    def __len__(self):
        self.open()
        return len(self._lines)

    def read(self, index: int):
        self.open()
        return self._lines[index]

    def iter_lines(self, open_stream: Callable[[str], Any],
                   chunk_bytes: int = 1 << 16, max_chunks: int = 16):
        """STREAM the object's lines without materializing it (the
        reference's FIFO-buffer OSS path, io/reader/utils.py:167-258, as a
        background-prefetched line reader — io/reader/streaming.py).

        ``open_stream(url)`` must return a file-like with ``read(n)`` —
        an OSS GetObject body, an http response, or a test fake. Yields
        decoded lines; epoch-style sequential consumption only (random
        access goes through read())."""
        from ofasys_tpu.io.reader.streaming import StreamingLineReader

        src = open_stream(self.url)
        # close on ANY exit (including the consumer breaking out of the
        # generator early, which fires GeneratorExit here) — otherwise the
        # prefetch producer thread blocks forever on its bounded queue and
        # the object-store connection leaks
        with StreamingLineReader(src, chunk_bytes=chunk_bytes,
                                 max_chunks=max_chunks) as reader:
            for raw in reader:
                yield raw.decode("utf-8")


class OssTextBinReader(BaseReader):
    """Fixed-length binary token blocks for LM pretraining (reference
    OssTextBinReader): the object is a flat int array; each record is
    ``block_tokens`` consecutive token ids."""

    def __init__(self, url: str, block_tokens: int = 512, dtype: str = "int32",
                 fetcher: Optional[Callable[[str], str]] = None):
        import numpy as np

        self.url = url
        self.block = block_tokens
        self.dtype = dtype
        self._fetch = fetcher
        self._data = None

    def open(self):
        if self._data is None:
            import numpy as np

            if self._fetch is not None:
                path = self._fetch(self.url)
            else:
                from ofasys_tpu.utils.file_utils import cached_path

                path = cached_path(self.url)
            self._data = np.fromfile(path, dtype=self.dtype)
        return self

    def __len__(self):
        self.open()
        return len(self._data) // self.block

    def read(self, index: int):
        self.open()
        return self._data[index * self.block:(index + 1) * self.block]


class OdpsReader(BaseReader):
    """Alibaba ODPS table reader shape (reference odps_reader.py). The
    common-io SDK is not in this image; inject any client exposing
    ``count()`` and ``read(index) -> dict`` (tests use a fake)."""

    def __init__(self, table: str, client: Any = None,
                 selected_cols: Optional[Sequence[str]] = None):
        if client is None:
            raise ImportError(
                "OdpsReader needs an ODPS client (common-io is not bundled); "
                "pass client= explicitly or install the SDK"
            )
        self.table = table
        self.client = client
        self.selected_cols = list(selected_cols) if selected_cols else None

    def __len__(self):
        return int(self.client.count())

    def read(self, index: int) -> Dict[str, Any]:
        row = self.client.read(index)
        if self.selected_cols:
            return {k: row[k] for k in self.selected_cols}
        return dict(row)
