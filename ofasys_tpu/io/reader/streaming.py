"""Streaming byte/line access over remote objects without full download.

The reference streams Aliyun OSS objects through a single-threaded FIFO
ring buffer (ofasys/io/reader/utils.py:167-258 FifoQueue/FifoLineReader):
the consumer repeatedly scans the ring for b'\\n' and tops it up with
`reader.read(64KB)` when it runs dry — network latency is paid inline on
the consumer thread.

This module keeps the same contract (readline / readn over any file-like
``read()`` source, records split on b'\\n', unterminated tail returned
last) but moves the refill to a bounded BACKGROUND thread: the producer
reads fixed chunks into a queue ahead of the consumer, so object-store
round-trip latency overlaps with preprocessing instead of stalling it —
the natural design when the consumer is a TPU input pipeline that must
never make the chip wait on DCN.

No SDK dependency: anything with ``read(n) -> bytes`` works (an OSS
GetObject body, an http response stream, a local file handle, a test
fake).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

_SENTINEL = b""


class PrefetchByteStream:
    """Background-prefetched view of a file-like byte source.

    A daemon thread reads ``chunk_bytes`` blocks into a bounded queue
    (``max_chunks`` deep, so at most ``chunk_bytes * max_chunks`` bytes are
    buffered ahead). ``read(n)`` drains the queue; EOF is an empty bytes
    sentinel. Errors raised by the source are re-raised on the consumer
    thread at the read() that would have returned the failed chunk.

    ``close()`` cancels the producer (it checks a flag around every bounded
    ``put``, so it can never block forever on an abandoned stream) and
    closes the underlying source; also usable as a context manager, and
    ``__del__`` closes as a last resort so a consumer that breaks out of
    iteration mid-stream does not leak the thread or the object-store
    connection.
    """

    def __init__(self, source, chunk_bytes: int = 1 << 16, max_chunks: int = 16):
        self._source = source
        self._chunk = chunk_bytes
        self._q: "queue.Queue" = queue.Queue(maxsize=max_chunks)
        self._err: Optional[BaseException] = None
        self._leftover = b""
        self._eof = False
        self._cancelled = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            while not self._cancelled.is_set():
                data = self._source.read(self._chunk)
                if not data:
                    break
                # bounded put that stays responsive to close(): re-check the
                # cancel flag instead of blocking forever on a full queue
                while not self._cancelled.is_set():
                    try:
                        self._q.put(data, timeout=0.1)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:          # noqa: BLE001 — re-raised on consumer
            self._err = e
        finally:
            # the sentinel MUST reach the consumer (a dropped sentinel hangs
            # read() forever) — keep trying unless close() cancelled us
            # (close re-adds its own sentinel after draining)
            while True:
                try:
                    self._q.put(_SENTINEL, timeout=0.1)
                    break
                except queue.Full:
                    if self._cancelled.is_set():
                        break

    def read(self, n: int = -1) -> bytes:
        """Up to ``n`` bytes (all remaining if n < 0); b'' at EOF."""
        parts = [self._leftover] if self._leftover else []
        have = len(self._leftover)
        self._leftover = b""
        while not self._eof and (n < 0 or have < n):
            data = self._q.get()
            if data == _SENTINEL:
                self._eof = True
                if self._err is not None:
                    raise self._err
                break
            parts.append(data)
            have += len(data)
        buf = b"".join(parts)
        if 0 <= n < len(buf):
            self._leftover = buf[n:]
            buf = buf[:n]
        return buf

    def close(self):
        """Cancel the producer and close the underlying source (idempotent)."""
        if self._cancelled.is_set():
            return
        self._cancelled.set()
        # drain so a producer blocked in put() sees the flag promptly
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=1.0)
        self._eof = True
        # consumer-side reads after close() terminate immediately
        try:
            self._q.put_nowait(_SENTINEL)
        except queue.Full:
            pass
        close = getattr(self._source, "close", None)
        if close is not None:
            try:
                close()
            except Exception:
                pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class StreamingLineReader:
    """Line records over a (prefetched) byte stream — the reference
    FifoLineReader contract: records split on b'\\n' (terminator consumed),
    an unterminated final line is yielded last, ``readn`` returns exact
    byte counts (short only at EOF)."""

    def __init__(self, source, chunk_bytes: int = 1 << 16, max_chunks: int = 16,
                 prefetch: bool = True):
        self._s = (PrefetchByteStream(source, chunk_bytes, max_chunks)
                   if prefetch else source)
        self._chunk = chunk_bytes
        self._buf = b""
        self._eof = False

    def _fill(self) -> bool:
        data = self._s.read(self._chunk)
        if not data:
            self._eof = True
            return False
        self._buf += data
        return True

    def close(self):
        close = getattr(self._s, "close", None)
        if close is not None:
            close()
        self._eof = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def readline(self) -> Optional[bytes]:
        """Next line WITHOUT its terminator; None past the last record
        (None — not b'' — so an empty final record like b"a\\n\\n" stays
        distinguishable from end-of-stream)."""
        while True:
            i = self._buf.find(b"\n")
            if i >= 0:
                line, self._buf = self._buf[:i], self._buf[i + 1:]
                return line
            if self._eof or not self._fill():
                if not self._buf:
                    return None
                tail, self._buf = self._buf, b""
                return tail

    def readn(self, n: int) -> bytes:
        while len(self._buf) < n and not self._eof:
            self._fill()
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def __iter__(self) -> Iterator[bytes]:
        while True:
            line = self.readline()
            if line is None:
                return
            yield line
