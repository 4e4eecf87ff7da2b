"""Streaming line reader (io/reader/streaming.py) — the FIFO-buffer OSS
path of the reference (ofasys/io/reader/utils.py:167-258) rebuilt as a
bounded background-prefetch stream."""

import threading
import time

import pytest

from ofasys_tpu.io.reader.streaming import PrefetchByteStream, StreamingLineReader


class ChunkySource:
    """File-like that doles out bytes in awkward chunk sizes (splits lines
    across reads) and counts calls."""

    def __init__(self, payload: bytes, sizes=(3, 1, 7, 2)):
        self.payload = payload
        self.pos = 0
        self.sizes = sizes
        self.calls = 0

    def read(self, n: int) -> bytes:
        self.calls += 1
        if self.pos >= len(self.payload):
            return b""
        take = min(self.sizes[self.calls % len(self.sizes)], n,
                   len(self.payload) - self.pos)
        out = self.payload[self.pos:self.pos + take]
        self.pos += take
        return out


def test_lines_across_chunk_boundaries():
    payload = b"alpha\tbeta\n\ngamma\nunterminated-tail"
    r = StreamingLineReader(ChunkySource(payload), chunk_bytes=4, max_chunks=2)
    assert list(r) == [b"alpha\tbeta", b"", b"gamma", b"unterminated-tail"]


def test_empty_final_record_distinguished_from_eof():
    r = StreamingLineReader(ChunkySource(b"a\n\n"))
    assert list(r) == [b"a", b""]
    r2 = StreamingLineReader(ChunkySource(b"a\n"))
    assert list(r2) == [b"a"]
    assert StreamingLineReader(ChunkySource(b"")).readline() is None


def test_readn_exact_and_eof_short():
    r = StreamingLineReader(ChunkySource(bytes(range(100, 130))), chunk_bytes=4)
    assert r.readn(10) == bytes(range(100, 110))
    assert r.readn(5) == bytes(range(110, 115))
    assert r.readn(100) == bytes(range(115, 130))   # short at EOF
    assert r.readn(4) == b""


def test_prefetch_bounded_and_complete():
    payload = b"".join(b"line-%04d\n" % i for i in range(2000))

    class Plain:
        def __init__(self):
            self.pos = 0

        def read(self, n):
            out = payload[self.pos:self.pos + n]
            self.pos += n
            return out

    s = PrefetchByteStream(Plain(), chunk_bytes=64, max_chunks=4)
    got = []
    while True:
        b = s.read(1000)
        if not b:
            break
        got.append(b)
    assert b"".join(got) == payload


def test_source_error_surfaces_on_consumer():
    class Boom:
        def __init__(self):
            self.calls = 0

        def read(self, n):
            self.calls += 1
            if self.calls > 2:
                raise IOError("connection reset")
            return b"x" * 8

    s = PrefetchByteStream(Boom(), chunk_bytes=8, max_chunks=2)
    with pytest.raises(IOError):
        while s.read(64):
            pass


def test_object_store_iter_lines(tmp_path):
    from ofasys_tpu.io.reader.object_store import ObjectStoreLineReader

    payload = "q1\ta1\nq2\ta2\nq3\ta3"
    r = ObjectStoreLineReader("oss://bucket/obj.tsv")
    lines = list(r.iter_lines(lambda url: ChunkySource(payload.encode())))
    assert lines == ["q1\ta1", "q2\ta2", "q3\ta3"]


class ClosableSource(ChunkySource):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.closed = False

    def close(self):
        self.closed = True


def test_close_unblocks_abandoned_producer():
    """An abandoned stream (consumer breaks out early) must not leak the
    producer thread blocked on the bounded queue: close() cancels it and
    closes the source."""
    payload = b"x" * 4096
    src = ClosableSource(payload, sizes=(64,) * 4)
    s = PrefetchByteStream(src, chunk_bytes=8, max_chunks=2)
    s.read(16)               # partial consume; producer fills + blocks
    time.sleep(0.05)
    assert s._thread.is_alive() or src.pos < len(payload)
    s.close()
    s._thread.join(timeout=2.0)
    assert not s._thread.is_alive()
    assert src.closed
    s.close()                # idempotent


def test_context_manager_closes():
    src = ClosableSource(b"a\nb\nc\n")
    with StreamingLineReader(src, chunk_bytes=2, max_chunks=2) as r:
        assert r.readline() == b"a"
    assert src.closed


def test_fill_respects_configured_chunk_bytes():
    """StreamingLineReader._fill must read with the configured chunk size,
    not a hardcoded 64KB (matters for prefetch=False chunking contracts)."""

    class RecordingSource:
        def __init__(self):
            self.requests = []
            self.done = False

        def read(self, n):
            self.requests.append(n)
            if self.done:
                return b""
            self.done = True
            return b"one\ntwo\n"

    src = RecordingSource()
    r = StreamingLineReader(src, chunk_bytes=32, prefetch=False)
    assert list(r) == [b"one", b"two"]
    assert all(n == 32 for n in src.requests)


def test_object_store_iter_lines_closes_on_abandon(tmp_path):
    """Breaking out of ObjectStoreLineReader.iter_lines mid-stream must close
    the prefetch stream (producer thread unblocked, source closed) — the
    round-5 leak fix."""
    import threading

    from ofasys_tpu.io.reader.object_store import ObjectStoreLineReader

    payload = b"\n".join(b"line%d" % i for i in range(5000)) + b"\n"

    class Src(ClosableSource):
        pass

    src = Src(payload, sizes=(512,) * 4)
    p = tmp_path / "obj.txt"
    p.write_bytes(payload)
    r = ObjectStoreLineReader(str(p))
    before = threading.active_count()
    it = r.iter_lines(lambda url: src, chunk_bytes=64, max_chunks=2)
    assert next(it) == "line0"
    it.close()          # GeneratorExit -> with-block __exit__ -> stream close
    time.sleep(0.3)
    assert src.closed
    assert threading.active_count() <= before + 1
