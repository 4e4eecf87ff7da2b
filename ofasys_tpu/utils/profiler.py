"""Profiling & watchdog utilities.

Replaces the reference's tracing hooks (record_function scopes, nvtx ranges,
cuda profiler — SURVEY §5) with the TPU-native stack:

  * profile(logdir)      — jax.profiler trace context (view in
                            TensorBoard/Perfetto; reference common.profile)
  * annotate(name)       — jax.profiler.TraceAnnotation scope
                            (record_function analogue)
  * time_fn              — block_until_ready timing harness for kernels
  * Watchdog             — heartbeat thread that dumps stacks and optionally
                            kills the process if no progress within timeout
                            (reference DistributedTimeoutWrapper,
                            distributed/distributed_timeout_wrapper.py:15-103)
  * device_memory_stats  — per-device HBM telemetry (reference gb_free)
"""

from __future__ import annotations

import contextlib
import faulthandler
import logging
import os
import signal
import threading
import time
from typing import Callable, Dict, Optional

import jax

logger = logging.getLogger("ofasys_tpu.profiler")


@contextlib.contextmanager
def profile(logdir: str = "/tmp/ofasys_tpu_profile"):
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logger.info("profile trace written to %s", logdir)


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Mean seconds per call with device sync."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    out = {}
    for d in jax.local_devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2**30,
                "bytes_limit_gb": stats.get("bytes_limit", 0) / 2**30,
                "peak_gb": stats.get("peak_bytes_in_use", 0) / 2**30,
            }
    return out


class Watchdog:
    """Kill-switch for hung steps: call beat() each update; if no beat within
    ``timeout`` seconds, dump all thread stacks and send ``sig`` to self."""

    def __init__(self, timeout: float, sig: int = signal.SIGINT, kill: bool = True):
        self.timeout = timeout
        self.sig = sig
        self.kill = kill
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.fired = False

    def beat(self):
        self._last = time.monotonic()

    def start(self):
        if self.timeout <= 0:
            return self

        def run():
            while not self._stop.wait(min(self.timeout / 4, 10.0)):
                if time.monotonic() - self._last > self.timeout:
                    self.fired = True
                    logger.error("watchdog: no progress in %.0fs — dumping stacks", self.timeout)
                    faulthandler.dump_traceback()
                    if self.kill:
                        os.kill(os.getpid(), self.sig)
                    self._last = time.monotonic()

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
