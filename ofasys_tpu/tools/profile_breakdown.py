"""Summarize a jax.profiler trace: per-op device-time breakdown.

Parses the xplane.pb a `jax.profiler.trace` run writes (the same data
TensorBoard's profile plugin reads — its converter is broken in this image,
so read the proto directly; requires
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python, which this module sets
before importing the proto) and aggregates durations on the device's
'XLA Ops' line by fusion kind / op name.

Usage:
    python -m ofasys_tpu.tools.profile_breakdown /tmp/profile_dir [top_n]

The reference ships torch.profiler hooks (engine/trainer.py record_function
annotations); this is the TPU-side equivalent evidence tool.
"""

from __future__ import annotations

import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplane(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True))
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {path}")
    return hits[-1]


_KIND_PATTERNS = [
    ("convert", re.compile(r"convert", re.I)),
    ("matmul/conv", re.compile(r"dot|conv|fusion\.?\d*\.remat", re.I)),
]


def classify(name: str) -> str:
    """Bucket an XLA op name: the leading HLO opcode of the (fused) op."""
    base = name.split(".")[0]
    return base


def is_async_start(name: str) -> bool:
    """Async starts (copy-start/slice-start/all-reduce-start...) report the
    whole in-flight window as 'duration' — the device is NOT busy for it
    (overlapped with compute). Summing them double-counts massively; the
    matching *-done events carry the real sync cost."""
    return "-start" in name.split(" ")[0].split("=")[0]


def load_ops(xplane_path: str, line_filter: str = "XLA Ops"):
    """Yield (op_name, duration_ps, occurrences) from matching lines of
    every device plane (host planes are skipped)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: deferred

    space = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        space.ParseFromString(f.read())
    totals = collections.Counter()
    counts = collections.Counter()
    long_names = {}
    for plane in space.planes:
        if "Host" in plane.name or "python" in plane.name.lower():
            continue
        for line in plane.lines:
            if line_filter not in line.name:
                continue
            emeta = plane.event_metadata
            for ev in line.events:
                meta = emeta[ev.metadata_id]
                if is_async_start(meta.name):
                    continue
                totals[meta.name] += ev.duration_ps
                counts[meta.name] += 1
                long_names.setdefault(meta.name, meta.display_name or meta.name)
    return totals, counts, long_names


def summarize(path: str, top_n: int = 25):
    xp = find_xplane(path)
    totals, counts, long_names = load_ops(xp)
    if not totals:
        # some jax versions label the op line differently
        totals, counts, long_names = load_ops(xp, line_filter="")
    busy_ps = sum(totals.values())
    print(f"{xp}")
    print(f"device busy: {busy_ps / 1e9:.3f} ms total\n")
    by_kind = collections.Counter()
    for name, ps in totals.items():
        by_kind[classify(name)] += ps
    print("== by HLO opcode ==")
    for kind, ps in by_kind.most_common(12):
        print(f"  {ps / 1e9:9.3f} ms  {100.0 * ps / busy_ps:5.1f}%  {kind}")
    print("\n== top individual ops ==")
    for name, ps in totals.most_common(top_n):
        print(f"  {ps / 1e9:9.3f} ms  {100.0 * ps / busy_ps:5.1f}%  x{counts[name]:<5d} {name}")
    return totals, busy_ps


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
