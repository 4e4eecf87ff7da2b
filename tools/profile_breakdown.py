"""Device-time breakdown from a JAX profiler trace (xplane.pb).

This is the perf-evidence tool behind the MFU grind notes in docs/perf.md:
it answers "where do the milliseconds of one training update go" with a
per-category table (matmul fusions, LN backwards, converts, layout copies,
convs, ...) computed from device-side op events.

Recipe (see docs/perf.md for the full methodology):

  1. Capture a trace of a few bench steps:
       python tools/profile_breakdown.py --capture /tmp/trace
     (runs the bench's mixed multi-task update under jax.profiler.trace;
     or capture your own with jax.profiler.trace(...) around any program)

  2. Parse it:
       python tools/profile_breakdown.py /tmp/trace

Parsing notes (hard-won, do not "simplify"):
  - The xplane.pb is read with tensorflow.tsl.profiler.protobuf.xplane_pb2
    under PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python —
    tensorboard_plugin_profile's trace converter is broken in this image,
    and the upb (C++) protobuf runtime refuses the mixed descriptor pool.
  - Async ops appear twice: a `*-start` event spanning the whole async
    window PLUS a `*-done` completion. Summing both overcounts busy time
    ~10x on collective-heavy programs — `*-start` spans are EXCLUDED.
  - Busy time summed over the 'XLA Ops' line of the TPU device plane
    matches scalar-readback-timed step walls (the calibrated truth source
    on the axon tunnel, where block_until_ready lies — see bench.py).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (category, regex) — first match wins; order is significance, not alphabet
CATEGORIES = (
    ("matmul/fusion", r"fusion|dot|gemm|convolution.*dot"),
    ("conv", r"convolution"),
    ("layernorm-bwd", r"layer_norm.*bwd|ln_bwd|norm.*backward"),
    ("convert", r"convert"),
    ("copy/transpose", r"copy|transpose|bitcast"),
    ("collective", r"all-reduce|all-gather|reduce-scatter|collective|all-to-all"),
    ("dynamic-slice/update", r"dynamic-slice|dynamic_update|dynamic-update"),
    ("scatter/gather", r"scatter|gather"),
    ("reduce", r"reduce"),
    ("rng", r"rng|random"),
    ("custom-call", r"custom-call|tpu_custom_call|mosaic"),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, pat in CATEGORIES:
        if re.search(pat, low):
            return cat
    return "other"


def load_xplanes(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not pbs:
        raise SystemExit(f"no *.xplane.pb under {trace_dir} — capture first")
    path = pbs[-1]
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    return space, path


def breakdown(trace_dir: str, top: int = 25, line_name: str = "XLA Ops"):
    space, path = load_xplanes(trace_dir)
    # prefer a real device plane; fall back to host XLA (CPU-only smoke runs)
    planes = [p for p in space.planes if "TPU" in p.name or "/device:" in p.name]
    if not planes:
        planes = list(space.planes)
    results = []
    for plane in planes:
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        per_op = collections.Counter()
        n_events = 0
        t_min, t_max = None, None
        for line in plane.lines:
            if line_name and line_name not in line.name:
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                # async *-start spans cover the whole wait window — skip
                if name.endswith("-start"):
                    continue
                dur = ev.duration_ps / 1e9  # ps -> ms
                per_op[name] += dur
                n_events += 1
                t0 = line.timestamp_ns / 1e6 + ev.offset_ps / 1e9
                t1 = t0 + dur
                t_min = t0 if t_min is None else min(t_min, t0)
                t_max = t1 if t_max is None else max(t_max, t1)
        if not per_op:
            continue
        per_cat = collections.Counter()
        for name, ms in per_op.items():
            per_cat[categorize(name)] += ms
        results.append(dict(
            plane=plane.name, per_op=per_op, per_cat=per_cat,
            busy_ms=sum(per_op.values()), n_events=n_events,
            span_ms=(t_max - t_min) if t_min is not None else 0.0,
        ))
    if not results:
        raise SystemExit(
            f"no events on any '{line_name}' line in {path}; "
            f"planes: {[p.name for p in space.planes]}"
        )
    for r in results:
        print(f"\n=== plane: {r['plane']}  ({path})")
        print(f"busy {r['busy_ms']:.2f} ms over {r['n_events']} events, "
              f"trace span {r['span_ms']:.2f} ms "
              f"(duty {100 * r['busy_ms'] / max(r['span_ms'], 1e-9):.1f}%)")
        print("\n-- by category --")
        for cat, ms in r["per_cat"].most_common():
            print(f"{ms:10.2f} ms  {100 * ms / r['busy_ms']:5.1f}%  {cat}")
        print(f"\n-- top {top} ops --")
        for name, ms in r["per_op"].most_common(top):
            print(f"{ms:10.2f} ms  {100 * ms / r['busy_ms']:5.1f}%  {name[:110]}")
    return results


def capture(trace_dir: str, steps: int = 3):
    """Run the bench's mixed multi-task update under the profiler."""
    import jax

    import bench

    model, d, batches = bench.build_model_and_batches()
    from ofasys_tpu.configure.configs import OptimizationConfig
    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState, make_multitask_train_step

    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(), pad_id=d.pad())
    optimizer = build_optimizer(
        OptimizationConfig(lr=(1e-4,), warmup_updates=100), total_num_update=10000)
    params = model.init_params(
        jax.random.PRNGKey(0), [b["net_input"]["slots"] for b in batches.values()])
    state = TrainState.create(params, optimizer)
    step = jax.jit(
        make_multitask_train_step(model, {n: crit for n in batches}, optimizer),
        donate_argnums=(0,),
    )
    rng = jax.random.PRNGKey(1)
    state, metrics = step(state, batches, rng)   # compile outside the trace
    _ = float(metrics["gnorm"])
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, metrics = step(state, batches, rng)
        _ = float(metrics["gnorm"])              # readback inside the trace
    print(f"trace written under {trace_dir}")


def main():
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("trace_dir", help="directory holding (or to hold) the trace")
    ap.add_argument("--capture", action="store_true",
                    help="run bench steps under jax.profiler.trace first")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--line", default="XLA Ops",
                    help="plane line to aggregate (default 'XLA Ops')")
    args = ap.parse_args()
    if args.capture:
        capture(args.trace_dir, steps=args.steps)
    breakdown(args.trace_dir, top=args.top, line_name=args.line)


if __name__ == "__main__":
    main()
