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


_OPCODE_RE = re.compile(r"=\s*(?:\([^=]*?\)|\S+)\s+([a-z][a-z0-9_-]*)\(")


def _opcode(name: str) -> str:
    """The HLO opcode of an event named with full HLO text
    ('%copy.12 = bf16[...] copy(%fusion.3)' -> 'copy'). Falls back to the
    event name's base ('%self_attn.238' -> 'self_attn'). Classifying on
    the WHOLE text counts any op that merely CONSUMES a %transpose.N /
    %copy.N operand as a copy — the r3/r4 'layout copies are 11%' artifact
    (true per-opcode copies measured ~3 ms of a 176 ms update)."""
    m = _OPCODE_RE.search(name)
    if m:
        return m.group(1)
    return name.lstrip("%").split(" ", 1)[0].split(".", 1)[0]


def categorize(name: str, matmul_fusions=None) -> str:
    op = _opcode(name).lower()
    low = name.lower()
    for cat, pat in CATEGORIES:
        if re.search(pat, op):
            if cat == "matmul/fusion" and matmul_fusions is not None:
                # split by whether the fusion's computation contains a
                # dot/convolution (classified from the compiled HLO at
                # capture time) — 'fusion' alone says nothing about MXU use
                base = name.lstrip("%").split(" ", 1)[0]
                if base in matmul_fusions or "dot" in low.split(" = ")[0]:
                    return "fusion: matmul/conv"
                if "fusion" in op:
                    return "fusion: bandwidth (elementwise/reduce)"
            return cat
    return "other"


def classify_fusions_from_hlo(hlo_text: str):
    """Fusion op names whose called computation contains a dot/convolution.

    Parses the optimized-HLO pretty text: computation bodies are scanned for
    ``dot(`` / ``convolution(``; fusion ops are mapped to their computation
    via ``calls=``.
    """
    has_mxu = {}
    cur, mxu = None, False
    for line in hlo_text.splitlines():
        if cur is None:
            m = re.match(r"\s*%?([\w.-]+)\s*\(.*\)\s*->\s*.+\{", line)
            if m and "fusion(" not in line:
                cur, mxu = m.group(1), False
        else:
            if re.search(r"\b(dot|convolution)\(", line):
                mxu = True
            if line.startswith("}") or line.strip() == "}":
                has_mxu[cur] = mxu
                cur = None
    matmul = set()
    for m in re.finditer(
        r"%([\w.-]+)\s*=\s*[^\n]*\bfusion\([^\n]*calls=%?([\w.-]+)", hlo_text
    ):
        if has_mxu.get(m.group(2)):
            matmul.add(m.group(1))
    return matmul


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f16": 2, "bf16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
}


def bytes_in_event_text(name: str) -> int:
    """Approximate HBM bytes an op moves: sum of every tensor shape that
    appears in the event's HLO text (output tuple + operand list). Upper
    bound-ish — an operand repeated in the text counts twice — but good
    enough to rank fusions against the HBM roofline."""
    total = 0
    for dt, dims in re.findall(r"\b(pred|[fsu]\d+|bf16)\[([\d,]*)\]", name):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def roofline(trace_dir: str, top: int = 30, line_name: str = "XLA Ops",
             hbm_gbps: float = 819.0):
    """Achieved-bandwidth table for the top non-matmul ops: is the remaining
    (non-MXU) device time already at the HBM roofline, or is there headroom
    XLA's codegen leaves behind?"""
    results = breakdown(trace_dir, top=0, line_name=line_name)
    import json

    sidecar = os.path.join(trace_dir, "matmul_fusions.json")
    matmul = set()
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            matmul = set(json.load(f))
    for r in results:
        rows = []
        for name, ms in r["per_op"].items():
            base = name.lstrip("%").split(" ", 1)[0]
            if base in matmul or re.search(r"\bdot\(|convolution\(", name):
                continue
            b = bytes_in_event_text(name)
            if b == 0 or ms <= 0:
                continue
            rows.append((ms, b, name))
        rows.sort(reverse=True)
        print(f"\n=== roofline (non-matmul), plane {r['plane']}, "
              f"HBM peak {hbm_gbps:.0f} GB/s ===")
        print(f"{'ms':>9} {'MB':>9} {'GB/s':>8} {'%peak':>6}  op")
        tot_ms = tot_b = 0.0
        for ms, b, name in rows[:top]:
            gbps = b / 1e9 / (ms / 1e3)
            print(f"{ms:9.2f} {b / 1e6:9.1f} {gbps:8.0f} "
                  f"{100 * gbps / hbm_gbps:5.0f}%  {name[:95]}")
        for ms, b, _ in rows:
            tot_ms += ms
            tot_b += b
        if tot_ms:
            agg = tot_b / 1e9 / (tot_ms / 1e3)
            print(f"-- all {len(rows)} non-matmul ops: {tot_ms:.1f} ms, "
                  f"{tot_b / 1e6:.0f} MB -> {agg:.0f} GB/s aggregate "
                  f"({100 * agg / hbm_gbps:.0f}% of HBM peak)")
    return results


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
    matmul_fusions = None
    sidecar = os.path.join(trace_dir, "matmul_fusions.json")
    if os.path.exists(sidecar):
        import json

        with open(sidecar) as f:
            matmul_fusions = set(json.load(f))
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
                # async *-start spans cover the whole wait window — skip.
                # Event names may be bare ('all-reduce-start') or full HLO
                # text ('%copy-start.1059 = (bf16[...]) copy-start(...)'):
                # extract the op name and strip the '.NNN' id before testing.
                base = name.lstrip("%").split(" ", 1)[0]
                base = re.sub(r"\.\d+$", "", base)
                if base.endswith("-start"):
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
            per_cat[categorize(name, matmul_fusions)] += ms
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

    from ofasys_tpu.engine.criterion.diffusion_loss import (
        DiffusionCriterion,
        DiffusionCriterionConfig,
    )

    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(), pad_id=d.pad())
    diff_crit = DiffusionCriterion(DiffusionCriterionConfig(), pad_id=d.pad())
    optimizer = build_optimizer(
        OptimizationConfig(lr=(1e-4,), warmup_updates=100), total_num_update=10000)
    params = model.init_params(
        jax.random.PRNGKey(0), [b["net_input"]["slots"] for b in batches.values()])
    state = TrainState.create(params, optimizer)
    step = jax.jit(
        make_multitask_train_step(
            model,
            {n: (diff_crit if n == "motion_t2m" else crit) for n in batches},
            optimizer,
        ),
        donate_argnums=(0,),
    )
    rng = jax.random.PRNGKey(1)
    # classify matmul-bearing fusions from the optimized HLO so breakdown
    # can split 'fusion: matmul/conv' from 'fusion: bandwidth' — written
    # BEFORE the first execute (donation invalidates the input buffers)
    import json

    compiled = step.lower(state, batches, rng).compile()
    matmul = classify_fusions_from_hlo(compiled.as_text())
    os.makedirs(trace_dir, exist_ok=True)
    with open(os.path.join(trace_dir, "matmul_fusions.json"), "w") as f:
        json.dump(sorted(matmul), f)
    print(f"{len(matmul)} matmul/conv-bearing fusions classified from HLO")
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
    ap.add_argument("--roofline", action="store_true",
                    help="achieved-bandwidth table for the non-matmul ops")
    args = ap.parse_args()
    if args.capture:
        capture(args.trace_dir, steps=args.steps)
    if args.roofline:
        roofline(args.trace_dir, top=args.top, line_name=args.line)
    else:
        breakdown(args.trace_dir, top=args.top, line_name=args.line)


if __name__ == "__main__":
    main()
