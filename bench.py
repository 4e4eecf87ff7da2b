"""Benchmark: multi-task-style train-step throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline divides by a PyTorch-CPU train step of an architecture-matched
encoder-decoder (the reference is torch; BASELINE.md directs us to measure
the torch CPU denominator ourselves). The torch number is measured once and
cached in BASELINE_MEASURED.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ARCH = "base"
B, TS, TT = 32, 64, 64
VOCAB_EXTRA = 8000
STEPS = 20
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")


def measure_torch_cpu_baseline():
    """Architecture-matched torch CPU enc-dec train step (fp32, the
    reference's CPU mode), samples/sec."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    from ofasys_tpu.model.config import GeneralistModelConfig

    cfg = GeneralistModelConfig(arch=ARCH)
    E, H = cfg.encoder.embed_dim, cfg.encoder.attention_heads
    V = VOCAB_EXTRA + 128

    model = nn.Transformer(
        d_model=E,
        nhead=H,
        num_encoder_layers=cfg.encoder.layers,
        num_decoder_layers=cfg.decoder.layers,
        dim_feedforward=cfg.encoder.ffn_embed_dim,
        dropout=0.0,
        batch_first=True,
    )
    embed = nn.Embedding(V, E)
    proj = nn.Linear(E, V, bias=False)
    params = list(model.parameters()) + list(embed.parameters()) + list(proj.parameters())
    opt = torch.optim.AdamW(params, lr=1e-4)
    src = torch.randint(0, V, (B, TS))
    tgt = torch.randint(0, V, (B, TT))

    def step():
        opt.zero_grad()
        out = model(embed(src), embed(tgt))
        loss = nn.functional.cross_entropy(proj(out).reshape(-1, V), tgt.reshape(-1))
        loss.backward()
        opt.step()

    step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    return B * n / dt


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            data = json.load(f)
        if data.get("config") == [ARCH, B, TS, TT]:
            return data["torch_cpu_samples_per_sec"]
    val = measure_torch_cpu_baseline()
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"config": [ARCH, B, TS, TT], "torch_cpu_samples_per_sec": val}, f)
    return val


def measure_tpu():
    import jax

    from __graft_entry__ import _build
    from ofasys_tpu.configure.configs import OptimizationConfig
    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState, make_train_step

    model, d, batch = _build(arch=ARCH, B=B, Ts=TS, Tt=TT, vocab_extra=VOCAB_EXTRA)
    params = model.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(), pad_id=d.pad()
    )
    optimizer = build_optimizer(OptimizationConfig(lr=(1e-4,), warmup_updates=100), total_num_update=10000)
    state = TrainState.create(params, optimizer)
    step = jax.jit(make_train_step(model, crit, optimizer), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    state, _ = step(state, batch, rng)  # compile
    jax.block_until_ready(state.params)
    # median over chunks: the shared-tunnel link adds multi-second jitter
    rates = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = step(state, batch, rng)
        jax.block_until_ready(state.params)
        rates.append(B * STEPS / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2]


def measure_decode_latency():
    """Greedy caption-style decode p50 (BASELINE metric #2): base arch,
    batch 1, 32 source tokens -> up to 16 generated tokens."""
    import jax
    import numpy as np

    from __graft_entry__ import _build
    from ofasys_tpu.generator import SequenceGenerator

    model, d, batch = _build(arch=ARCH, B=1, Ts=32, Tt=16, vocab_extra=VOCAB_EXTRA)
    params = model.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    gen = SequenceGenerator(model, d, beam_size=1, max_len_b=16, min_len=15)
    sample = {"net_input": {"slots": batch["net_input"]["slots"]}}
    gen.generate(params, sample)  # compile
    lats = []
    for _ in range(10):
        t0 = time.perf_counter()
        gen.generate(params, sample)
        lats.append(time.perf_counter() - t0)
    return float(np.median(lats)) * 1000.0


def main():
    tpu = measure_tpu()
    try:
        p50_ms = round(measure_decode_latency(), 2)
    except Exception:
        p50_ms = None
    try:
        base = get_baseline()
    except Exception:
        base = None
    out = {
        "metric": f"{ARCH}-arch text train throughput (B={B}, src={TS}, tgt={TT})",
        "value": round(tpu, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(tpu / base, 2) if base else None,
        "decode_p50_ms_16tok": p50_ms,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
