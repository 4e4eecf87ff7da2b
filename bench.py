"""Benchmark: the governing BASELINE metric — mixed-modality multi-task
train throughput (caption + text_infilling + ASR, base arch, reference
co-training semantics) on one TPU chip, plus caption decode latency.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N,
   "mfu_vs_v5e_peak": ..., "tflops": ..., "decode_p50_ms_16tok": ...,
   "decode_device_ms_est": ...}

HONEST TIMING: on the axon tunnel, block_until_ready() acks the buffer
handle WITHOUT waiting for device execution (a calibration matmul chain
"achieved" 14,868 TFLOPs — 75x a v5e's bf16 peak). Every timed window here
therefore ends with a scalar readback (float(...)), which cannot complete
before the device finishes the dependency chain. A known-FLOPs matmul chain
timed this way sustains ~167 TFLOPs (85% of the 197 TFLOPs v5e bf16 peak) —
physically plausible — so readback timing is the calibrated truth source.

vs_baseline divides by an architecture-matched PyTorch-CPU multi-task step
(the reference is torch; BASELINE.md directs us to measure the denominator
ourselves). Measured once, cached in BASELINE_MEASURED.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ARCH = os.environ.get("BENCH_ARCH", "base")
VOCAB_EXTRA = 50000          # GPT2-BPE-scale vocab: logits cost is representative
V5E_BF16_PEAK = 197e12

# the mixed-modality multi-task load (ALL of BASELINE.md's configs 1-5):
#   name, batch, encoder tokens (post-adaptor), decoder tokens, raw input spec
CAPTION = dict(name="caption", B=64, img=224, enc_tok=196, dec_tok=24)
INFILL = dict(name="text_infilling", B=128, src_tok=64, enc_tok=64, dec_tok=64)
ASR = dict(name="asr", B=32, frames=480, mels=80, enc_tok=120, dec_tok=32)
# config 3: visual grounding / VQA — IMAGE + TEXT query sources, short
# box-bin/answer token target (box quantization decode shape)
GROUND = dict(name="grounding_vqa", B=48, img=224, q_tok=16, enc_tok=212, dec_tok=8)
# config 5's diffusion leg: text-to-motion, full-context diffusion decoder
# over motion frames with a continuous feature head (no vocab GEMM)
MOTION = dict(name="motion_t2m", B=32, src_tok=16, enc_tok=16, dec_tok=64, feat=135)
TASKS = (CAPTION, INFILL, ASR, GROUND, MOTION)

# batch-size scaling experiments: multiply every task's batch (A/B only;
# the governing config is the default 1)
_BX = float(os.environ.get("BENCH_BX", "1"))
if _BX != 1.0:
    for _t in TASKS:
        _t["B"] = max(1, int(round(_t["B"] * _BX)))

STEPS = 8        # updates per timed chunk
CHUNKS = 5
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
# list-of-lists (json round-trip safe: tuples would never equal the loaded
# lists, silently re-measuring the noisy torch denominator every run)
BASELINE_KEY = ["mixed_v3", ARCH, VOCAB_EXTRA, [[t["B"], t["enc_tok"], t["dec_tok"]] for t in TASKS]]


# ---------------------------------------------------------------- analytics
def flops_per_update(E, F, Lenc, Ldec, V):
    """Analytic train FLOPs (fwd*3) of one multi-task update, core matmuls:
    attention projections + scores, FFN, cross-attention, output logits."""
    total = 0.0
    for t in TASKS:
        B, Te, Td = t["B"], t["enc_tok"], t["dec_tok"]
        enc = Lenc * (8 * Te * E * E + 4 * Te * Te * E + 4 * Te * E * F)
        dec_self = Ldec * (8 * Td * E * E + 4 * Td * Td * E)
        dec_cross = Ldec * (4 * Td * E * E + 4 * Te * E * E + 4 * Td * Te * E)
        dec_ffn = Ldec * (4 * Td * E * F)
        if t.get("feat"):
            # continuous head (diffusion): feature in/out projections only
            head = 4 * Td * E * t["feat"]
        else:
            head = 2 * Td * E * V
        total += B * (enc + dec_self + dec_cross + dec_ffn + head)
    return 3.0 * total  # fwd + bwd


# ------------------------------------------------------------ batch builders
def build_model_and_batches():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ofasys_tpu import GeneralistModel, ModalityType
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch

    d = Dictionary()
    for i in range(VOCAB_EXTRA):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(128)
    model = GeneralistModel(arch=ARCH)
    model.cfg.dropout = 0.0
    if os.environ.get("BENCH_LN"):           # A/B: xla | hybrid | pallas
        model.cfg.ln_impl = os.environ["BENCH_LN"]
    if os.environ.get("BENCH_REMAT"):        # A/B: none | dots | full
        model.cfg.remat = os.environ["BENCH_REMAT"]
    if os.environ.get("BENCH_QT"):           # A/B: none | fwd (int8 training)
        model.cfg.quant_training = os.environ["BENCH_QT"]
    if os.environ.get("BENCH_ATTN"):         # A/B: fp32 | compute (score dtype)
        model.cfg.attn_logits = os.environ["BENCH_ATTN"]
    if os.environ.get("BENCH_FUSE"):         # A/B: 1 | 0 (fused QKV GEMM)
        model.cfg.fuse_qkv = os.environ["BENCH_FUSE"] == "1"
    if os.environ.get("BENCH_LAYOUT"):       # A/B: bthd | bhtd (attn layout)
        model.cfg.attn_layout = os.environ["BENCH_LAYOUT"]
    if os.environ.get("BENCH_AKERN"):        # A/B: auto | xla | pallas
        model.cfg.attn_kernel = os.environ["BENCH_AKERN"]
    if os.environ.get("BENCH_FLASH"):        # A/B: 1 | 0 (Pallas flash attn)
        model.cfg.use_flash_attention = os.environ["BENCH_FLASH"] == "1"
    model.initialize(
        d, active_adaptors=("text", "image_vit", "audio_fbank", "motion_6d"),
        dtype=jnp.bfloat16,
    )

    rng = np.random.default_rng(0)

    def text_tgt(B, Td):
        tgt = rng.integers(d.nspecial, d.nspecial + 1000, size=(B, Td)).astype(np.int32)
        prev = np.concatenate([np.full((B, 1), d.bos(), np.int32), tgt[:, :-1]], 1)
        return jnp.asarray(prev), jnp.asarray(tgt)

    batches = {}
    # caption: IMAGE -> TEXT
    prev, tgt = text_tgt(CAPTION["B"], CAPTION["dec_tok"])
    img = jnp.asarray(rng.random((CAPTION["B"], CAPTION["img"], CAPTION["img"], 3)), jnp.float32)
    batches["caption"] = {
        "net_input": {"slots": [
            SlotBatch(ModalityType.IMAGE, True, {"inputs": img}, "img"),
            SlotBatch(ModalityType.TEXT, False, {"inputs": prev}, "cap"),
        ]},
        "target": tgt,
    }
    # text infilling: TEXT -> TEXT
    prev, tgt = text_tgt(INFILL["B"], INFILL["dec_tok"])
    src = rng.integers(d.nspecial, d.nspecial + 1000, size=(INFILL["B"], INFILL["src_tok"])).astype(np.int32)
    batches["text_infilling"] = {
        "net_input": {"slots": [
            SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(src)}, "src"),
            SlotBatch(ModalityType.TEXT, False, {"inputs": prev}, "tgt"),
        ]},
        "target": tgt,
    }
    # ASR: AUDIO fbank -> TEXT
    prev, tgt = text_tgt(ASR["B"], ASR["dec_tok"])
    fb = jnp.asarray(rng.standard_normal((ASR["B"], ASR["frames"], ASR["mels"])), jnp.float32)
    batches["asr"] = {
        "net_input": {"slots": [
            SlotBatch(ModalityType.AUDIO, True, {"inputs": fb}, "wav"),
            SlotBatch(ModalityType.TEXT, False, {"inputs": prev}, "txt"),
        ]},
        "target": tgt,
    }
    # grounding/VQA: IMAGE + TEXT query -> box-bin / answer tokens
    prev, tgt = text_tgt(GROUND["B"], GROUND["dec_tok"])
    gimg = jnp.asarray(rng.random((GROUND["B"], GROUND["img"], GROUND["img"], 3)), jnp.float32)
    q = rng.integers(d.nspecial, d.nspecial + 1000,
                     size=(GROUND["B"], GROUND["q_tok"])).astype(np.int32)
    batches["grounding_vqa"] = {
        "net_input": {"slots": [
            SlotBatch(ModalityType.IMAGE, True, {"inputs": gimg}, "img"),
            SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(q)}, "query"),
            SlotBatch(ModalityType.TEXT, False, {"inputs": prev}, "box"),
        ]},
        "target": tgt,
    }
    # text-to-motion: TEXT -> MOTION features, diffusion criterion
    msrc = rng.integers(d.nspecial, d.nspecial + 1000,
                        size=(MOTION["B"], MOTION["src_tok"])).astype(np.int32)
    mval = jnp.asarray(rng.standard_normal((MOTION["B"], MOTION["dec_tok"], MOTION["feat"])),
                       jnp.float32)
    batches["motion_t2m"] = {
        "net_input": {"slots": [
            SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.asarray(msrc)}, "text"),
            SlotBatch(ModalityType.MOTION, False,
                      {"value": mval, "masks": jnp.ones((MOTION["B"], MOTION["dec_tok"]), bool)},
                      "bvh"),
        ]},
    }
    return model, d, batches


# ----------------------------------------------------------------- TPU side
def measure_tpu_multitask(model, d, batches):
    """Reference co-training semantics: per update, each task's jitted grad
    program runs, gradient sums accumulate on device, one optimizer step.
    Timed windows end with a scalar readback (see module docstring)."""
    import jax

    from ofasys_tpu.configure.configs import OptimizationConfig
    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState

    from ofasys_tpu.engine.criterion.diffusion_loss import (
        DiffusionCriterion,
        DiffusionCriterionConfig,
    )

    crit = LabelSmoothedCrossEntropyCriterion(
        LabelSmoothedCrossEntropyCriterionConfig(), pad_id=d.pad()
    )
    diff_crit = DiffusionCriterion(DiffusionCriterionConfig(), pad_id=d.pad())
    optimizer = build_optimizer(OptimizationConfig(lr=(1e-4,), warmup_updates=100), total_num_update=10000)
    params = model.init_params(
        jax.random.PRNGKey(0), [b["net_input"]["slots"] for b in batches.values()]
    )
    state = TrainState.create(params, optimizer)

    from ofasys_tpu.engine.train_step import make_multitask_train_step

    fused = make_multitask_train_step(
        model,
        {name: (diff_crit if name == "motion_t2m" else crit) for name in batches},
        optimizer,
    )
    step = jax.jit(fused, donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)

    def one_update(state):
        return step(state, batches, rng)

    state, metrics = one_update(state)  # compile
    _ = float(metrics["gnorm"])         # force

    samples_per_update = sum(t["B"] for t in TASKS)
    rates = []
    for _ in range(CHUNKS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = one_update(state)
        _ = float(metrics["gnorm"])     # readback: waits for the full chain
        dt = time.perf_counter() - t0
        rates.append((samples_per_update * STEPS / dt, dt))
    rates.sort()
    rate, dt = rates[len(rates) // 2]
    return rate, dt / STEPS


def measure_rtt():
    """Tunnel round-trip: trivial jitted scalar readback, median of 10."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    f = jax.jit(lambda x: x + 1.0)
    _ = float(f(jnp.float32(0.0)))
    lats = []
    for i in range(30):
        t0 = time.perf_counter()
        _ = float(f(jnp.float32(i)))
        lats.append(time.perf_counter() - t0)
    return float(np.median(lats)) * 1000.0


def measure_decode_latency(model, d):
    """Caption-style greedy decode p50 (BASELINE metric #2): base arch,
    batch 1, image source -> 16 tokens. generate() materializes numpy
    output, so wall time includes the true device chain + one tunnel RTT.

    decode_device_ms_est (wall - RTT) is an UPPER bound on device time: an
    xplane trace of this exact call shows ~11.7ms device-busy per decode
    (~0.7ms/token, near the ~0.3ms/token HBM bound); the remainder is
    host/transfer gaps that vanish off the tunnel."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ofasys_tpu import ModalityType
    from ofasys_tpu.generator import SequenceGenerator
    from ofasys_tpu.utils.pytree import SlotBatch

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, CAPTION["img"], CAPTION["img"], 3)), jnp.float32)
    tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.zeros((1, 4), jnp.int32)}, "cap")
    slots = [SlotBatch(ModalityType.IMAGE, True, {"inputs": img}, "img"), tgt]
    params = model.init_params(jax.random.PRNGKey(0), slots)
    gen = SequenceGenerator(model, d, beam_size=1, max_len_b=16, min_len=15)
    sample = {"net_input": {"slots": slots}}
    gen.generate(params, sample)  # compile
    gen.generate(params, sample)  # warm the device-arg caches
    # 30 calls, p50: the wall floor is one tunnel RTT + ~12ms device-busy
    # (xplane-verified); jitter is RTT variance, so a larger sample pins the
    # median (r2's 10-call median wandered 54 -> 68ms between runs)
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        gen.generate(params, sample)
        lats.append(time.perf_counter() - t0)
    return float(np.median(lats)) * 1000.0


# --------------------------------------------------------- torch CPU baseline
def measure_torch_reference_baseline():
    """The ACTUAL reference model (/root/reference GeneralistModel, torch,
    its own adaptors: resnet image encoder + fbank conv subsampler + text),
    same task mix and batch shapes, reference co-training semantics
    (per update: each task fwd+bwd, summed grads, one AdamW step) on CPU —
    the reference's supported CPU mode. Returns samples/sec.

    This is the apples-to-apples denominator (the matched nn.Transformer
    below is the conservative secondary): base arch resolves to 6+6 layers
    E=768 with resnet101 (reference model/ofa.py:555-562)."""
    from ofasys_tpu.utils.reference_compat import import_reference

    import_reference()
    import torch

    torch.manual_seed(0)
    from ofasys import ModalityType as RefMod
    from ofasys.model.ofa import GeneralistModel as RefModel
    from ofasys.model.ofa import GeneralistModelConfig as RefCfg
    from ofasys.preprocessor.dictionary import Dictionary as RefDict
    from ofasys.preprocessor.instruction import Slot as RefSlot

    rcfg = RefCfg()
    rcfg.arch = ARCH
    rcfg.share_all_embeddings = True
    rcfg.no_scale_embedding = True
    rcfg.layernorm_embedding = True
    rcfg.dropout = rcfg.attention_dropout = rcfg.activation_dropout = 0.0
    for a in ("text", "image_resnet", "audio_fbank", "motion_6d"):
        getattr(rcfg.adaptor, a).is_active = True

    rd = RefDict()
    for i in range(VOCAB_EXTRA):
        rd.add_symbol(f"<text>_{i}")
    rd.pad_to_multiple_(8)
    rm = RefModel(rcfg)
    rm.initialize(rd)
    rm.train()
    V = len(rd)
    opt = torch.optim.AdamW(rm.parameters(), lr=1e-4)

    g = torch.Generator().manual_seed(0)

    def text_pair(B, Td):
        tgt = torch.randint(5, min(1000, V), (B, Td), generator=g)
        prev = tgt.clone()
        prev[:, 0] = rd.bos()
        return prev, tgt

    task_batches = []
    prev, tgt = text_pair(CAPTION["B"], CAPTION["dec_tok"])
    task_batches.append((
        [RefSlot(RefMod.IMAGE, True,
                 torch.rand(CAPTION["B"], 3, CAPTION["img"], CAPTION["img"], generator=g),
                 column_name="img"),
         RefSlot(RefMod.TEXT, False, prev, column_name="cap")],
        tgt,
    ))
    prev, tgt = text_pair(INFILL["B"], INFILL["dec_tok"])
    task_batches.append((
        [RefSlot(RefMod.TEXT, True,
                 torch.randint(5, min(1000, V), (INFILL["B"], INFILL["src_tok"]), generator=g),
                 column_name="src"),
         RefSlot(RefMod.TEXT, False, prev, column_name="tgt")],
        tgt,
    ))
    prev, tgt = text_pair(ASR["B"], ASR["dec_tok"])
    task_batches.append((
        [RefSlot(RefMod.AUDIO, True,
                 {"fbank": torch.randn(ASR["B"], ASR["frames"], ASR["mels"], generator=g),
                  "fbank_lengths": torch.full((ASR["B"],), ASR["frames"], dtype=torch.long)},
                 column_name="wav"),
         RefSlot(RefMod.TEXT, False, prev, column_name="txt")],
        tgt,
    ))
    prev, tgt = text_pair(GROUND["B"], GROUND["dec_tok"])
    task_batches.append((
        [RefSlot(RefMod.IMAGE, True,
                 torch.rand(GROUND["B"], 3, GROUND["img"], GROUND["img"], generator=g),
                 column_name="img"),
         RefSlot(RefMod.TEXT, True,
                 torch.randint(5, min(1000, V), (GROUND["B"], GROUND["q_tok"]), generator=g),
                 column_name="query"),
         RefSlot(RefMod.TEXT, False, prev, column_name="box")],
        tgt,
    ))
    # motion diffusion leg through the reference's own motion_6d adaptor
    # (adaptor/motion_6d.py:68-127): full-context decode of noised features;
    # L1 head stands in for its p_losses (q_sample is elementwise-negligible)
    motion_slots = [
        RefSlot(RefMod.TEXT, True,
                torch.randint(5, min(1000, V), (MOTION["B"], MOTION["src_tok"]), generator=g),
                column_name="text"),
        # default_adaptor[MOTION] is 'text' in the reference
        # (adaptor/general.py:43) — route explicitly, like its instruction
        # templates do; padding mask is fairseq convention (True = pad)
        RefSlot(RefMod.MOTION, False,
                {"value": torch.randn(MOTION["B"], MOTION["dec_tok"], MOTION["feat"], generator=g),
                 "masks": torch.zeros(MOTION["B"], MOTION["dec_tok"], dtype=torch.bool),
                 "noise_level": torch.randint(0, 999, (MOTION["B"],), generator=g)},
                column_name="bvh", attributes=["adaptor=motion_6d"]),
    ]

    def one_update():
        opt.zero_grad()
        for slots, tgt in task_batches:
            out = rm(slots)
            logits = out[0] if isinstance(out, tuple) else out
            loss = torch.nn.functional.cross_entropy(
                logits.reshape(-1, V), tgt.reshape(-1)
            )
            loss.backward()
        out = rm(motion_slots)
        pred = out[0] if isinstance(out, tuple) else out
        torch.nn.functional.l1_loss(pred, torch.randn_like(pred)).backward()
        opt.step()

    one_update()  # warmup
    t0 = time.perf_counter()
    one_update()
    dt = time.perf_counter() - t0
    return sum(t["B"] for t in TASKS) / dt


def measure_torch_cpu_baseline():
    """Architecture-matched torch CPU multi-task update (fp32, the
    reference's CPU mode): per update each task does fwd+bwd on a matched
    enc-dec (conv patch embed for IMAGE, strided conv1d for AUDIO), then one
    optimizer step. Returns samples/sec."""
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    from ofasys_tpu.model.config import GeneralistModelConfig

    cfg = GeneralistModelConfig(arch=ARCH)
    E, H = cfg.encoder.embed_dim, cfg.encoder.attention_heads
    V = VOCAB_EXTRA + 128

    model = nn.Transformer(
        d_model=E, nhead=H,
        num_encoder_layers=cfg.encoder.layers, num_decoder_layers=cfg.decoder.layers,
        dim_feedforward=cfg.encoder.ffn_embed_dim, dropout=0.0, batch_first=True,
    )
    embed = nn.Embedding(V, E)
    proj = nn.Linear(E, V, bias=False)
    patch = nn.Conv2d(3, E, kernel_size=16, stride=16)
    sub = nn.Sequential(
        nn.Conv1d(ASR["mels"], E, 5, stride=2, padding=2), nn.GELU(),
        nn.Conv1d(E, E, 5, stride=2, padding=2), nn.GELU(),
    )
    motion_in = nn.Linear(MOTION["feat"], E)
    motion_out = nn.Linear(E, MOTION["feat"])
    params = (list(model.parameters()) + list(embed.parameters()) + list(proj.parameters())
              + list(patch.parameters()) + list(sub.parameters())
              + list(motion_in.parameters()) + list(motion_out.parameters()))
    opt = torch.optim.AdamW(params, lr=1e-4)

    g = torch.Generator().manual_seed(0)
    img = torch.rand(CAPTION["B"], 3, CAPTION["img"], CAPTION["img"], generator=g)
    gimg = torch.rand(GROUND["B"], 3, GROUND["img"], GROUND["img"], generator=g)
    gq = torch.randint(0, V, (GROUND["B"], GROUND["q_tok"]), generator=g)
    fb = torch.randn(ASR["B"], ASR["mels"], ASR["frames"], generator=g)
    txt_src = torch.randint(0, V, (INFILL["B"], INFILL["src_tok"]), generator=g)
    msrc = torch.randint(0, V, (MOTION["B"], MOTION["src_tok"]), generator=g)
    mval = torch.randn(MOTION["B"], MOTION["dec_tok"], MOTION["feat"], generator=g)
    tgts = {t["name"]: torch.randint(0, V, (t["B"], t["dec_tok"]), generator=g)
            for t in TASKS if not t.get("feat")}

    def encoders():
        return {
            "caption": patch(img).flatten(2).transpose(1, 2),       # (B,196,E)
            "text_infilling": embed(txt_src),                       # (B,64,E)
            "asr": sub(fb).transpose(1, 2),                         # (B,120,E)
            "grounding_vqa": torch.cat(                              # (B,212,E)
                [patch(gimg).flatten(2).transpose(1, 2), embed(gq)], dim=1),
        }

    def one_update():
        opt.zero_grad()
        srcs = encoders()
        for name, src in srcs.items():
            tgt = tgts[name]
            out = model(src, embed(tgt))
            loss = nn.functional.cross_entropy(proj(out).reshape(-1, V), tgt.reshape(-1))
            loss.backward()
        # motion diffusion leg: full-context decoder over frames, L1 head
        out = motion_out(model(embed(msrc), motion_in(mval)))
        nn.functional.l1_loss(out, torch.randn_like(out)).backward()
        opt.step()

    one_update()  # warmup
    n = 2
    t0 = time.perf_counter()
    for _ in range(n):
        one_update()
    dt = time.perf_counter() - t0
    return sum(t["B"] for t in TASKS) * n / dt


def get_baseline():
    """Returns (matched_nn_transformer_rate, reference_model_rate); both are
    measured once and cached (minutes of CPU each)."""
    data = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            data = json.load(f)
        if data.get("config") != BASELINE_KEY:
            data = {}
    changed = False
    if "torch_cpu_samples_per_sec" not in data:
        data["torch_cpu_samples_per_sec"] = measure_torch_cpu_baseline()
        changed = True
    if "torch_reference_samples_per_sec" not in data:
        try:
            data["torch_reference_samples_per_sec"] = measure_torch_reference_baseline()
        except Exception as e:
            data["torch_reference_samples_per_sec"] = None
            data["torch_reference_error"] = repr(e)[:200]
        changed = True
    if changed:
        data["config"] = BASELINE_KEY
        with open(BASELINE_CACHE, "w") as f:
            json.dump(data, f)
    return data["torch_cpu_samples_per_sec"], data.get("torch_reference_samples_per_sec")


def main():
    model, d, batches = build_model_and_batches()
    rate, sec_per_update = measure_tpu_multitask(model, d, batches)

    cfg = model.cfg
    fl = flops_per_update(
        cfg.encoder.embed_dim, cfg.encoder.ffn_embed_dim,
        cfg.encoder.layers, cfg.decoder.layers, len(d),
    )
    tflops = fl / sec_per_update / 1e12
    mfu = fl / sec_per_update / V5E_BF16_PEAK

    try:
        p50_ms = round(measure_decode_latency(model, d), 2)
        rtt_ms = round(measure_rtt(), 2)
        device_ms = round(max(p50_ms - rtt_ms, 0.0), 2)
    except Exception:
        p50_ms = rtt_ms = device_ms = None
    try:
        # BENCH_NO_BASELINE skips the torch-CPU denominators (minutes of CPU
        # at experiment configs whose key misses the cache)
        base, ref_base = (
            (None, None) if os.environ.get("BENCH_NO_BASELINE") else get_baseline()
        )
    except Exception:
        base = ref_base = None

    out = {
        "metric": (f"mixed-modality multi-task train (caption+infilling+asr"
                   f"+grounding/vqa+motion-diffusion, {ARCH} arch, summed co-training)"),
        "value": round(rate, 2),
        "unit": "samples/sec/chip",
        # all tasks run inside the same fused update, so per-task rate is
        # its batch contribution per update
        "per_task_samples_per_sec": {t["name"]: round(t["B"] / sec_per_update, 1) for t in TASKS},
        # conservative denominator: architecture-matched torch nn.Transformer
        "vs_baseline": round(rate / base, 2) if base else None,
        # apples-to-apples denominator: the ACTUAL reference GeneralistModel
        # (its own resnet/fbank/text adaptors) on the same task mix, CPU
        "vs_reference_torch_cpu": round(rate / ref_base, 2) if ref_base else None,
        "tflops": round(tflops, 1),
        "mfu_vs_v5e_peak": round(mfu, 3),
        "sec_per_update": round(sec_per_update, 4),
        "decode_p50_ms_16tok": p50_ms,
        "tunnel_rtt_ms": rtt_ms,
        "decode_device_ms_est": device_ms,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
