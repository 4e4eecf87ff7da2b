"""Golden-token parity through the FULL hub path.

test_reference_parity.py pins numerics at the ``net.apply`` level; this file
covers the remaining distance to the north star's "bit-identical greedy
decode" clause (reference docs/source/start/quickstart.rst:72): greedy tokens
recorded from the executable torch reference (fixed-seed random checkpoint)
must be reproduced token-for-token through our complete serving path

    save_checkpoint -> OFASys.from_pretrained -> inference -> postprocess

(reference ofasys/hub_interface.py:106-247) for a caption prompt (image
source), a text-infilling-style prompt (text source) and a visual-grounding
prompt (image + text source, BOX bin target with a constraint range).

The reference model consumes EXACTLY the arrays our GeneralPreprocess
produced for the same raw inputs (token IDs / normalized image tensor), so a
divergence isolates the hub path itself: the checkpoint round-trip, the
from_pretrained rebuild (dictionary / configs / adaptors), collation, the
jitted while_loop decode, and postprocess.

The released multitask_10k.pt remains unreachable (zero egress); the gated
harness at the bottom fires the same import + greedy-decode contract the
moment the asset exists locally (OFASYS_MULTITASK_CKPT), with an optional
sha256 pin.
"""

import hashlib
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "ofasys")),
    reason="reference repo not mounted",
)

CAPTION_TPL = "[IMAGE:img,adaptor=image_resnet] what does the image describe? -> [TEXT:cap]"
INFILL_TPL = "[TEXT:src] what is the complete text of \" [TEXT:mask] \"? -> [TEXT:tgt]"
GROUND_TPL = '[IMAGE:img,adaptor=image_resnet] which region does " [TEXT:txt] " describe? -> [BOX:box]'


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    from ofasys_tpu import GeneralistModel, OFASys
    from ofasys_tpu.configure import ConfigStore
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.general import GeneralPreprocess
    from ofasys_tpu.preprocessor.instruction import Instruction
    from ofasys_tpu.utils import checkpoint_utils
    from ofasys_tpu.utils.reference_compat import import_reference
    from ofasys_tpu.utils.torch_import import import_reference_state_dict

    import_reference()
    import torch

    store = ConfigStore()
    store.get("ofasys.preprocess", "image").config.patch_image_size = 32
    prev_rt = store.get("ofasys.adaptor", "image_resnet").config.resnet_type
    store.get("ofasys.adaptor", "image_resnet").config.resnet_type = "resnet50"

    # ---- our vocabulary is finalized by the preprocessors BEFORE model init
    d = Dictionary()
    gp = GeneralPreprocess(d, active=["text", "image", "box"])

    # ---- our model (fp32 end to end: parity vs the fp32 torch reference)
    E, F, L, H = 128, 256, 2, 4
    model = GeneralistModel(arch="tiny")
    cfg = model.cfg
    cfg.encoder.embed_dim = cfg.decoder.embed_dim = E
    cfg.encoder.ffn_embed_dim = cfg.decoder.ffn_embed_dim = F
    cfg.encoder.layers = cfg.decoder.layers = L
    cfg.encoder.attention_heads = cfg.decoder.attention_heads = H
    cfg.dropout = cfg.attention_dropout = cfg.activation_dropout = 0.0
    cfg.activation_fn = "gelu"
    model.initialize(d, active_adaptors=("text", "image_resnet"), dtype=jnp.float32)

    # raw prompt data (images as HWC float arrays the image preprocessor
    # accepts; deterministic)
    rng = np.random.default_rng(11)
    data = {
        "caption": {"img": (rng.random((48, 48, 3)) * 255).astype(np.float32)},
        "infill": {"src": "a quick brown fox", "mask": "jumps over"},
        "ground": {
            "img": (rng.random((48, 48, 3)) * 255).astype(np.float32),
            "txt": "the red ball",
        },
    }

    def collated(tpl, rec):
        ist = Instruction(tpl, split="test").format(**rec)
        return gp.collate([gp(ist)])

    samples = {
        "caption": collated(CAPTION_TPL, data["caption"]),
        "infill": collated(INFILL_TPL, data["infill"]),
        "ground": collated(GROUND_TPL, data["ground"]),
    }

    # init params over every batch structure so all adaptor params materialize
    params = model.init_params(
        jax.random.PRNGKey(0),
        [s["net_input"]["slots"] for s in samples.values()],
    )

    # ---- reference model with the identical vocabulary
    torch.manual_seed(3)
    from ofasys import ModalityType as RefMod
    from ofasys.model.ofa import GeneralistModel as RefModel
    from ofasys.model.ofa import GeneralistModelConfig as RefCfg
    from ofasys.preprocessor.dictionary import Dictionary as RefDict
    from ofasys.preprocessor.instruction import Slot as RefSlot

    rd = RefDict()
    assert rd.nspecial == d.nspecial and len(rd) == d.nspecial
    for sym in d.symbols[d.nspecial:]:
        rd.add_symbol(sym)
    assert len(rd) == len(d) and rd.bos() == d.bos() and rd.eos() == d.eos()

    rcfg = RefCfg()
    rcfg.arch = ""
    rcfg.share_all_embeddings = True
    rcfg.no_scale_embedding = True
    rcfg.layernorm_embedding = True
    for side in ("encoder", "decoder"):
        sub = getattr(rcfg, side)
        sub.embed_dim, sub.ffn_embed_dim = E, F
        sub.layers, sub.attention_heads = L, H
        sub.normalize_before = True
        sub.learned_pos = True
        if hasattr(sub, "output_dim"):
            sub.output_dim = E
        if hasattr(sub, "input_dim"):
            sub.input_dim = E
    rcfg.dropout = rcfg.attention_dropout = rcfg.activation_dropout = 0.0
    rcfg.activation_fn = "gelu"
    rcfg.adaptor.text.is_active = True
    rcfg.adaptor.image_resnet.is_active = True
    rcfg.adaptor.image_resnet.resnet_type = "resnet50"
    rm = RefModel(rcfg)
    rm.initialize(rd)
    rm.eval()
    # non-trivial BatchNorm running stats (fresh stats (0,1) would mask
    # running-stat mapping bugs)
    g = torch.Generator().manual_seed(7)
    for mod in rm.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.copy_(0.2 * torch.randn(mod.running_mean.shape, generator=g))
            mod.running_var.copy_(1.0 + 0.4 * torch.rand(mod.running_var.shape, generator=g))

    sd = {k: v.numpy() for k, v in rm.state_dict().items()}
    params, missing, _unused = import_reference_state_dict(sd, params)
    assert missing == [], missing

    # ---- the full serving checkpoint: params + metadata sidecar
    from ofasys_tpu.configure.config_store import to_dict

    tnode = store.get("ofasys.task", "default")
    tnode.config.instruction.template = " ||| ".join([CAPTION_TPL, INFILL_TPL, GROUND_TPL])
    store.set_active("ofasys.task", "default")
    save_dir = str(tmp_path_factory.mktemp("golden_ckpt"))
    checkpoint_utils.save_checkpoint(
        save_dir, "checkpoint_golden",
        {"params": params, "step": 0},
        meta={
            "num_updates": 0,
            "no_optimizer_state": True,
            "configstore": store.state_dict(groups=["ofasys.task", "ofasys.model"]),
            "global_dict": d.state_dict(),
            "model_cfg": to_dict(model.cfg),
            "active_adaptors": ["text", "image_resnet"],
        },
    )

    hub = OFASys.from_pretrained(os.path.join(save_dir, "checkpoint_golden"),
                                 dtype=jnp.float32)

    def ref_greedy(sample, steps, min_len, constraint=None):
        """The reference's greedy chain on OUR collated arrays: full forward,
        last-position argmax, EOS banned before min_len (mirrors
        generator/search.py apply_min_len), optional [lo,hi)+EOS constraint
        range (mirrors apply_constraint_range)."""
        ref_slots = []
        for s in sample["net_input"]["slots"]:
            if not s.is_src:
                continue
            x = np.asarray(s.value["inputs"])
            if s.modality.name == "IMAGE":
                ref_slots.append(RefSlot(RefMod.IMAGE, True,
                                         torch.from_numpy(x.transpose(0, 3, 1, 2)).float(),
                                         column_name=s.column_name))
            else:
                ref_slots.append(RefSlot(RefMod.TEXT, True,
                                         torch.from_numpy(x.astype(np.int64)),
                                         column_name=s.column_name))
        prev = np.full((1, 1), d.bos(), np.int64)
        toks = []
        for i in range(steps):
            slots = ref_slots + [RefSlot(RefMod.TEXT, False, torch.from_numpy(prev),
                                         column_name="prev")]
            with torch.no_grad():
                out = rm(slots)
            logits = (out[0] if isinstance(out, tuple) else out).float().numpy()[0, -1]
            if i < min_len:
                logits[d.eos()] = -np.inf
            if constraint is not None:
                lo, hi = constraint
                allowed = np.zeros_like(logits, bool)
                allowed[lo:hi] = True
                allowed[d.eos()] = True
                logits = np.where(allowed, logits, -np.inf)
            order = np.argsort(logits)
            # fixed-seed determinism guard: a near-tie would make fp32
            # conv-stack accumulation-order noise decide the argmax
            assert logits[order[-1]] - logits[order[-2]] > 1e-3, (
                "near-tied logits at step %d — pick a different seed" % i
            )
            nxt = int(order[-1])
            toks.append(nxt)
            prev = np.concatenate([prev, [[nxt]]], axis=1)
        return np.asarray(toks)

    yield {
        "hub": hub, "dict": d, "data": data, "samples": samples,
        "ref_greedy": ref_greedy, "gp": gp,
    }
    store.get("ofasys.adaptor", "image_resnet").config.resnet_type = prev_rt
    store.reset()


STEPS = 8


def test_caption_hub_golden_tokens(env):
    golden = env["ref_greedy"](env["samples"]["caption"], STEPS, STEPS)
    out = env["hub"].inference(
        CAPTION_TPL, data=env["data"]["caption"],
        beam_size=1, max_len_b=STEPS, min_len=STEPS, no_repeat_ngram_size=0,
    )
    np.testing.assert_array_equal(out.tokens[:STEPS], golden)
    assert out.tokens[STEPS] == env["dict"].eos()
    # postprocess ran: detokenized text present
    assert isinstance(out.text, str)


def test_infill_hub_golden_tokens(env):
    golden = env["ref_greedy"](env["samples"]["infill"], STEPS, STEPS)
    out = env["hub"].inference(
        INFILL_TPL, data=env["data"]["infill"],
        beam_size=1, max_len_b=STEPS, min_len=STEPS, no_repeat_ngram_size=0,
    )
    np.testing.assert_array_equal(out.tokens[:STEPS], golden)
    assert isinstance(out.text, str)


def test_grounding_hub_golden_box(env):
    box_pre = env["hub"].general_preprocess.name2pre["box"]
    lo, hi = box_pre.bin_start, box_pre.bin_end
    golden = env["ref_greedy"](env["samples"]["ground"], 4, 4, constraint=(lo, hi))
    out = env["hub"].inference(
        GROUND_TPL, data=env["data"]["ground"],
        beam_size=1, max_len_b=4, min_len=4, no_repeat_ngram_size=0,
        constraint_range=f"{lo},{hi}",
    )
    np.testing.assert_array_equal(out.tokens[:4], golden)
    # postprocess de-quantized the bins into box coordinates
    assert out.box is not None and out.box.shape == (4,)
    np.testing.assert_allclose(out.box, box_pre.decode(golden), atol=1e-6)


def test_import_strict_refuses_skipped_leaves(env):
    """strict=True must raise (not warn) when state_dict leaves are missing
    or shape-skipped — a silently partial import is how a wrong released
    checkpoint turns into plausible-looking garbage output."""
    import jax as _jax

    from ofasys_tpu.utils.torch_import import (
        export_reference_state_dict,
        import_reference_state_dict,
    )

    params = env["hub"].params
    sd = export_reference_state_dict(params.get("params", params)
                                     if isinstance(params, dict) else params)
    assert sd, "export produced an empty state_dict"
    # drop one real leaf -> strict import must refuse
    victim = sorted(k for k in sd if k.endswith("weight"))[0]
    broken = {k: v for k, v in sd.items() if k != victim}
    with pytest.raises(KeyError):
        import_reference_state_dict(broken, params, strict=True)


# ---------------------------------------------------------------------------
# Released-checkpoint harness: ready to fire when multitask_10k.pt exists
# locally (reference docs/source/start/quickstart.rst:72 downloads it; this
# environment has zero egress). Point OFASYS_MULTITASK_CKPT at the file —
# optionally pin OFASYS_MULTITASK_SHA256 — and this test imports it under
# strict=True and runs an EOS-terminated greedy caption decode end to end.
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    not os.path.isfile(os.environ.get("OFASYS_MULTITASK_CKPT", "")),
    reason="set OFASYS_MULTITASK_CKPT=/path/to/multitask_10k.pt to run",
)
def test_released_multitask_checkpoint_greedy_caption():
    import torch

    from ofasys_tpu import GeneralistModel
    from ofasys_tpu.utils.torch_import import import_reference_state_dict

    path = os.environ["OFASYS_MULTITASK_CKPT"]
    pin = os.environ.get("OFASYS_MULTITASK_SHA256")
    if pin:
        h = hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        assert h.hexdigest() == pin, "checkpoint does not match the pinned sha256"

    ckpt = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in ckpt["model"].items()} if "model" in ckpt else \
        {k: v.numpy() for k, v in ckpt.items()}

    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.general import GeneralPreprocess
    from ofasys_tpu.preprocessor.instruction import Instruction

    d = Dictionary()
    gp = GeneralPreprocess(d, active=["text", "image"])
    model = GeneralistModel(arch="base")
    model.initialize(d, active_adaptors=("text", "image_resnet"), dtype=jnp.float32)

    ist = Instruction(CAPTION_TPL, split="test").format(
        img=np.full((224, 224, 3), 128.0, np.float32)
    )
    sample = gp.collate([gp(ist)])
    params = model.init_params(jax.random.PRNGKey(0),
                               [sample["net_input"]["slots"]])
    params, missing, _ = import_reference_state_dict(sd, params, strict=True)
    assert missing == []

    from ofasys_tpu.generator import SequenceGenerator

    gen = SequenceGenerator(model, d, beam_size=1, max_len_b=16)
    out = gen.generate(params, sample)[0][0]
    assert out.tokens is not None and out.tokens[-1] == d.eos()
