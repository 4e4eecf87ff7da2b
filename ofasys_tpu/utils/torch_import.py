"""PyTorch checkpoint importer: reference OFASys state_dicts -> our param tree.

The released checkpoints (multitask_10k.pt etc., reference
docs/source/start/quickstart.rst:72) store a torch state_dict with fairseq
naming (encoder./decoder. prefixes, adaptor submodules,
token_rel_pos_table_list ModuleLists). This module maps each of OUR flax
param paths to its reference key and transforms layouts:

  torch Linear weight (out,in)   -> flax kernel (in,out)      [transpose]
  torch Embedding weight         -> flax embedding
  torch LayerNorm weight/bias    -> flax scale/bias
  torch Conv2d (out,in,kh,kw)    -> flax (kh,kw,in,out)
  rel-pos ModuleList of L tables -> one stacked (L, nb, H) param
  BatchNorm running stats        -> FrozenBatchNorm mean/var

``export_reference_state_dict`` provides the inverse (JAX -> torch naming),
used both for interop and to round-trip-test the mapping without the real
checkpoint (tests/test_torch_import.py).
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def flax_to_reference_key(path: str) -> Optional[Tuple[str, str]]:
    """Our param path -> (reference key, transform). transform in
    {'linear', 'embed', 'ln', 'conv', 'rel_stack', 'direct'}."""
    p = path

    # shared token embedding (registered under both adaptors in the
    # reference; encoder copy is canonical)
    if p == "embed_tokens/embedding":
        return "encoder.adaptor.embed_tokens.weight", "embed"

    m = re.match(r"(encoder|decoder)_adaptor/(.+)", p)
    if m:
        side, rest = m.group(1), m.group(2)
        base = f"{side}.adaptor"
        if rest.startswith(("pos_q_linear", "pos_k_linear")):
            name, leaf = rest.split("/")
            return f"{base}.{name}.{'weight' if leaf == 'kernel' else 'bias'}", \
                ("linear" if leaf == "kernel" else "direct")
        # per-adaptor params: text/..., image_resnet/..., ...
        adaptor, sub = rest.split("/", 1)
        ab = f"{base}.{adaptor}"
        if sub.startswith("embed_images/"):
            # ResNet trunk (reference module/resnet.py, torchvision naming):
            # our layer{s}_{i} flat names -> torch layer{s}.{i} Sequential
            # indices; downsample_conv/downsample_bn -> downsample.0/.1;
            # FrozenBatchNorm mean/var -> running stats buffers.
            r = re.sub(r"layer(\d+)_(\d+)", r"layer\1.\2", sub)
            r = r.replace("downsample_conv", "downsample.0")
            r = r.replace("downsample_bn", "downsample.1")
            name, leaf = r.rsplit("/", 1)
            torch_leaf = {
                "kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var",
            }[leaf]
            return f"{ab}.{name.replace('/', '.')}.{torch_leaf}", \
                ("linear" if leaf == "kernel" else "direct")
        if sub == "rel_pos_table":
            return f"{ab}.token_rel_pos_table_list", "rel_stack"
        if sub == "image_rel_pos_table":
            return f"{ab}.image_rel_pos_table_list", "rel_stack"
        if sub == "type_embedding":
            # torch nn.Embedding(1, E).weight is (1, E); ours is a bare (E,)
            # row (reference adaptor/base.py:143)
            return f"{ab}.type_embedding.weight", "row"
        if sub.endswith("/embedding"):
            name = sub[: -len("/embedding")]
            return f"{ab}.{name}.weight", "embed"
        if "/scale" in sub or "/bias" in sub:
            name, leaf = sub.rsplit("/", 1)
            torch_leaf = "weight" if leaf == "scale" else "bias"
            return f"{ab}.{name.replace('/', '.')}.{torch_leaf}", "direct"
        if sub.endswith("/kernel"):
            name = sub[: -len("/kernel")].replace("/", ".")
            return f"{ab}.{name}.weight", "linear"
        return f"{ab}.{sub.replace('/', '.')}", "direct"

    m = re.match(r"(encoder|decoder)/layers_(\d+)/(.+)", p)
    if m:
        side, i, rest = m.groups()
        base = f"{side}.layers.{i}"
        # my ffn/* maps to flat fc1/fc2/ffn_layernorm in the reference;
        # attn LN names (attn_ln / self_attn_ln / cross_attn_ln) already match
        rest = rest.replace("ffn/fc2_ln", "ffn_layernorm").replace("ffn/", "")
        if rest.endswith("/kernel"):
            return f"{base}.{rest[:-7].replace('/', '.')}.weight", "linear"
        if rest.endswith("/scale"):
            return f"{base}.{rest[:-6].replace('/', '.')}.weight", "direct"
        if rest.endswith("/bias"):
            return f"{base}.{rest[:-5].replace('/', '.')}.bias", "direct"
        if rest.endswith("c_attn"):
            return f"{base}.{rest.replace('/', '.')}", "direct"
        if rest == "w_resid":
            return f"{base}.w_resid", "direct"
        return f"{base}.{rest.replace('/', '.')}", "direct"

    m = re.match(r"(encoder|decoder)/layer_norm/(scale|bias)", p)
    if m:
        side, leaf = m.groups()
        return f"{side}.layer_norm.{'weight' if leaf == 'scale' else 'bias'}", "direct"

    m = re.match(r"cross_pos_([qk])_linear/(kernel|bias)", p)
    if m:
        qk, leaf = m.groups()
        return f"decoder.cross_pos_{qk}_linear.{'weight' if leaf == 'kernel' else 'bias'}", \
            ("linear" if leaf == "kernel" else "direct")
    return None


def _to_flax(value: np.ndarray, transform: str, target_shape) -> np.ndarray:
    v = np.asarray(value)
    if transform == "linear":
        # "linear" covers every torch weight that lands on a flax kernel:
        #   2D Linear (O,I) -> (I,O); 3D Conv1d (O,I,k) -> (k,I,O)
        #   [full reversal is correct for both]; 4D Conv2d (O,I,kh,kw)
        #   -> HWIO (kh,kw,I,O). Full reversal would give (kw,kh,I,O) —
        #   same SHAPE for square kernels but spatially transposed taps,
        #   so 4D must use the explicit conv permutation.
        v = v.transpose(2, 3, 1, 0) if v.ndim == 4 else v.T
    elif transform == "conv":
        v = v.transpose(2, 3, 1, 0)
    elif transform == "row":
        v = v.reshape(-1)
    if tuple(v.shape) != tuple(target_shape) and v.ndim == 4 and len(target_shape) == 4:
        v = v.transpose(2, 3, 1, 0)
    if (
        tuple(v.shape) != tuple(target_shape)
        and v.ndim == len(target_shape) + 1
        and v.shape[0] == 1
        and tuple(v.shape[1:]) == tuple(target_shape)
    ):
        v = v[0]
    return v


def _adapt_vocab_axis(v: np.ndarray, leaf: np.ndarray) -> Optional[np.ndarray]:
    """Embedding-like params whose leading (vocab) axis differs only by
    padding: fairseq pads the vocab to a multiple of 8, we pad to 128.
    Copy the overlapping rows onto the target leaf (keeps our init for the
    extra padding rows); None if the shapes differ in any other way."""
    if v.ndim != np.asarray(leaf).ndim or v.ndim < 1:
        return None
    if tuple(v.shape[1:]) != tuple(np.asarray(leaf).shape[1:]):
        return None
    n = min(v.shape[0], leaf.shape[0])
    out = np.array(np.asarray(leaf), copy=True)
    out[:n] = v[:n]
    return out


def import_reference_state_dict(
    state_dict: Dict[str, np.ndarray],
    target_params: Dict[str, Any],
    strict: bool = False,
) -> Tuple[Dict[str, Any], List[str], List[str]]:
    """Returns (new_params, missing_ours, unused_theirs)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(target_params)
    used = set()
    missing: List[str] = []
    out_leaves = []
    for path, leaf in flat:
        p = _path_str(path)
        mapped = flax_to_reference_key(p)
        new = None
        if mapped is not None:
            key, transform = mapped
            if transform == "rel_stack":
                L = leaf.shape[0]
                tables = []
                for i in range(L):
                    k = f"{key}.{i}.weight"
                    if k in state_dict:
                        tables.append(np.asarray(state_dict[k]))
                        used.add(k)
                if len(tables) == L:
                    new = np.stack(tables)
            elif key in state_dict:
                new = _to_flax(state_dict[key], transform, leaf.shape)
                used.add(key)
        if new is not None and tuple(new.shape) != tuple(leaf.shape):
            adapted = _adapt_vocab_axis(new, leaf)
            if adapted is not None:
                logger.warning(
                    "torch_import: vocab-axis repadded for %s: %s -> %s",
                    p, new.shape, np.asarray(leaf).shape,
                )
                new = adapted
        if new is not None and tuple(new.shape) == tuple(leaf.shape):
            out_leaves.append(new.astype(np.asarray(leaf).dtype))
        else:
            if mapped is not None:
                if new is not None:
                    logger.warning(
                        "torch_import: SKIPPED %s (shape %s vs target %s) — "
                        "keeping random init",
                        p, new.shape, np.asarray(leaf).shape,
                    )
                missing.append(p)
            out_leaves.append(leaf)
    unused = [k for k in state_dict if k not in used]
    if strict and missing:
        raise KeyError(f"missing {len(missing)} params, e.g. {missing[:5]}")
    return jax.tree_util.tree_unflatten(treedef, out_leaves), missing, unused


def export_reference_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping: our params -> torch-named state_dict (numpy)."""
    import jax

    out: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        p = _path_str(path)
        mapped = flax_to_reference_key(p)
        if mapped is None:
            continue
        key, transform = mapped
        v = np.asarray(leaf)
        if transform == "linear":
            # inverse of the import rule: 4D HWIO -> torch OIHW needs the
            # explicit conv permutation (plain reversal spatially transposes)
            out[key] = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
        elif transform == "conv":
            out[key] = v.transpose(3, 2, 0, 1)
        elif transform == "row":
            out[key] = v[None]
        elif transform == "rel_stack":
            for i in range(v.shape[0]):
                out[f"{key}.{i}.weight"] = v[i]
        else:
            out[key] = v
    return out


def taming_to_flax_params(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Map a taming-transformers GumbelVQ state_dict (the released
    vqgan_gumbel_f8_8192 checkpoint the reference tokenizer loads,
    reference preprocessor/tokenizer/vqgan.py:30-46) onto our
    model/vqgan.py GumbelVQ param tree.

    Naming: taming's ModuleList indices (down.{i}.block.{j}) become our flat
    module names (down_{i}_block_{j}); quantize.proj -> quant_proj,
    quantize.embed -> codebook, post_quant_conv -> post_quant_proj.
    Layouts: conv OIHW -> HWIO, GroupNorm weight -> scale."""
    out: Dict[str, Any] = {}

    def put(path: str, leaf: np.ndarray):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    for key, raw in sd.items():
        k = key[len("model."):] if key.startswith("model.") else key
        if k.startswith("loss.") or k.endswith(("temperature", "used")):
            continue
        v = np.asarray(raw)
        if k == "quantize.embed.weight":
            put("codebook/embedding", v)
            continue
        k = (
            k.replace("quantize.proj", "quant_proj")
            .replace("post_quant_conv", "post_quant_proj")
            .replace("mid.block_1", "mid_block_1")
            .replace("mid.block_2", "mid_block_2")
            .replace("mid.attn_1", "mid_attn")
        )
        k = re.sub(r"(down|up)\.(\d+)\.(block|attn)\.(\d+)", r"\1_\2_\3_\4", k)
        k = re.sub(r"(down|up)\.(\d+)\.(downsample|upsample)\.conv", r"\1_\2_\3", k)
        name, leaf = k.rsplit(".", 1)
        path = name.replace(".", "/")
        if leaf == "weight":
            if v.ndim == 4:
                put(f"{path}/kernel", v.transpose(2, 3, 1, 0))
            elif v.ndim == 1:  # GroupNorm affine
                put(f"{path}/scale", v)
            else:
                put(f"{path}/kernel", v.T)
        elif leaf == "bias":
            put(f"{path}/bias", v)
        else:
            logger.warning("taming_to_flax_params: skipping %s", key)
    return out


def hifigan_to_flax_params(sd: Dict[str, np.ndarray], num_kernels: int = 3) -> Dict[str, Any]:
    """Map a HiFi-GAN V1 generator state_dict (the released vocoder the
    reference's TTS postprocess loads, reference module/hifigan.py:115-172)
    onto our model/hifigan.py HifiGanGenerator param tree.

    Released checkpoints keep weight_norm unparametrized (weight_g/weight_v
    pairs); fuse them (w = g * v / ||v||, norm over all dims but 0 — torch
    weight_norm's default dim=0). Conv1d (O,I,k) -> flax (k,I,O).
    ConvTranspose1d (I,O,k) -> flax (k,I,O) SPATIALLY FLIPPED: flax
    ConvTranspose correlates where torch's transposed conv convolves
    (measured exact vs torch with SAME padding for even k-rate).
    The reference's flat resblocks ModuleList index n splits into our
    (upsample level i = n // num_kernels, kernel branch j = n % num_kernels)."""
    fused: Dict[str, np.ndarray] = {}
    for key, raw in sd.items():
        v = np.asarray(raw)
        if key.endswith(".weight_v"):
            g = np.asarray(sd[key[: -len("_v")] + "_g"])
            norm = np.sqrt((v.reshape(v.shape[0], -1) ** 2).sum(axis=1))
            w = v * (g.reshape(-1) / np.maximum(norm, 1e-12)).reshape(
                (-1,) + (1,) * (v.ndim - 1)
            )
            fused[key[: -len(".weight_v")] + ".weight"] = w
        elif key.endswith(".weight_g"):
            continue
        else:
            fused[key] = v

    out: Dict[str, Any] = {}

    def put(path: str, leaf: np.ndarray):
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    for key, v in fused.items():
        k = key[len("generator."):] if key.startswith("generator.") else key
        m = re.match(r"resblocks\.(\d+)\.(convs[12])\.(\d+)\.(weight|bias)", k)
        if m:
            n, sub, j, leaf = int(m.group(1)), m.group(2), m.group(3), m.group(4)
            path = f"resblocks_{n // num_kernels}_{n % num_kernels}/{sub}_{j}"
        else:
            m = re.match(r"(conv_pre|conv_post|ups\.(\d+))\.(weight|bias)", k)
            if not m:
                logger.warning("hifigan_to_flax_params: skipping %s", key)
                continue
            leaf = m.group(3)
            path = f"ups_{m.group(2)}" if m.group(2) is not None else m.group(1)
        if leaf == "bias":
            put(f"{path}/bias", v)
        elif path.startswith("ups_"):
            put(f"{path}/kernel", v.transpose(2, 0, 1)[::-1].copy())
        else:
            put(f"{path}/kernel", v.transpose(2, 1, 0))
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pt checkpoint to a numpy state_dict (CPU)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = state.get("model", state.get("state_dict", state.get("generator", state)))
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def check_converted_params(converted: Dict[str, Any], model, dummy, name: str,
                           method=None) -> None:
    """Validate a converted checkpoint tree against the param structure the
    flax model actually expects (shape-only, via ``jax.eval_shape`` of
    ``model.init`` — no FLOPs). Raises on missing or shape-mismatched
    leaves, warns on unconsumed ones, so a wrong/truncated checkpoint fails
    at load time with names instead of surfacing later as an opaque
    ScopeParamNotFound at apply time."""
    import jax

    kwargs = {"method": method} if method is not None else {}
    expected = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy, **kwargs)["params"]
    )
    exp_flat = {
        _path_str(p): v.shape
        for p, v in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    got_flat = {
        _path_str(p): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    missing = sorted(set(exp_flat) - set(got_flat))
    unconsumed = sorted(set(got_flat) - set(exp_flat))
    mismatched = sorted(
        f"{k}: ckpt {got_flat[k]} vs model {exp_flat[k]}"
        for k in set(exp_flat) & set(got_flat)
        if tuple(got_flat[k]) != tuple(exp_flat[k])
    )
    if missing or mismatched:
        raise ValueError(
            f"{name}: converted checkpoint does not match the model — "
            f"missing leaves: {missing[:10]}{'...' if len(missing) > 10 else ''}; "
            f"shape mismatches: {mismatched[:10]}{'...' if len(mismatched) > 10 else ''}"
        )
    if unconsumed:
        logger.warning("%s: %d unconsumed checkpoint leaves: %s%s", name,
                       len(unconsumed), unconsumed[:10],
                       "..." if len(unconsumed) > 10 else "")


# ------------------------------------------------------------------- CLI
def _dummy_slots(active_adaptors):
    """One tiny SlotBatch per adaptor so flax materializes its params
    (model/ofa.py:init_params traces every slot plan once)."""
    import jax.numpy as jnp

    from ofasys_tpu import ModalityType
    from ofasys_tpu.utils.pytree import SlotBatch

    slots = []
    for name in active_adaptors:
        if name == "text":
            continue                     # the text target below covers it
        if name in ("image_resnet", "image_vit"):
            slots.append(SlotBatch(
                ModalityType.IMAGE, True,
                {"inputs": jnp.zeros((1, 224, 224, 3), jnp.float32)}, name))
        elif name == "image_vqgan":
            slots.append(SlotBatch(
                ModalityType.IMAGE, False,
                {"inputs": jnp.zeros((1, 16), jnp.int32)}, name,
                attributes=("adaptor=image_vqgan",)))
        elif name in ("audio_fbank",):
            slots.append(SlotBatch(
                ModalityType.AUDIO, True,
                {"inputs": jnp.zeros((1, 80, 80), jnp.float32)}, name))
        elif name == "audio_tgt_fbank":
            slots.append(SlotBatch(
                ModalityType.AUDIO, False,
                {"inputs": jnp.zeros((1, 40, 80), jnp.float32)}, name,
                attributes=("adaptor=audio_tgt_fbank",)))
        elif name == "video_image_sequence":
            slots.append(SlotBatch(
                ModalityType.VIDEO, True,
                {"inputs": jnp.zeros((1, 2, 64, 64, 3), jnp.float32)}, name))
        elif name == "motion_6d":
            slots.append(SlotBatch(
                ModalityType.MOTION, False,
                {"inputs": jnp.zeros((1, 8, 135), jnp.float32)}, name,
                attributes=("adaptor=motion_6d",)))
        else:
            raise SystemExit(f"don't know how to build a dummy slot for "
                             f"adaptor {name!r}")
    src = SlotBatch(ModalityType.TEXT, True,
                    {"inputs": jnp.zeros((1, 4), jnp.int32)}, "src")
    tgt = SlotBatch(ModalityType.TEXT, False,
                    {"inputs": jnp.zeros((1, 4), jnp.int32)}, "tgt")
    # one slot list per source adaptor keeps each plan's trace small
    lists = [[src, tgt]]
    for s in slots:
        lists.append([s, tgt] if s.is_src else [src, s])
    return lists


def main(argv=None):
    """Convert a reference torch checkpoint into a hub-loadable one:

        python -m ofasys_tpu.utils.torch_import ref.pt out_dir \\
            --arch base --adaptors text,image_resnet [--dict vocab.txt]

    Without --dict the vocabulary is sized from the checkpoint's token
    embedding and filled with placeholder symbols — token ids then line up
    but readable symbols need the original vocab file. The output directory
    loads with ``OFASys.from_pretrained(out_dir + '/checkpoint_last')``.
    """
    import argparse

    ap = argparse.ArgumentParser(
        description=main.__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("ckpt", help="reference .pt checkpoint")
    ap.add_argument("out_dir", help="output checkpoint directory")
    ap.add_argument("--arch", default="base")
    ap.add_argument("--adaptors", default="text",
                    help="comma list, e.g. text,image_resnet,audio_fbank")
    ap.add_argument("--dict", dest="dict_path", default=None,
                    help="vocabulary file (Dictionary.load format)")
    ap.add_argument("--preprocessors", default="text",
                    help="comma list whose special symbols register into "
                         "the dictionary before the model is sized")
    ap.add_argument("--strict", action="store_true",
                    help="fail on any unmapped model parameter")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ofasys_tpu import GeneralistModel
    from ofasys_tpu.configure import to_dict
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils import checkpoint_utils

    from ofasys_tpu.preprocessor.general import GeneralPreprocess

    sd = load_torch_checkpoint(args.ckpt)
    preprocessors = [p.strip() for p in args.preprocessors.split(",") if p.strip()]
    if args.dict_path:
        with open(args.dict_path) as f:
            d = Dictionary.load(f)
        GeneralPreprocess(d, active=preprocessors)
    else:
        embed_key = "encoder.adaptor.embed_tokens.weight"
        if embed_key not in sd:
            raise SystemExit(
                f"--dict not given and {embed_key!r} not in the checkpoint; "
                "cannot infer vocabulary size")
        vocab = int(sd[embed_key].shape[0])
        d = Dictionary()
        # preprocessors register their special symbols FIRST — exactly the
        # trainer flow, and what from_pretrained assumes of the saved dict
        # (hub_interface.py raises if the embedding is smaller than the
        # rebuilt dictionary)
        GeneralPreprocess(d, active=preprocessors)
        i = 0
        while len(d) < vocab:
            d.add_symbol(f"<imported>_{i}")
            i += 1
        if len(d) > vocab:
            logger.warning(
                "dictionary (%d) exceeds checkpoint vocab (%d) after "
                "preprocessor symbols — embedding rows will be repadded",
                len(d), vocab)
        logger.warning("vocabulary inferred from checkpoint: placeholder "
                       "symbols — supply --dict for readable tokens")

    adaptors = tuple(a.strip() for a in args.adaptors.split(",") if a.strip())
    model = GeneralistModel(arch=args.arch)
    model.cfg.dropout = 0.0
    model.initialize(d, active_adaptors=adaptors, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0), _dummy_slots(adaptors))
    params, missing, unused = import_reference_state_dict(
        sd, params, strict=args.strict)
    print(f"imported: {len(jax.tree_util.tree_leaves(params))} leaves, "
          f"{len(missing)} left at random init, "
          f"{len(unused)} checkpoint keys unused")
    if missing:
        print("  random-init (first 10):", missing[:10])

    meta = {
        "num_updates": 0,
        "configstore": {},
        "global_dict": d.state_dict(),
        "model_cfg": to_dict(model.cfg),
        "active_adaptors": list(adaptors),
    }
    checkpoint_utils.save_checkpoint(
        args.out_dir, "checkpoint_last", {"params": params, "step": 0},
        meta=meta)
    print(f"wrote {args.out_dir}/checkpoint_last "
          f"(load with OFASys.from_pretrained)")


if __name__ == "__main__":
    main()
