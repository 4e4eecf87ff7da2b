"""Hub interface: load a trained checkpoint and run one-line inference
(reference ofasys/hub_interface.py:106-332).

    model = OFASys.from_pretrained("ckpt_dir/checkpoint_last")
    out = model.inference("[IMAGE:img] what does the image describe? -> [TEXT:cap]",
                          data={"img": image})
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu import ModalityType
from ofasys_tpu.configure import ConfigStore, from_dict
from ofasys_tpu.engine.train_step import TrainState
from ofasys_tpu.model.config import GeneralistModelConfig
from ofasys_tpu.model.ofa import GeneralistModel
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.preprocessor.general import GeneralPreprocess
from ofasys_tpu.preprocessor.instruction import Instruction
from ofasys_tpu.task.base import Task
from ofasys_tpu.utils import checkpoint_utils

logger = logging.getLogger("ofasys_tpu.hub")

# per-modality generation defaults (reference hub_interface.py:291-332)
_GEN_DEFAULTS = {
    ModalityType.TEXT: dict(beam_size=5, max_len_b=100, no_repeat_ngram_size=3),
    ModalityType.BOX: dict(beam_size=1, max_len_b=4, min_len=4),
    ModalityType.IMAGE: dict(beam_size=5, max_len_b=1024, min_len=1024, sampling=True,
                             sampling_topk=256),
    ModalityType.MOTION: dict(),
    ModalityType.AUDIO: dict(),
}


class OFASys:
    """Inference-time wrapper around GeneralistModel + GeneralPreprocess."""

    def __init__(self, model: GeneralistModel, params, global_dict: Dictionary,
                 general_preprocess: GeneralPreprocess, tasks: Optional[Dict[str, Task]] = None):
        net_vocab = getattr(getattr(model, "net", None), "vocab_size", None)
        if net_vocab is not None and net_vocab != len(global_dict):
            # Catch the silent-NaN footgun: preprocessors (byte fallback,
            # task ans2label namespaces) GROW the dictionary, so a model
            # initialized before the preprocessors were built has a smaller
            # embedding than the vocab — OOB gathers then fill with NaN
            # instead of erroring. Build preprocessors/tasks first, call
            # model.initialize(global_dict) last (or use vocab-remap
            # surgery, utils/checkpoint_utils.py remap_vocab).
            raise ValueError(
                f"model embedding was initialized for a {net_vocab}-token "
                f"vocabulary but the dictionary now has {len(global_dict)} "
                "entries — initialize the model AFTER all preprocessors/"
                "tasks have registered their symbols"
            )
        self.model = model
        self.params = params
        self.global_dict = global_dict
        self.general_preprocess = general_preprocess
        self.tasks = tasks or {}
        self._generators: Dict[Any, Any] = {}
        self._draft = None           # (draft_model, draft_params, gamma)
        self._ensemble = None        # (models list, params list) when >1 ckpt

    # ------------------------------------------------------------- loading
    @classmethod
    def from_pretrained(cls, path, dtype=jnp.bfloat16, use_ema: bool = False) -> "OFASys":
        """Rebuild everything from a checkpoint + its JSON metadata
        (reference hub_interface.py:106-160: configs + vocab travel in the
        checkpoint so inference needs nothing else).

        ``path`` may be a LIST of checkpoints — generation then ensembles
        them, averaging per-step probabilities (reference
        load_model_ensemble_and_task, utils/checkpoint_utils.py:346).
        ``use_ema`` serves the EMA shadow weights instead of the raw params
        (reference load_ema_from_checkpoint, utils/checkpoint_utils.py:712)."""
        if isinstance(path, (list, tuple)) and len(path) > 1:
            hubs = [cls.from_pretrained(p, dtype=dtype, use_ema=use_ema) for p in path]
            first = hubs[0]
            syms = first.global_dict.state_dict()["symbols"]
            for h in hubs[1:]:
                if h.global_dict.state_dict()["symbols"] != syms:
                    raise ValueError("ensemble members must share one vocabulary")
            first._ensemble = ([h.model for h in hubs], [h.params for h in hubs])
            return first
        if isinstance(path, (list, tuple)):
            path = path[0]
        raw, meta = checkpoint_utils.load_checkpoint(path)
        if meta is None:
            raise ValueError(f"checkpoint {path} has no .meta.json sidecar")
        global_dict = Dictionary.from_state_dict(meta["global_dict"])
        model_cfg = from_dict(GeneralistModelConfig, meta["model_cfg"])
        model = GeneralistModel(cfg=model_cfg)
        model.initialize(global_dict, active_adaptors=tuple(meta["active_adaptors"]), dtype=dtype)

        # rebuild task configs so task-specific generation defaults survive
        ConfigStore().load_state_dict(meta.get("configstore", {}), activate=False)

        params = raw["params"] if isinstance(raw, dict) and "params" in raw else raw
        if use_ema:
            ema = raw.get("ema_params") if isinstance(raw, dict) else None
            if ema is None:
                raise ValueError(
                    f"use_ema: checkpoint {path} has no EMA shadow "
                    "(train with ema.store_ema=True)"
                )
            params = ema
        # preprocessors: activate from checkpointed task templates when
        # available; text is always present
        active_pre = ["text"]
        for tcfg in meta.get("configstore", {}).get("ofasys.task", {}).values():
            template = tcfg.get("instruction", {}).get("template", "")
            for t in template.split("|||"):
                if t.strip():
                    tmp = Task(instruction=t.strip())
                    for p in tmp.required_preprocessors():
                        if p not in active_pre:
                            active_pre.append(p)
        gp = GeneralPreprocess(global_dict, active=active_pre)
        return cls(model, params, global_dict, gp)

    @classmethod
    def from_trainer(cls, trainer, tasks=None) -> "OFASys":
        """Wrap a live training session for in-process inference."""
        gp = tasks[0].general_preprocess if tasks else GeneralPreprocess(trainer.global_dict)
        return cls(trainer.model, trainer.state.params, trainer.global_dict, gp,
                   {t.name: t for t in (tasks or [])})

    # -------------------------------------------------------- quantization
    def quantize(self, mode: str = "w8a8", **kwargs) -> "OFASys":
        """Switch to int8 serving IN PLACE (ops/quant.py): matched matmul
        kernels move to an int8 ``qkern`` collection (halving their HBM
        bytes) and ``mode`` selects 'w8a8' (int8 MXU contraction) or 'w8'
        (dequantize to bf16). TPU-only win; training state is unaffected
        (quantize from a *copy* of trained params). Returns self."""
        from ofasys_tpu.ops.quant import quantize_for_serving

        if self._ensemble is not None:
            raise ValueError("quantize() does not support ensembles — quantize each member before ensembling")
        if not (isinstance(self.params, dict) and "qkern" in self.params):
            self.params = quantize_for_serving(
                self.params.get("params", self.params)
                if isinstance(self.params, dict) else self.params,
                **kwargs,
            )
        self.model.cfg.quant_mode = mode
        self._generators.clear()   # generators close over jitted shapes/cfg
        return self

    # ---------------------------------------------------- sharded serving
    def shard(self, parallel=None, mesh=None) -> "OFASys":
        """Shard serving params over a device mesh IN PLACE — tensor/model-
        parallel inference for models that exceed one chip's HBM (the 6b/8b/
        10b presets at bf16 don't fit a single v5e). The same regex sharding
        rules used in training (parallel/sharding.py) place each kernel;
        GSPMD then partitions every jitted generate/forward over the mesh,
        inserting the row-parallel psums the reference would have issued by
        hand (and never shipped — its trainer asserts mp_size == 1,
        reference engine/trainer.py:143). Decoded tokens are identical to
        single-device serving (tests/test_sharded_decode.py).

        Default layout is pure tensor parallelism over all visible devices;
        pass ``parallel=ParallelConfig(...)`` (e.g. data>1 to split serving
        batches) or a prebuilt ``mesh`` for anything else."""
        from ofasys_tpu.configure.configs import ParallelConfig
        from ofasys_tpu.parallel import build_mesh, shard_tree

        if mesh is None:
            mesh = build_mesh(parallel or ParallelConfig(data=1, tensor=-1))
        self.params = shard_tree(self.params, mesh)
        if self._ensemble is not None:
            models, plist = self._ensemble
            self._ensemble = (models, [shard_tree(p, mesh) for p in plist])
        if self._draft is not None:
            dm, dp, gamma = self._draft
            self._draft = (dm, shard_tree(dp, mesh), gamma)
        self._generators.clear()   # generators cache jitted programs
        return self

    # ------------------------------------------------------- speculative
    def set_draft(self, draft: "OFASys", gamma: int = 4) -> "OFASys":
        """Attach a DRAFT model (a smaller OFASys sharing this model's
        vocabulary) for speculative greedy decoding: `inference` calls that
        resolve to greedy generation (beam_size=1, no sampling / n-gram
        blocking / trie) route through `SpeculativeGenerator` — identical
        tokens, fewer sequential target steps. Other calls are unaffected.
        Pass gamma = draft tokens proposed per target verification."""
        if len(draft.global_dict) != len(self.global_dict):
            raise ValueError(
                "draft vocabulary differs from the target's "
                f"({len(draft.global_dict)} vs {len(self.global_dict)})"
            )
        self._draft = (draft.model, draft.params, gamma)
        self._generators.clear()
        return self

    # ----------------------------------------------------------- inference
    def inference(
        self,
        instruction: Union[str, Instruction],
        data: Optional[Union[Dict[str, Any], List[Dict[str, Any]]]] = None,
        **gen_overrides,
    ):
        """Format -> preprocess -> generate -> postprocess
        (reference hub_interface.py:175-258). ``data`` may be one dict or a
        list for batch inference; returns one (or a list of) n-best lists."""
        batched = isinstance(data, list)
        records = data if batched else [data or {}]

        ists = []
        for rec in records:
            ist = Instruction(instruction, split="test") if isinstance(instruction, str) else instruction
            ists.append(self.general_preprocess(ist.format(**rec)))
        sample = self.general_preprocess.collate(ists)

        target_modality = [s for s in sample["net_input"]["slots"] if not s.is_src][-1].modality
        gen_kwargs = dict(_GEN_DEFAULTS.get(target_modality, {}))
        gen_kwargs.update(gen_overrides)
        prefix = sample.get("prefix_tokens")
        has_prefix = prefix is not None and prefix.size
        speculative = (
            self._draft is not None
            and self._ensemble is None
            and gen_kwargs.get("beam_size", 5) == 1
            and not gen_kwargs.get("sampling", False)
            and not gen_kwargs.get("no_repeat_ngram_size", 0)
            and "constraint_trie" not in gen_kwargs
            and not has_prefix
        )
        key = (target_modality, speculative, tuple(sorted(gen_kwargs.items())))
        if key not in self._generators:
            if speculative:
                from ofasys_tpu.generator import SpeculativeGenerator

                draft_model, _, gamma = self._draft
                spec_kwargs = {
                    k: v for k, v in gen_kwargs.items()
                    if k in ("max_len_a", "max_len_b", "min_len", "lenpen",
                             "constraint_range")
                }
                self._generators[key] = SpeculativeGenerator(
                    self.model, draft_model, self.global_dict, gamma=gamma,
                    **spec_kwargs,
                )
            else:
                from ofasys_tpu.generator import SequenceGenerator

                self._generators[key] = SequenceGenerator(
                    self._ensemble[0] if self._ensemble else self.model,
                    self.global_dict, **gen_kwargs,
                )
        gen = self._generators[key]

        if speculative:
            outputs = gen.generate(self.params, self._draft[1], sample)
        else:
            outputs = gen.generate(
                self._ensemble[1] if self._ensemble else self.params, sample,
                prefix_tokens=prefix if has_prefix else None,
            )
        for hyps in outputs:
            self.general_preprocess.postprocess(hyps, sample)
        results = [hyps[0] if len(hyps) == 1 else hyps for hyps in outputs]
        return results if batched else results[0]
