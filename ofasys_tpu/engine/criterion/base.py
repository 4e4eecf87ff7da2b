"""Criterion base: pure loss functions over model outputs.

Counterpart of ofasys/engine/criterion/base.py:19. A criterion is a callable
``(model_apply, params, sample, rng) -> (loss, sample_size, logging_out)``
whose body is jit-traceable; ``reduce_metrics`` aggregates host-side logging
outputs across microbatches/workers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List

import jax.numpy as jnp

from ofasys_tpu.configure.configs import BaseDataclass


@dataclass
class CriterionConfig(BaseDataclass):
    is_active: bool = False
    sentence_avg: bool = False


class BaseCriterion:
    def __init__(self, cfg: CriterionConfig, pad_id: int = 1):
        self.cfg = cfg
        self.pad_id = pad_id

    def __call__(self, model, params, sample, rng=None, train: bool = True):
        raise NotImplementedError

    @classmethod
    def reduce_metrics(cls, logging_outputs: List[Dict[str, Any]], task_name=None) -> Dict[str, float]:
        """Sum summable fields and derive means (reference criteria expose
        reduce_metrics + logging_outputs_can_be_summed)."""
        agg: Dict[str, float] = {}
        for log in logging_outputs:
            for k, v in log.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        out: Dict[str, float] = {}
        ntokens = agg.get("ntokens", 0) or 1
        sample_size = agg.get("sample_size", 0) or 1
        for k, v in agg.items():
            out[k] = v
        if "loss" in agg:
            out["loss"] = agg["loss"] / sample_size
        if "nll_loss" in agg:
            out["nll_loss"] = agg["nll_loss"] / ntokens
        if "n_correct" in agg and agg.get("total", 0) > 0:
            out["accuracy"] = agg["n_correct"] / agg["total"]
        return out
