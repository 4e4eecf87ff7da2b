"""Diffusion generator (reference ofasys/generator/diffusion_generator.py:78-118):
encode once, then DDIM-sample the target-slot features with the
full-context decoder as the denoiser; clamp hook from the preprocessor."""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.generator.base import MotionOutput
from ofasys_tpu.utils.pytree import SlotBatch
from ofasys_tpu.model.diffusion import GaussianDiffusion
from ofasys_tpu.ops.quant import as_variables as _vars


class DiffusionGenerator:
    def __init__(
        self,
        model,
        num_steps: int = 1000,
        schedule: str = "cosine",
        prediction_type: str = "epsilon",
        num_inference_steps: int = 50,
        eta: float = 0.0,
        guidance_weight: float = 0.0,
        clamp_fn: Optional[Callable] = None,
    ):
        self.model = model
        self.diffusion = GaussianDiffusion(num_steps=num_steps, schedule=schedule,
                                           prediction_type=prediction_type)
        self.num_inference_steps = num_inference_steps
        self.eta = eta
        self.guidance_weight = guidance_weight
        self.clamp_fn = clamp_fn
        self._compiled: Dict[Any, Any] = {}

    def generate(self, params, sample: Dict[str, Any], seed: int = 0) -> List[MotionOutput]:
        slots = sample["net_input"]["slots"]
        shape = SlotBatch.target_slot(slots).value["value"].shape
        if shape not in self._compiled:
            self._compiled[shape] = jax.jit(self._generate)
        feats = self._compiled[shape](params, slots, jax.random.PRNGKey(seed))
        feats = np.asarray(feats)
        masks = np.asarray(SlotBatch.target_slot(slots).value.get("masks"))
        outs = []
        for b in range(feats.shape[0]):
            f = feats[b]
            if masks is not None:
                f = f[masks[b]]
            outs.append(MotionOutput(feature=f))
        return outs

    def _generate(self, params, slots, rng):
        net = self.model.net
        src_slots = [s for s in slots if s.is_src]
        tgt_idx = max(i for i, s in enumerate(slots) if not s.is_src)
        tgt = slots[tgt_idx]
        enc = net.apply(_vars(params), src_slots, method=net.encode)
        shape = tgt.value["value"].shape

        def denoise(x_t, t):
            noised = dataclasses.replace(tgt, value={**tgt.value, "value": x_t, "noise_level": t})
            pred, _ = net.apply(_vars(params), [noised], enc,
                                method=net.decode_full, full_context=True)
            return pred.astype(jnp.float32)

        return self.diffusion.ddim_sample(
            denoise, shape, rng,
            num_inference_steps=self.num_inference_steps,
            eta=self.eta, guidance_weight=self.guidance_weight,
            clamp_fn=self.clamp_fn,
        )
