"""Diffusion training criterion (reference
ofasys/engine/criterion/diffusion_loss.py:23): corrupt the target-slot
features with q_sample at a random timestep, run the full-context decoder,
masked L1/MSE against the prediction target (+min-SNR weighting)."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ofasys_tpu.configure import register_config
from ofasys_tpu.engine.criterion.base import BaseCriterion, CriterionConfig
from ofasys_tpu.model.diffusion import GaussianDiffusion


@dataclass
class DiffusionCriterionConfig(CriterionConfig):
    num_steps: int = 1000
    schedule: str = "cosine"
    prediction_type: str = "epsilon"
    loss_type: str = "l1"          # 'l1' | 'l2'
    snr_gamma: Optional[float] = None


@register_config("ofasys.criterion", "diffusion_criterion", DiffusionCriterionConfig)
class DiffusionCriterion(BaseCriterion):
    def __init__(self, cfg: DiffusionCriterionConfig, pad_id: int = 1):
        super().__init__(cfg, pad_id)
        self.diffusion = GaussianDiffusion(
            num_steps=cfg.num_steps, schedule=cfg.schedule,
            prediction_type=cfg.prediction_type, snr_gamma=cfg.snr_gamma,
        )

    def __call__(self, model, params, sample, rng=None, train: bool = True):
        slots = sample["net_input"]["slots"]
        tgt_idx = max(i for i, s in enumerate(slots) if not s.is_src)
        tgt = slots[tgt_idx]
        x0 = tgt.value["value"].astype(jnp.float32)            # (B, T, F)
        masks = tgt.value.get("masks")                          # (B, T) True=valid
        B = x0.shape[0]

        rng = rng if rng is not None else jax.random.PRNGKey(0)
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        t = jax.random.randint(t_rng, (B,), 0, self.cfg.num_steps)
        noise = jax.random.normal(n_rng, x0.shape, jnp.float32)
        x_t = self.diffusion.q_sample(x0, t, noise)

        noised_slot = dataclasses.replace(
            tgt, value={**tgt.value, "value": x_t, "noise_level": t}
        )
        new_slots = list(slots)
        new_slots[tgt_idx] = noised_slot
        rngs = {"dropout": d_rng} if train else None
        pred, extra = model.apply(params, new_slots, deterministic=not train,
                                  rngs=rngs, full_context=True)

        target = self.diffusion.training_target(x0, noise)
        err = jnp.abs(pred - target) if self.cfg.loss_type == "l1" else (pred - target) ** 2
        w = self.diffusion.loss_weight(t)[:, None, None]
        err = err * w
        if masks is not None:
            err = jnp.where(masks[:, :, None], err, 0.0)
            ntokens = masks.sum()
        else:
            ntokens = jnp.asarray(x0.shape[0] * x0.shape[1])
        loss = err.sum() / x0.shape[-1]
        sample_size = ntokens.astype(jnp.float32)
        logging = {
            "loss": loss,
            "ntokens": ntokens,
            "nsentences": B,
            "sample_size": sample_size,
        }
        return loss, sample_size, logging
