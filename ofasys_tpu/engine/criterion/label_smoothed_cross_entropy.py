"""Label-smoothed cross entropy (reference
ofasys/engine/criterion/label_smoothed_cross_entropy.py:95).

Constraint-mask-aware smoothing: when a position carries a closed-set
constraint mask, smoothing mass is spread only over the allowed tokens
(reference :40-57). Everything is computed in fp32 with a single
log_softmax; per-position losses are masked by target != pad.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ofasys_tpu.configure import register_config
from ofasys_tpu.engine.criterion.base import BaseCriterion, CriterionConfig
from ofasys_tpu.utils.pytree import SlotBatch


@dataclass
class LabelSmoothedCrossEntropyCriterionConfig(CriterionConfig):
    label_smoothing: float = 0.1
    report_accuracy: bool = True
    ignore_eos: bool = False
    drop_worst_ratio: float = 0.0
    drop_worst_after: int = 0


def label_smoothed_nll_loss(
    lprobs: jax.Array,          # (N, V) fp32 log-probs
    target: jax.Array,          # (N,) int32
    epsilon: float,
    valid: jax.Array,           # (N,) bool — contributes to loss
    constraint_masks: Optional[jax.Array] = None,  # (N, V) bool allowed
) -> Tuple[jax.Array, jax.Array]:
    """Returns (loss_per_pos, nll_per_pos), both (N,) fp32, zeroed at invalid."""
    nll = -jnp.take_along_axis(lprobs, target[:, None], axis=-1)[:, 0]
    if constraint_masks is not None:
        smooth_sum = jnp.sum(jnp.where(constraint_masks, lprobs, 0.0), axis=-1)
        n_allowed = jnp.maximum(constraint_masks.sum(-1) - 1, 1).astype(jnp.float32)
    else:
        smooth_sum = jnp.sum(lprobs, axis=-1)
        n_allowed = jnp.float32(lprobs.shape[-1] - 1)
    smooth = -smooth_sum
    eps_i = epsilon / n_allowed
    loss = (1.0 - epsilon - eps_i) * nll + eps_i * smooth
    loss = jnp.where(valid, loss, 0.0)
    nll = jnp.where(valid, nll, 0.0)
    return loss, nll


@register_config("ofasys.criterion", "label_smoothed_cross_entropy", LabelSmoothedCrossEntropyCriterionConfig)
class LabelSmoothedCrossEntropyCriterion(BaseCriterion):
    def __call__(self, model, params, sample, rng=None, train: bool = True):
        slots = sample["net_input"]["slots"]
        rngs = {"dropout": rng} if (train and rng is not None) else None
        logits, extra = model.apply(params, slots, deterministic=not train, rngs=rngs)
        return self.compute_loss(logits, sample, train=train)

    def compute_loss(self, logits: jax.Array, sample, train: bool = True):
        cfg = self.cfg
        target = sample["target"]                      # (B, T) int32, pad = ignored
        pad_id = self.pad_id
        B, T = target.shape
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

        # constraint-range slicing (closed-set subvocab), applied like the
        # reference's dict_start/dict_end window when provided
        cmask = sample.get("constraint_masks")
        lprobs = lprobs.reshape(B * T, -1)
        tgt = target.reshape(B * T)
        valid = tgt != pad_id
        if cmask is not None:
            cmask = cmask.reshape(B * T, -1)
        loss_pos, nll_pos = label_smoothed_nll_loss(
            lprobs, tgt, cfg.label_smoothing, valid, cmask
        )

        # drop-worst: after drop_worst_after updates, keep only the
        # (1 - drop_worst_ratio) fraction of valid positions with the
        # smallest loss (reference label_smoothed_cross_entropy.py:80-84).
        # Rank-based so shapes stay static under jit.
        if train and cfg.drop_worst_ratio > 0.0:
            update_num = sample.get("update_num")
            gate = (
                update_num > cfg.drop_worst_after
                if update_num is not None
                else jnp.bool_(cfg.drop_worst_after <= 0)
            )
            ranked = jnp.where(valid, loss_pos, jnp.inf)
            order = jnp.argsort(ranked)
            rank = jnp.zeros_like(tgt).at[order].set(jnp.arange(tgt.shape[0]))
            n_keep = jnp.floor(
                valid.sum().astype(jnp.float32) * (1.0 - cfg.drop_worst_ratio)
            ).astype(jnp.int32)
            keep = jnp.where(gate, valid & (rank < n_keep), valid)
            loss_pos = jnp.where(keep, loss_pos, 0.0)
            nll_pos = jnp.where(keep, nll_pos, 0.0)
            valid = keep

        ntokens = valid.sum()
        loss = loss_pos.sum()
        nll_loss = nll_pos.sum()
        sample_size = jnp.where(
            jnp.bool_(cfg.sentence_avg), jnp.float32(B), ntokens.astype(jnp.float32)
        )
        logging_out = {
            "loss": loss,
            "nll_loss": nll_loss,
            "ntokens": ntokens,
            "nsentences": B,
            "sample_size": sample_size,
        }
        if cfg.report_accuracy:
            pred = jnp.argmax(lprobs, axis=-1)
            logging_out["n_correct"] = jnp.where(valid, pred == tgt, False).sum()
            logging_out["total"] = ntokens
        # raw summed loss: the train step divides the *accumulated* gradient
        # by the total sample_size (reference multiply_grads semantics,
        # engine/trainer.py:848-868), which keeps grad accumulation and
        # data-parallel psum exactly equivalent to one big batch.
        return loss, sample_size, logging_out
