"""Tacotron2-style TTS loss (reference ofasys/engine/criterion/tacotron2_loss.py:89):
L1 + MSE on mel frames (pre- and post-postnet) + EOS BCE, masked by target
lengths; optional guided-attention loss (reference :48, Tachibana et al.) —
decoder cross-attention probabilities are captured via flax's
'intermediates' collection (sown inside MultiheadAttention only when this
criterion requests them) and penalized for straying off the diagonal."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ofasys_tpu.configure import register_config
from ofasys_tpu.engine.criterion.base import BaseCriterion, CriterionConfig


@dataclass
class Tacotron2CriterionConfig(CriterionConfig):
    use_guided_attention_loss: bool = False
    guided_attention_loss_sigma: float = 0.4
    bce_pos_weight: float = 5.0


@register_config("ofasys.criterion", "ofa_tacotron2", Tacotron2CriterionConfig)
class Tacotron2Criterion(BaseCriterion):
    def __call__(self, model, params, sample, rng=None, train: bool = True):
        slots = sample["net_input"]["slots"]
        rngs = {"dropout": rng} if rng is not None else None
        ga_loss = None
        if self.cfg.use_guided_attention_loss:
            (mel_post, extra), mods = model.net.apply(
                {"params": params}, slots, deterministic=not train, rngs=rngs,
                mutable=["intermediates"],
            )
            ga_loss = self._guided_attention(mods["intermediates"], sample)
        else:
            mel_post, extra = model.apply(params, slots, deterministic=not train, rngs=rngs)
        target = sample["target"].astype(jnp.float32)              # (B, T, M)
        lengths = sample["target_lengths"]                          # (B,)
        B, T = target.shape[:2]
        mask = (jnp.arange(T)[None, :] < lengths[:, None])          # (B, T)
        fmask = mask[:, :, None]

        mel_before = extra["feature_before"]
        l1 = jnp.abs(mel_post - target) + jnp.abs(mel_before - target)
        mse = (mel_post - target) ** 2 + (mel_before - target) ** 2
        l1 = jnp.where(fmask, l1, 0.0).sum()
        mse = jnp.where(fmask, mse, 0.0).sum()

        # EOS supervision: 1 at the last valid frame, 0 elsewhere
        eos_logits = extra["eos_logits"]
        eos_target = (jnp.arange(T)[None, :] == (lengths[:, None] - 1)).astype(jnp.float32)
        bce = optax.sigmoid_binary_cross_entropy(eos_logits, eos_target)
        w = jnp.where(eos_target > 0, self.cfg.bce_pos_weight, 1.0)
        bce = jnp.where(mask, bce * w, 0.0).sum()

        ntokens = lengths.sum()
        denom = jnp.maximum(ntokens.astype(jnp.float32) * target.shape[-1], 1.0)
        loss = (l1 + mse) / denom * ntokens + bce / jnp.maximum(ntokens, 1)
        sample_size = ntokens.astype(jnp.float32)
        logging = {
            "loss": loss,
            "l1_loss": l1 / denom,
            "mse_loss": mse / denom,
            "eos_loss": bce / jnp.maximum(ntokens, 1),
            "ntokens": ntokens,
            "nsentences": B,
            "sample_size": sample_size,
        }
        if ga_loss is not None:
            loss = loss + ga_loss * ntokens.astype(jnp.float32)
            logging["guided_attention_loss"] = ga_loss
            logging["loss"] = loss
        return loss, sample_size, logging

    def _guided_attention(self, intermediates, sample) -> jax.Array:
        """Tachibana et al. guided attention: penalize decoder cross-attn
        mass off the (t/T, s/S) diagonal (reference tacotron2_loss.py:48).
        Averaged over all decoder cross-attention layers and heads."""
        sigma = self.cfg.guided_attention_loss_sigma
        lengths = sample["target_lengths"]

        # collect every cross-attention probability map the model sowed
        maps = []

        def walk(node, in_cross):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, in_cross or "encoder_attn" in str(k))
            elif isinstance(node, (tuple, list)):
                for v in node:
                    walk(v, in_cross)
            elif in_cross and hasattr(node, "ndim") and node.ndim == 4:
                maps.append(node)

        walk(intermediates, False)
        if not maps:
            return jnp.float32(0.0)

        total = jnp.float32(0.0)
        for attn in maps:                       # (B, H, Tq, Tk)
            B, H, Tq, Tk = attn.shape
            t = jnp.arange(Tq)[:, None] / jnp.maximum(lengths[:, None, None], 1)
            s = jnp.arange(Tk)[None, :] / Tk
            w = 1.0 - jnp.exp(-((s[None] - t) ** 2) / (2.0 * sigma * sigma))  # (B, Tq, Tk)
            tmask = (jnp.arange(Tq)[None, :] < lengths[:, None])[:, :, None]
            penalty = jnp.where(tmask, attn.mean(axis=1) * w, 0.0)
            denom = jnp.maximum(tmask.sum() * Tk, 1)
            total = total + penalty.sum() / denom.astype(jnp.float32)
        return total / len(maps)
