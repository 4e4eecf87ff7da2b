"""Label-smoothed cross entropy (reference
ofasys/engine/criterion/label_smoothed_cross_entropy.py:95).

Constraint-mask-aware smoothing: when a position carries a closed-set
constraint mask, smoothing mass is spread only over the allowed tokens
(reference :40-57). The loss is computed in the logsumexp form with fp32
accumulation over the bf16 logits (see compute_loss) — numerically the
fp32-log_softmax values, without the fp32 (N, V) HBM round-trips.
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
    # default False matches the reference (label_smoothed_cross_entropy.py:23
    # "Default: false") and keeps the per-step argmax over (B*T, V) logits —
    # ~0.7% of update device time at GPT2-scale vocab — out of the hot loop
    report_accuracy: bool = False
    ignore_eos: bool = False
    drop_worst_ratio: float = 0.0
    drop_worst_after: int = 0
    # fuse the tied-embedding logits projection INTO the loss: the (N, V)
    # logits/dlogits tensors never round-trip HBM (see ops/fused_ce.py).
    # Applies only when the target is a plain tied-text projection with no
    # constraint masks / accuracy reporting; other cases silently use the
    # standard path.
    chunked_vocab: bool = False


@register_config("ofasys.criterion", "label_smoothed_cross_entropy", LabelSmoothedCrossEntropyCriterionConfig)
class LabelSmoothedCrossEntropyCriterion(BaseCriterion):
    def __call__(self, model, params, sample, rng=None, train: bool = True):
        slots = sample["net_input"]["slots"]
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train and getattr(model.cfg, "moe_experts", 0) > 0:
            # MoE load-balance aux (transformer.py MoEFeedForward sows into
            # the 'losses' collection); weighted per token so the gradient
            # scale survives the later 1/sample_size normalization
            logits, extra, aux = model.apply(
                params, slots, deterministic=False, rngs=rngs, with_aux_losses=True
            )
            fused = self._fused_plan(params, extra, sample, logits)
            if fused is not None:
                loss, sample_size, logging = self.compute_loss_fused(
                    *fused, sample, train=train
                )
            else:
                loss, sample_size, logging = self.compute_loss(logits, sample, train=train)
            w = float(getattr(model.cfg, "moe_aux_weight", 0.01))
            loss = loss + w * aux * sample_size
            logging = dict(logging)
            logging["moe_aux"] = aux * sample_size
            return loss, sample_size, logging
        logits, extra = model.apply(params, slots, deterministic=not train, rngs=rngs)
        fused = self._fused_plan(params, extra, sample, logits)
        if fused is not None:
            # logits is now dead: XLA dead-code-eliminates the unfused
            # projection GEMM from the traced graph
            return self.compute_loss_fused(*fused, sample, train=train)
        return self.compute_loss(logits, sample, train=train)

    # ------------------------------------------- chunked-vocab fused path
    def _fused_plan(self, variables, extra, sample, logits):
        """(hidden (N,E), emb (V,E), n_chunks) when the chunked-vocab fused
        CE applies, else None. Static gate, evaluated once per trace."""
        cfg = self.cfg
        if not getattr(cfg, "chunked_vocab", False) or cfg.report_accuracy:
            return None
        if sample.get("constraint_masks") is not None:
            return None
        # only the TEXT adaptor's tied projection has fused-path numerics
        # parity (image-code/VQGAN targets attend at fp32 — recomputing
        # them at bf16 would silently change the loss)
        try:
            tgt_slots = [s for s in sample["net_input"]["slots"] if not s.is_src]
        except (KeyError, TypeError):
            return None
        if len(tgt_slots) != 1 or getattr(tgt_slots[0].modality, "name", "") != "TEXT":
            return None
        x = (extra or {}).get("decoder_hidden")
        if x is None or x.ndim != 3:
            return None
        target = sample["target"]
        if target.ndim != 2 or not jnp.issubdtype(target.dtype, jnp.integer):
            return None
        if x.shape[:2] != target.shape:
            return None
        try:
            p = variables["params"] if "params" in variables else variables
            emb = p["embed_tokens"]["embedding"]
        except (KeyError, TypeError):
            return None
        if getattr(emb, "ndim", 0) != 2 or logits.shape[-1] != emb.shape[0]:
            return None
        # untied projection / output bias: the virtual logits would not be
        # x @ emb^T — bail to the standard path (flax param names from
        # adaptor/text.py:39-48)
        from jax.tree_util import tree_flatten_with_path

        for path, _ in tree_flatten_with_path(p)[0]:
            names = {str(getattr(k, "key", "")) for k in path}
            if "output_projection" in names or "output_projection_bias" in names:
                return None
        from ofasys_tpu.ops.fused_ce import pick_chunks

        n_chunks = pick_chunks(emb.shape[0])
        if n_chunks is None:
            return None
        B, T, E = x.shape
        return x.reshape(B * T, E), emb, n_chunks

    def compute_loss_fused(self, x2, emb, n_chunks, sample, train: bool = True):
        """Identical loss to compute_loss, with (lse, z_t, rowsum) computed
        chunk-by-chunk over the vocab so the (N, V) logits/dlogits never
        materialize (ops/fused_ce.py)."""
        from ofasys_tpu.ops.fused_ce import chunked_ce_stats

        cfg = self.cfg
        target = sample["target"]
        B, T = target.shape
        V = emb.shape[0]
        tgt = target.reshape(B * T)
        lse, z_t, zsum = chunked_ce_stats(x2, emb, tgt, n_chunks, x2.dtype)
        nll_pos = lse - z_t
        smooth = -(zsum - V * lse)
        n_allowed = jnp.float32(V - 1)
        valid = tgt != self.pad_id
        if cfg.ignore_eos:
            valid = valid & (tgt != getattr(self, "eos_id", 2))
        return self._reduce(nll_pos, smooth, n_allowed, valid, tgt, sample,
                            B, train)

    def compute_loss(self, logits: jax.Array, sample, train: bool = True):
        cfg = self.cfg
        target = sample["target"]                      # (B, T) int32, pad = ignored
        pad_id = self.pad_id
        B, T = target.shape
        V = logits.shape[-1]

        # logsumexp form of label-smoothed CE — algebraically identical to
        # the log_softmax formulation (nll = lse - z_t; sum of log-probs =
        # sum(z) - V*lse) but every (N, V) consumer is a streaming f32
        # reduction over the bf16 logits, so no fp32 (N, V) tensor is ever
        # materialized in HBM. Profiled on the mixed multi-task step: the
        # log_softmax version spent ~13% of device time in converts and
        # ~9% in layout copies, dominated by fp32 [B,T,50k] round-trips.
        z = logits.reshape(B * T, V)
        zf = z.astype(jnp.float32)                     # fuses into each reduce
        tgt = target.reshape(B * T)
        valid = tgt != pad_id
        if cfg.ignore_eos:
            # exclude EOS positions from the loss. NOT a reference-parity
            # surface: the OFASys criterion has no ignore_eos flag (only
            # ignore_prefix_size) — this is a local opt-in extra, default
            # False, with OFA-style semantics; eos_id set at build time
            valid = valid & (tgt != getattr(self, "eos_id", 2))
        zmax = jax.lax.stop_gradient(jnp.max(zf, axis=-1, keepdims=True))
        lse = zmax[:, 0] + jnp.log(jnp.sum(jnp.exp(zf - zmax), axis=-1))
        # gather from the bf16 logits and convert the (N,) result — gathering
        # from zf would force XLA to materialize the full (N, V) f32 convert
        # (profiled at ~4ms/step on the 50k-vocab infilling batch)
        z_t = jnp.take_along_axis(z, tgt[:, None], axis=-1)[:, 0].astype(jnp.float32)
        nll_pos = lse - z_t

        # constraint masks (closed-set subvocab): smoothing mass spreads
        # only over the allowed tokens (reference :40-57)
        cmask = sample.get("constraint_masks")
        if cmask is not None:
            cm = cmask.reshape(B * T, V)
            n_total = cm.sum(-1).astype(jnp.float32)
            smooth = -(jnp.sum(jnp.where(cm, zf, 0.0), axis=-1) - n_total * lse)
            n_allowed = jnp.maximum(n_total - 1.0, 1.0)
        else:
            smooth = -(jnp.sum(zf, axis=-1) - V * lse)
            n_allowed = jnp.float32(V - 1)
        return self._reduce(nll_pos, smooth, n_allowed, valid, tgt, sample,
                            B, train, z=z)

    def _reduce(self, nll_pos, smooth, n_allowed, valid, tgt, sample, B,
                train, z=None):
        cfg = self.cfg
        eps_i = cfg.label_smoothing / n_allowed
        loss_pos = (1.0 - cfg.label_smoothing - eps_i) * nll_pos + eps_i * smooth
        loss_pos = jnp.where(valid, loss_pos, 0.0)
        nll_pos = jnp.where(valid, nll_pos, 0.0)

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
        if cfg.report_accuracy and z is not None:
            pred = jnp.argmax(z, axis=-1)              # monotone under the f32 cast
            logging_out["n_correct"] = jnp.where(valid, pred == tgt, False).sum()
            logging_out["total"] = ntokens
        # raw summed loss: the train step divides the *accumulated* gradient
        # by the total sample_size (reference multiply_grads semantics,
        # engine/trainer.py:848-868), which keeps grad accumulation and
        # data-parallel psum exactly equivalent to one big batch.
        return loss, sample_size, logging_out
