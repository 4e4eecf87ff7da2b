"""Self-critical sequence training (reference
ofasys/engine/criterion/scst_loss.py:60-177): sample hypotheses, score them
with CIDEr-D against references, subtract the per-sample mean reward as
baseline, and scale sequence log-probs by the advantage.

Split across the host/device boundary the TPU way: sampling + CIDEr run on
host (generator + metric), the policy-gradient step is one jitted
teacher-forced scoring pass over the sampled sequences.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.configure import register_config
from ofasys_tpu.engine.criterion.base import BaseCriterion, CriterionConfig
from ofasys_tpu.metric.metrics import CiderMetric
from ofasys_tpu.preprocessor.utils import collate_tokens
from ofasys_tpu.utils.pytree import SlotBatch


@dataclass
class ScstRewardCriterionConfig(CriterionConfig):
    scst_n_samples: int = 5
    sampling_topk: int = 50
    ignore_prefix_size: int = 0


@register_config("ofasys.criterion", "scst_reward_criterion", ScstRewardCriterionConfig)
class ScstRewardCriterion(BaseCriterion):
    """Needs a generator + text preprocessor: configure via
    ``setup(generator, text_preprocess)`` before training (the reference
    builds these lazily from the task, task/base.py:249)."""

    def __init__(self, cfg: ScstRewardCriterionConfig, pad_id: int = 1):
        super().__init__(cfg, pad_id)
        self.generator = None
        self.text_pre = None
        self.cider = CiderMetric()

    def setup(self, generator, text_preprocess):
        self.generator = generator
        self.text_pre = text_preprocess
        return self

    # ---- host side: sample + reward --------------------------------------
    def sample_and_reward(self, params, sample: Dict[str, Any], refs: List[List[str]],
                          seed: int = 0):
        n = self.cfg.scst_n_samples
        gen = self.generator
        all_tokens: List[np.ndarray] = []
        rewards: List[float] = []
        B = len(refs)
        for s in range(n):
            outs = gen.generate(params, sample, seed=seed * 1000 + s)
            for b, hyps in enumerate(outs):
                toks = hyps[0].tokens
                all_tokens.append(np.asarray(toks, np.int32))
                text = self.text_pre.decode(toks)
                rewards.append(self.cider.compute([text], [refs[b]])["cider"])
        # (n, B) rewards; baseline = mean over samples per batch row
        R = np.asarray(rewards, np.float32).reshape(n, B)
        advantage = R - R.mean(axis=0, keepdims=True)
        return all_tokens, R, advantage

    # ---- device side: policy gradient ------------------------------------
    def policy_gradient_loss(self, model, params, sample, sampled_tokens: List[np.ndarray],
                             advantage: np.ndarray):
        """One jitted scoring forward over all sampled sequences."""
        n, B = advantage.shape
        d_pad = self.pad_id
        prev = collate_tokens([np.concatenate([[0], t[:-1]]) for t in sampled_tokens],
                              pad_idx=d_pad, pad_to_multiple=8)
        target = collate_tokens(list(sampled_tokens), pad_idx=d_pad, pad_to_multiple=8)
        slots = sample["net_input"]["slots"]
        src_slots = [s for s in slots if s.is_src]
        tgt_slot = SlotBatch.target_slot(slots)

        def rep(x):
            return jnp.repeat(x, n, axis=0) if hasattr(x, "ndim") and x.ndim > 0 else x

        src_rep = jax.tree.map(rep, src_slots)
        # sampled layout is (n, B) flattened sample-major; reorder to B-major
        order = np.arange(n * B).reshape(n, B).T.reshape(-1)
        prev, target = prev[order], target[order]
        adv = jnp.asarray(advantage.T.reshape(-1), jnp.float32)

        tgt = dataclasses.replace(tgt_slot, value={"inputs": jnp.asarray(prev)})
        net = model.net

        def loss_fn(params):
            from ofasys_tpu.ops.losses import token_log_probs

            enc = net.apply({"params": params}, src_rep, method=net.encode)
            out, _ = net.apply({"params": params}, [tgt], enc, method=net.decode_full)
            tok_lp = token_log_probs(out, jnp.asarray(target))
            valid = jnp.asarray(target) != d_pad
            if self.cfg.ignore_prefix_size > 0:
                # exclude the first N target positions from the policy score
                # (reference label_smoothed_cross_entropy.py:165-167 slices
                # the prefix off the loss; same semantics for the PG score)
                pos = jnp.arange(valid.shape[1])[None, :]
                valid = valid & (pos >= self.cfg.ignore_prefix_size)
            seq_lp = jnp.where(valid, tok_lp, 0.0).sum(-1)
            loss = -(adv * seq_lp).sum()
            return loss, valid.sum()

        return loss_fn

    def __call__(self, model, params, sample, rng=None, train: bool = True):
        raise NotImplementedError(
            "SCST is driven by scst_train_step (sampling happens on host); "
            "see engine/criterion/scst_loss.py:scst_train_step"
        )


def scst_train_step(criterion: ScstRewardCriterion, model, state, optimizer, sample,
                    refs: List[List[str]], seed: int = 0):
    """One SCST update: host sampling + reward, jitted policy gradient."""
    tokens, rewards, advantage = criterion.sample_and_reward(state.params, sample, refs, seed)
    loss_fn = criterion.policy_gradient_loss(model, state.params, sample, tokens, advantage)
    (loss, ntokens), grads = jax.value_and_grad(lambda p: loss_fn(p), has_aux=True)(state.params)
    import optax

    scale = 1.0 / max(float(ntokens), 1.0)
    grads = jax.tree.map(lambda g: g * scale, grads)
    updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params, opt_state=opt_state)
    return new_state, {"loss": float(loss) * scale, "reward": float(rewards.mean())}
