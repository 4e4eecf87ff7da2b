"""TraverseTask: closed-set scoring base (reference ofasys/task/traverse_task.py:15).

Instead of free generation, score EVERY candidate answer with the model and
pick the argmax — the evaluation mode behind classification/VQA tasks. The
scoring pass is one jitted batched forward per candidate chunk: candidates
are teacher-forced and their label-smoothed log-probs summed.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ofasys_tpu.configure import register_config
from ofasys_tpu.preprocessor.utils import collate_tokens
from ofasys_tpu.task.base import Task, TaskConfig
from ofasys_tpu.utils.pytree import SlotBatch
from ofasys_tpu.ops.quant import as_variables as _vars


@dataclasses.dataclass
class TraverseTaskConfig(TaskConfig):
    pass


@register_config("ofasys.task", "traverse", TraverseTaskConfig)
class TraverseTask(Task):
    """Subclasses set candidate answers via the text preprocessor's
    ans2label/constraint machinery; rank_answers scores them all."""

    def candidate_answers(self) -> List[str]:
        pre = self.general_preprocess.name2pre["text"]
        if pre.ans2label:
            return list(pre.ans2label.keys())
        raise ValueError(f"task {self.name}: no candidate answer set configured")

    def rank_answers(self, model, params, sample: Dict[str, Any],
                     answers: Optional[List[str]] = None) -> List[str]:
        """For each sample pick argmax_a sum log p(a | input)."""
        answers = answers or self.candidate_answers()
        pre = self.general_preprocess.name2pre["text"]
        d = self.global_dict
        slots = sample["net_input"]["slots"]
        src_slots = [s for s in slots if s.is_src]
        tgt_slot = SlotBatch.target_slot(slots)
        B = next(iter(src_slots[0].value.values())).shape[0]

        cand_tokens = [np.concatenate([[d.bos()], pre.encode(a), [d.eos()]]).astype(np.int32)
                       for a in answers]
        scores = np.zeros((B, len(answers)), np.float64)

        if not hasattr(self, "_score_fn"):
            net = model.net

            def score(params, src_slots, tgt, target, pad_id):
                from ofasys_tpu.ops.losses import token_log_probs

                enc = net.apply(_vars(params), src_slots, method=net.encode)
                out, _ = net.apply(_vars(params), [tgt], enc, method=net.decode_full)
                tok_lp = token_log_probs(out, target)
                valid = target != pad_id
                return jnp.where(valid, tok_lp, 0.0).sum(-1)

            self._score_fn = jax.jit(score, static_argnums=(4,))

        for ai, toks in enumerate(cand_tokens):
            prev = np.tile(toks[:-1][None, :], (B, 1))
            target = np.tile(toks[1:][None, :], (B, 1))
            tgt = dataclasses.replace(tgt_slot, value={"inputs": jnp.asarray(prev)})
            s = self._score_fn(params, src_slots, tgt, jnp.asarray(target), d.pad())
            scores[:, ai] = np.asarray(s)
        best = scores.argmax(axis=1)
        return [answers[i] for i in best]

    def evaluate(self, model, params, split: str = "valid",
                 max_batches: Optional[int] = None,
                 rank: int = 0, world_size: int = 1) -> Dict[str, float]:
        """Closed-set evaluation: instead of free generation, every candidate
        answer is scored and the argmax compared to the reference (the
        reference's valid_step for classification tasks,
        ofasys/task/traverse_task.py:15)."""
        it = self.get_batch_iterator(split, rank=rank, world_size=world_size)
        answers = self.candidate_answers()
        text_pre = self.general_preprocess.name2pre["text"]
        hyps: List[str] = []
        refs: List[str] = []
        for i, batch in enumerate(it.next_epoch_itr(shuffle=False)):
            if max_batches is not None and i >= max_batches:
                break
            picks = self.rank_answers(model, params, batch, answers)
            n_valid = batch.get("n_valid", len(picks))
            hyps.extend(picks[:n_valid])
            for b in range(n_valid):
                refs.append(text_pre.decode(np.asarray(batch["target"])[b]))
        results: Dict[str, float] = {}
        for metric in self.metrics:
            results.update(metric.compute(hyps, refs))
        return results
