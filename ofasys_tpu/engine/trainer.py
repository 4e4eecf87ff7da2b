"""Trainer: multi-task fit loop (reference ofasys/engine/trainer.py:45-1698).

The reference's 1.4k-line stateful trainer collapses because the device math
is pure jitted functions:

  fit(model, tasks):
    build vocab -> initialize tasks (vocab grows) -> initialize model ->
    mesh + sharded per-task train steps -> update loop (round-robin over
    tasks, one optimizer step per update across all task batches) ->
    validate_and_save -> orbax checkpoint with full resume state.

Multi-task scheduling (cfg.optimization.multi_task_mode):
  'sum' (default, reference parity — ofasys/engine/trainer.py:766-880): per
  update, every task contributes one batch through its own jitted grad
  program; raw gradient sums are accumulated ON DEVICE (sharded like params,
  one fused add dispatch per task) and a single jitted optimizer step fires.
  'round_robin': one full optimizer step per task batch (k steps per update).
Each task's step/grad program is its own trace — different templates never
share one. Metrics are deferred: device scalars are queued and fetched only
at log/checkpoint boundaries so the dispatch queue is never host-blocked.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ofasys_tpu.configure import ConfigStore, TrainerConfig, to_dict
from ofasys_tpu.engine.optim import build_lr_schedule, build_optimizer
from ofasys_tpu.engine.train_step import TrainState, make_train_step, make_valid_step
from ofasys_tpu.logging.meters import AverageMeter, MetersDict, TimeMeter
from ofasys_tpu.logging.progress_bar import build_progress_bar
from ofasys_tpu.parallel import build_mesh, make_sharded_train_step, put_batch, shard_tree, tree_shardings
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.utils import checkpoint_utils

logger = logging.getLogger("ofasys_tpu.trainer")


class Trainer:
    def __init__(self, cfg: Optional[TrainerConfig] = None, **kwargs):
        self.cfg = cfg or TrainerConfig()
        if kwargs:
            self.cfg.update(**kwargs)
        self.meters = MetersDict()
        self.state: Optional[TrainState] = None
        self.mesh = None
        self._step_fns: Dict[str, Callable] = {}
        self._grad_fns: Dict[str, Callable] = {}
        self._apply_fn: Optional[Callable] = None
        self._acc_fn: Optional[Callable] = None
        self._fused_fn: Optional[Callable] = None
        self._valid_fns: Dict[str, Callable] = {}
        self._sum_mode = False
        self._pending: List[Any] = []  # deferred (task, device-metrics, ntokens)
        # multi-host data sharding (set by distributed_init / launch)
        self.dp_rank = 0
        self.dp_procs = 1
        # validate/early-stop state
        self._best_val: Optional[float] = None
        self._patience_left = self.cfg.checkpoint.patience

    # ------------------------------------------------------------- fitting
    def fit(self, model, tasks, max_update: Optional[int] = None):
        """The reference Trainer.fit contract (engine/trainer.py:71)."""
        start_update = self.setup(model, tasks, max_update)
        t_start = time.time()
        self.run_updates(start_update, self._total_updates)
        self._flush_metrics()
        if not self.cfg.checkpoint.no_save and not self.cfg.checkpoint.no_last_checkpoints:
            self.save_checkpoint("checkpoint_last", self._total_updates)
        checkpoint_utils.wait_for_async_saves()
        logger.info("fit done in %.1fs", time.time() - t_start)
        return self.state

    def setup(self, model, tasks, max_update: Optional[int] = None) -> int:
        """Stages 1-5 of fit: vocab, model init, mesh, restore, jitted steps.
        Returns the starting update (non-zero after a checkpoint restore).
        Split out so benchmarks can warm up compilation and then time
        run_updates() windows."""
        if not isinstance(tasks, (list, tuple)):
            tasks = [tasks]
        cfg = self.cfg
        total_updates = max_update or cfg.optimization.max_update or 1000
        self._total_updates = total_updates

        # 1) vocab + task initialization (text preprocessors grow the dict)
        global_dict = Dictionary()
        for task in tasks:
            task.initialize(global_dict)
        global_dict.pad_to_multiple_(128)  # MXU lane width

        # 2) model initialization with the union of required adaptors
        adaptors: List[str] = []
        for task in tasks:
            for a in task.required_adaptors():
                if a not in adaptors:
                    adaptors.append(a)
        # fp16/bf16 are reference-config compat flags: either forces the
        # bfloat16 compute policy (no fp16+loss-scaler path on TPU)
        use_bf16 = cfg.common.dtype == "bfloat16" or cfg.common.fp16 or cfg.common.bf16
        dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        # mesh first: pipeline parallelism needs it inside the model
        self.mesh = build_mesh(cfg.parallel)
        if cfg.parallel.pipeline > 1:
            model.cfg.pipeline_stages = cfg.parallel.pipeline
            model.cfg.scan_layers = True
        # activation checkpointing: trainer-level knob -> model remat mode
        # ('selective' = the dots policy: save matmul results, recompute
        # elementwise chains). Model-level cfg.remat, when set explicitly,
        # wins — it is the serialized source of truth for the checkpoint.
        if model.cfg.remat == "none" and cfg.parallel.remat != "none":
            model.cfg.remat = {"selective": "dots", "full": "full",
                               "dots": "dots"}[cfg.parallel.remat]
        model.initialize(global_dict, active_adaptors=tuple(adaptors), dtype=dtype,
                         mesh=self.mesh if (model.cfg.pipeline_stages > 1
                                           or getattr(model.cfg, 'sequence_parallel', False)) else None)

        # multi-host: adopt the jax process topology for data sharding
        # (reference distributed_init rank/world, distributed/utils.py:210)
        if self.dp_procs == 1 and jax.process_count() > 1:
            self.dp_rank = jax.process_index()
            self.dp_procs = jax.process_count()
        if self.dp_procs > 1:
            # rank-deterministic batch shapes: each host collates its own
            # data shard, so dynamic longest-in-batch padding would give the
            # hosts different compiled programs (collective mismatch); force
            # fixed-length padding in every preprocessor that supports it
            for task in tasks:
                for pre in task.general_preprocess.name2pre.values():
                    if hasattr(pre.cfg, "pad_to_fixed"):
                        pre.cfg.pad_to_fixed = True
            logger.info("multi-host: fixed-length batch padding enabled")

        # 3) optimizer (mesh built above, before model init)
        dp_size = self.mesh.shape["data"] * self.mesh.shape["fsdp"]
        for task in tasks:
            # batch_size is per host process (reference per-rank semantics);
            # the global batch is batch_size * process_count
            if (task.cfg.dataset.batch_size * self.dp_procs) % dp_size != 0:
                raise ValueError(
                    f"task {task.name!r}: global batch "
                    f"{task.cfg.dataset.batch_size * self.dp_procs} must be "
                    f"divisible by data*fsdp mesh size {dp_size}"
                )
        optimizer = build_optimizer(cfg.optimization, total_num_update=total_updates)
        lr_sched = build_lr_schedule(cfg.optimization, total_updates)

        # 4) init or restore params
        first_batch = {t.name: self._peek_batch(t) for t in tasks}
        # trace EVERY task's slot plan at init so all adaptor params exist
        params = model.init_params(
            jax.random.PRNGKey(cfg.common.seed),
            [first_batch[t.name]["net_input"]["slots"] for t in tasks],
        )
        state = TrainState.create(params, optimizer, ema=cfg.ema.store_ema)
        # ZeRO-1 (reference zero_sharding='os', optim/shard.py:50): shard
        # optimizer moments over the data axis even when params replicate
        # (fsdp==1). With fsdp>1 moments already shard like params (ZeRO-3
        # analogue), so the extra rule would be redundant.
        self._sharding_rules = None
        if cfg.parallel.zero1 and self.mesh.shape["fsdp"] == 1 \
                and self.mesh.shape["data"] > 1:
            from jax.sharding import PartitionSpec as P

            from ofasys_tpu.parallel.sharding import DEFAULT_RULES

            self._sharding_rules = (
                [(r"(^|/)opt_state(/|$)", P("data"))] + list(DEFAULT_RULES)
            )
            logger.info("zero1: optimizer state sharded over the data axis")
        state = shard_tree(state, self.mesh, rules=self._sharding_rules)
        self.state = state
        self.model = model
        self.tasks = tasks
        self.global_dict = global_dict
        self.optimizer = optimizer

        start_update = 0
        restored = self._maybe_restore()
        if restored is not None:
            start_update = restored
            if cfg.checkpoint.reset_lr_scheduler and start_update > 0:
                # scheduler restarts from zero while training resumes at the
                # restored update (reference reset_lr_scheduler semantics)
                base_sched, off = lr_sched, int(start_update)
                lr_sched = lambda s: base_sched(jnp.maximum(s - off, 0))
                logger.info("reset_lr_scheduler: schedule re-zeroed at update %d", off)

        # 5) per-task sharded step programs. Summed multi-task mode splits
        # each task's program into a grad half + a shared apply half.
        self._sum_mode = (
            cfg.optimization.multi_task_mode == "sum" and len(tasks) > 1
        )
        ema_decay = cfg.ema.ema_decay if cfg.ema.store_ema else 0.0
        if self._sum_mode:
            # ONE jitted program per update: all task grads + sum + step
            # fuse into a single dispatch (remote devices pay per-dispatch
            # latency; the split grad/acc/apply path costs ~2k dispatches)
            from ofasys_tpu.engine.train_step import make_multitask_train_step
            from ofasys_tpu.parallel import make_sharded_multitask_train_step

            update_freqs = {t.name: t.cfg.dataset.update_freq for t in tasks}
            fused = make_multitask_train_step(
                model, {t.name: t.criterion for t in tasks}, optimizer,
                update_freqs=update_freqs, ema_decay=ema_decay, lr_schedule=lr_sched,
                ema_start_update=cfg.ema.ema_start_update,
                ema_update_freq=cfg.ema.ema_update_freq,
            )
            self._fused_fn = make_sharded_multitask_train_step(
                fused, self.mesh, self.state,
                {t.name: batch_device_view(first_batch[t.name]) for t in tasks},
                update_freqs=update_freqs, rules=self._sharding_rules,
            )
        else:
            for task, batch in ((t, first_batch[t.name]) for t in tasks):
                step_fn = make_train_step(
                    model, task.criterion, optimizer,
                    update_freq=task.cfg.dataset.update_freq,
                    ema_decay=ema_decay,
                    lr_schedule=lr_sched,
                    ema_start_update=cfg.ema.ema_start_update,
                    ema_update_freq=cfg.ema.ema_update_freq,
                )
                self._step_fns[task.name] = make_sharded_train_step(
                    step_fn, self.mesh, self.state, batch_device_view(batch),
                    update_freq=task.cfg.dataset.update_freq,
                    rules=self._sharding_rules,
                )

        # 6) loop state
        self.progress = build_progress_bar(
            cfg.common.log_format, tensorboard_logdir=cfg.common.tensorboard_logdir,
            wandb_project=cfg.common.wandb_project,
            azureml_logging=cfg.common.azureml_logging,
        )
        self._rng = jax.random.PRNGKey(cfg.common.seed)
        self._iterators = {
            t.name: iter(self._task_batches(t, dp_rank=self.dp_rank, dp_size=self.dp_procs))
            for t in tasks
        }
        if "ups" not in self.meters:
            self.meters.add_meter("ups", TimeMeter(round=2))
            self.meters.add_meter("wps", TimeMeter(round=0))
        return start_update

    def run_updates(self, start_update: int, end_update: int):
        cfg = self.cfg
        ck = cfg.checkpoint
        if getattr(self, "_wall_start", None) is None:
            self._wall_start = time.time()
        if cfg.common.profile:
            jax.profiler.start_trace(cfg.common.profile_dir)
            logger.info("jax.profiler trace -> %s", cfg.common.profile_dir)
        last_epoch = self._cur_epoch()
        try:
            for update in range(start_update, end_update):
                self.train_one_update()
                self.meters["ups"].update(1)
                if cfg.common.log_interval and (update + 1) % cfg.common.log_interval == 0:
                    self._print_progress(update + 1, end_update)
                    lr_val = self.meters["lr"].avg if "lr" in self.meters else None
                    if (cfg.optimization.stop_min_lr > 0 and lr_val is not None
                            and lr_val < cfg.optimization.stop_min_lr):
                        logger.info("stop: lr %.3g below stop_min_lr %.3g",
                                    lr_val, cfg.optimization.stop_min_lr)
                        break
                if ck.save_interval_updates and \
                        (update + 1) % ck.save_interval_updates == 0:
                    self.save_checkpoint(f"checkpoint_1_{update + 1}", update + 1)
                vi = cfg.dataset.validate_interval_updates
                if vi and (update + 1) % vi == 0:
                    if self.validate_and_save(update + 1):
                        logger.info(
                            "early stop at update %d: %s did not improve for %d "
                            "validations (patience)", update + 1,
                            ck.best_checkpoint_metric, ck.patience,
                        )
                        break
                # ---- epoch boundary (epoch = first task's iterator rollover)
                ep = self._cur_epoch()
                if ep != last_epoch:
                    done_ep, last_epoch = last_epoch, ep
                    if (not ck.no_save and not ck.no_epoch_checkpoints
                            and ck.save_interval > 0
                            and done_ep % ck.save_interval == 0):
                        self.save_checkpoint(
                            f"checkpoint_e{done_ep}", update + 1,
                            keep_epochs=ck.keep_last_epochs,
                        )
                    if (cfg.dataset.validate_interval > 0 and not vi
                            and done_ep % cfg.dataset.validate_interval == 0):
                        if self.validate_and_save(update + 1):
                            logger.info("early stop after epoch %d (patience)", done_ep)
                            break
                    if cfg.optimization.max_epoch and done_ep >= cfg.optimization.max_epoch:
                        logger.info("stop: reached max_epoch %d", done_ep)
                        break
        finally:
            if cfg.common.profile:
                jax.profiler.stop_trace()

    def _cur_epoch(self) -> int:
        it = self.tasks[0].iterators.get("train") if getattr(self, "tasks", None) else None
        return int(getattr(it, "epoch", 1)) if it is not None else 1

    def validate_and_save(self, num_updates: int) -> bool:
        """Validate every task that has a valid split, track the mean
        best-checkpoint metric, keep checkpoint_best, and signal patience-
        based early stop (reference engine/trainer.py:1535-1698 +
        should_stop_early:1381). Returns True when training should stop."""
        cfg = self.cfg
        vals = []
        for task in self.tasks:
            if task.cfg.dataset.disable_validation or "valid" not in task.datasets:
                continue
            metrics = self.validate(task, max_batches=cfg.dataset.max_valid_batches)
            for k, v in metrics.items():
                key = f"valid:{task.name}:{k}"
                if key not in self.meters:
                    self.meters.add_meter(key, AverageMeter(round=4))
                self.meters[key].update(float(v))
            # a task may name its own selection metric (evaluation.best_metric);
            # the global checkpoint.best_checkpoint_metric is the fallback
            key = task.cfg.evaluation.best_metric or cfg.checkpoint.best_checkpoint_metric
            if key in metrics:
                vals.append(float(metrics[key]))
        if not vals:
            return False
        score = float(np.mean(vals))
        maximize = cfg.checkpoint.maximize_best_checkpoint_metric
        better = (
            self._best_val is None
            or (score > self._best_val if maximize else score < self._best_val)
        )
        if better:
            self._best_val = score
            self._patience_left = cfg.checkpoint.patience
            if not cfg.checkpoint.no_save:
                self.save_checkpoint(f"checkpoint_1_{num_updates}", num_updates, is_best=True)
        elif cfg.checkpoint.patience > 0:
            self._patience_left -= 1
            if self._patience_left <= 0:
                return True
        return False

    def train_one_update(self):
        """One update: every task contributes one batch. No host sync —
        metrics stay on device until a log/ckpt boundary."""
        if self._sum_mode:
            batches = {}
            ntokens = {}
            nsent = {}
            for task in self.tasks:
                b = next(self._iterators[task.name])
                ntokens[task.name] = int(b.get("ntokens", 0))
                nsent[task.name] = int(b.get("nsentences", 0))
                batches[task.name] = put_batch(
                    batch_device_view(b), self.mesh,
                    update_freq=task.cfg.dataset.update_freq,
                )
            self.state, metrics = self._fused_fn(self.state, batches, self._rng)
            for task in self.tasks:
                self._log_metrics(task.name, metrics["tasks"][task.name],
                                  ntokens[task.name], nsent[task.name])
            self._log_metrics(None, {k: v for k, v in metrics.items() if k != "tasks"}, 0)
        else:
            for task in self.tasks:
                batch = next(self._iterators[task.name])
                ntokens = int(batch.get("ntokens", 0))
                nsent = int(batch.get("nsentences", 0))
                db = put_batch(batch_device_view(batch), self.mesh,
                               update_freq=task.cfg.dataset.update_freq)
                self.state, metrics = self._step_fns[task.name](self.state, db, self._rng)
                self._log_metrics(task.name, metrics, ntokens, nsent)

    # -------------------------------------------------------------- pieces
    def _peek_batch(self, task):
        it = task.get_batch_iterator("train", seed=self.cfg.common.seed)
        batch = next(it.next_epoch_itr())
        # reset iterator state so training starts from batch 0
        it.iterations_in_epoch = 0
        it.epoch = max(it.epoch - 1, 1)
        task.iterators.pop("train", None)
        return batch

    def _task_batches(self, task, dp_rank: int, dp_size: int):
        """Endless stream of batches, rolling over epochs."""
        it = task.get_batch_iterator(
            "train", rank=dp_rank, world_size=dp_size,
            seed=self.cfg.common.seed,
            drop_last=self.cfg.optimization.skip_remainder_batch,
        )
        while True:
            for batch in it.next_epoch_itr():
                yield batch

    def _log_metrics(self, task_name: Optional[str], metrics: Dict[str, Any], ntokens: int,
                     nsentences: int = 0):
        """Queue device metric scalars; fetching happens at log boundaries so
        the step dispatch queue is never blocked on a host transfer (the
        reference's float() per step is a GPU-ism; on TPU it stalls pipelining)."""
        self._pending.append((task_name, metrics, ntokens, nsentences))
        if len(self._pending) >= 512:
            self._flush_metrics()

    def _flush_metrics(self):
        if not self._pending:
            return
        pending, self._pending = self._pending, []
        fetched = jax.device_get([m for _, m, _, _ in pending])
        for (task_name, _, ntokens, nsentences), metrics in zip(pending, fetched):
            ss = float(metrics.get("sample_size", 1.0)) or 1.0
            nt = float(metrics.get("ntokens", 0.0)) or 1.0
            if task_name is not None:
                # thread every *loss logging output into a per-task meter
                # (criteria may log components like ce_loss/ctc_loss/mam_loss
                # beyond the standard pair); nll_loss is per-token, the rest
                # per-sample — matching the reference's reduce_metrics
                for key in metrics:
                    if not key.endswith("loss"):
                        continue
                    meter_key = f"{task_name}:{key}"
                    denom = nt if key == "nll_loss" else ss
                    if meter_key not in self.meters:
                        self.meters.add_meter(meter_key, AverageMeter(round=3))
                    self.meters[meter_key].update(float(metrics[key]) / denom)
            if "gnorm" in metrics:
                if "gnorm" not in self.meters:
                    self.meters.add_meter("gnorm", AverageMeter(round=3))
                self.meters["gnorm"].update(float(metrics["gnorm"]))
            if "lr" in metrics:
                if "lr" not in self.meters:
                    self.meters.add_meter("lr", AverageMeter(round=6))
                self.meters["lr"].update(float(metrics["lr"]))
            self.meters["wps"].update(ntokens)
            if task_name is not None:
                # reference runtime counters (task/base.py:708-721): words
                # and sentences per per-task batch
                if "wpb" not in self.meters:
                    self.meters.add_meter("wpb", AverageMeter(round=1))
                    self.meters.add_meter("bsz", AverageMeter(round=1))
                if ntokens:
                    self.meters["wpb"].update(ntokens)
                if nsentences:
                    self.meters["bsz"].update(nsentences)

    def _print_progress(self, update: int, total: int):
        self._flush_metrics()
        if getattr(self, "_wall_start", None) is not None:
            # reference 'train_wall' counter: seconds of training so far
            if "train_wall" not in self.meters:
                self.meters.add_meter("train_wall", AverageMeter(round=0))
            self.meters["train_wall"].reset()
            self.meters["train_wall"].update(time.time() - self._wall_start)
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit, used = stats.get("bytes_limit"), stats.get("bytes_in_use")
            if limit is not None and used is not None:
                if "gb_free" not in self.meters:
                    self.meters.add_meter("gb_free", AverageMeter(round=1))
                self.meters["gb_free"].reset()
                self.meters["gb_free"].update((limit - used) / 2**30)
        except Exception:
            pass  # platform without memory_stats (CPU mesh)
        vals = self.meters.get_smoothed_values()
        if getattr(self, "progress", None) is not None:
            self.progress.log(vals, tag="train", step=update)
        else:
            msg = " | ".join(f"{k} {v}" for k, v in vals.items())
            logger.info("update %d/%d | %s", update, total, msg)

    # ----------------------------------------------------------- validate
    def validate(self, task, max_batches: Optional[int] = None) -> Dict[str, float]:
        if task.name not in self._valid_fns:
            self._valid_fns[task.name] = jax.jit(make_valid_step(self.model, task.criterion))
        fn = self._valid_fns[task.name]
        logs = []
        # fresh iterator: every validation pass scores the SAME fixed subset
        # (reference fixed_validation_seed semantics) — a shared stateful
        # iterator would rotate batches between passes and make the patience
        # metric non-comparable
        it = task.get_batch_iterator(
            "valid", fresh=True, seed=self.cfg.dataset.fixed_validation_seed or 1
        )
        for i, batch in enumerate(it.next_epoch_itr(shuffle=False)):
            if max_batches is not None and i >= max_batches:
                break
            db = put_batch(batch_device_view(batch), self.mesh)
            logs.append(jax.device_get(fn(self.state.params, db)))
        return task.criterion.reduce_metrics(logs, task_name=task.name)

    # --------------------------------------------------------- checkpoints
    def save_checkpoint(self, name: str, num_updates: int, is_best: bool = False,
                        keep_epochs: int = -1):
        cfg = self.cfg
        meta = {
            "num_updates": num_updates,
            "cfg": to_dict(cfg),
            "configstore": ConfigStore().state_dict(groups=["ofasys.task", "ofasys.model"]),
            "global_dict": self.global_dict.state_dict(),
            "iterator_states": {t.name: t.iterators["train"].state_dict()
                                for t in self.tasks if "train" in t.iterators},
            "model_cfg": to_dict(self.model.cfg),
            "active_adaptors": list(self.model.net.active_adaptors),
            "meters": self.meters.state_dict(),
        }
        state = self.state
        if cfg.checkpoint.no_save_optimizer_state:
            # params-only checkpoint (serving/export; resume treats it like
            # finetune_from_model — weights restore, optimizer starts fresh)
            state = {"params": self.state.params, "step": self.state.step}
            if self.state.ema_params is not None:
                state["ema_params"] = self.state.ema_params
            meta["no_optimizer_state"] = True
        checkpoint_utils.save_checkpoint(
            cfg.checkpoint.save_dir, name, state, meta,
            keep_last=cfg.checkpoint.keep_interval_updates, is_best=is_best,
            async_save=cfg.checkpoint.async_save,
            keep_pattern=cfg.checkpoint.keep_interval_updates_pattern,
            keep_best=cfg.checkpoint.keep_best_checkpoints, best_tag=num_updates,
            keep_epochs=keep_epochs,
            mirror_last=not cfg.checkpoint.no_last_checkpoints,
        )

    def _maybe_restore(self) -> Optional[int]:
        checkpoint_utils.wait_for_async_saves()  # in-process save-then-resume
        ck = self.cfg.checkpoint
        path = os.path.join(ck.save_dir, ck.restore_file or "checkpoint_last")
        if not os.path.exists(path):
            path = None
        if path is None and ck.finetune_from_model:
            # first launch: warm-start weights from another run; everything
            # else fresh (reference finetune_from_model,
            # checkpoint_utils.py:197-230 — once a checkpoint_last exists the
            # usual resume logic takes over and the flag is ignored)
            self._load_params_only(ck.finetune_from_model)
            return None
        if path is None:
            return None
        if ck.reset_optimizer:
            # model weights always restore; only the optimizer (and step
            # count) start fresh (reference trainer.py:642 skips the optim
            # state, load_checkpoint still calls load_model_state). The
            # dataloader still resumes unless reset_dataloader is also set.
            self._load_params_only(path)
            if not ck.reset_dataloader:
                meta = checkpoint_utils.upgrade_state_meta(
                    checkpoint_utils.read_meta(path)
                ) or {}
                for t in self.tasks:
                    st = meta.get("iterator_states", {}).get(t.name)
                    if st and "train" in t.iterators:
                        t.iterators["train"].load_state_dict(st)
            return None
        pre_meta = checkpoint_utils.upgrade_state_meta(checkpoint_utils.read_meta(path))
        if (pre_meta or {}).get("no_optimizer_state"):
            # params-only checkpoint: weights restore, optimizer starts fresh
            self._load_params_only(path, pre_meta)
            return int(pre_meta.get("num_updates", 0))
        saved_syms = (pre_meta or {}).get("global_dict", {}).get("symbols")
        cur_syms = self.global_dict.state_dict()["symbols"]
        if saved_syms is not None and saved_syms != cur_syms:
            # vocab changed between save and resume (a new task grew the
            # dict): restore against the SAVED shapes, then remap embedding
            # rows token-by-token (reference update_embedding,
            # model/ofa.py:495-511). Old tokens stay bit-identical.
            logger.info(
                "vocab changed since checkpoint (%d -> %d tokens); remapping "
                "embedding rows", len(saved_syms), len(cur_syms),
            )
            target_old = checkpoint_utils.resize_vocab_rows(
                jax.device_get(self.state), len(saved_syms)
            )
            state, meta = checkpoint_utils.load_checkpoint(path, target=target_old)
            state = checkpoint_utils.remap_vocab_rows(state, saved_syms, self.global_dict)
        else:
            state, meta = checkpoint_utils.load_checkpoint(path, target=self.state)
        meta = checkpoint_utils.upgrade_state_meta(meta)
        self.state = jax.tree.map(
            lambda x, s: jax.device_put(x, s.sharding) if hasattr(s, "sharding") else x,
            state, self.state,
        )
        if meta:
            if not ck.reset_dataloader:
                for t in self.tasks:
                    st = meta.get("iterator_states", {}).get(t.name)
                    if st and "train" in t.iterators:
                        t.iterators["train"].load_state_dict(st)
            if not ck.reset_meters and meta.get("meters"):
                try:
                    self.meters.load_state_dict(meta["meters"])
                except Exception:
                    logger.warning("could not restore meters state; continuing fresh")
            return int(meta.get("num_updates", 0))
        return None

    def _load_params_only(self, path: str, pre_meta: Optional[Dict[str, Any]] = None):
        """Restore model weights (and EMA if present) from ``path``; the
        optimizer, meters, and iterators keep their fresh state."""
        if pre_meta is None:
            pre_meta = checkpoint_utils.upgrade_state_meta(checkpoint_utils.read_meta(path)) or {}
        host = jax.device_get(self.state)
        if pre_meta.get("no_optimizer_state"):
            target = {"params": host.params, "step": host.step}
            if host.ema_params is not None:
                target["ema_params"] = host.ema_params
            state, _ = checkpoint_utils.load_checkpoint(path, target=target)
            params = state["params"]
            ema = state.get("ema_params", host.ema_params)
        else:
            state, _ = checkpoint_utils.load_checkpoint(path, target=host)
            params = state.params
            ema = state.ema_params if host.ema_params is not None else None
        self.state = self.state.replace(
            params=jax.tree.map(
                lambda x, s: jax.device_put(x, s.sharding) if hasattr(s, "sharding") else x,
                params, self.state.params,
            ),
            ema_params=(
                jax.tree.map(
                    lambda x, s: jax.device_put(x, s.sharding) if hasattr(s, "sharding") else x,
                    ema, self.state.ema_params,
                ) if ema is not None and self.state.ema_params is not None else self.state.ema_params
            ),
        )
        logger.info("loaded model weights (params-only) from %s", path)


def batch_device_view(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Strip host-only keys so the device batch has a stable pytree
    (template strings, python ints...)."""
    out = {}
    for k, v in batch.items():
        if k in ("template", "nsentences", "ntokens", "n_valid", "prefix_tokens",
                 "dict_start", "dict_end"):
            continue
        out[k] = v
    return out
