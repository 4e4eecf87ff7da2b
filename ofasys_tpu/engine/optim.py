"""Optimizers + LR schedules (optax).

Replaces the reference's optimizer zoo (ofasys/engine/optim/, 2.5k LoC:
FairseqOptimizer, FP16Optimizer, DynamicLossScaler, fused/cpu adam, OSS
sharding, BMUF). On TPU with bf16 compute + fp32 params none of the loss-
scaler machinery is needed, and ZeRO-style optimizer-state sharding falls
out of GSPMD sharding rules rather than a wrapper class. What remains is a
thin optax factory with the reference's schedule semantics
(ofa_polynomial_decay with warmup_ratio + reinit-on-resume,
engine/lr/polynomial_decay_schedule.py:45).
"""

from __future__ import annotations

from typing import Optional

import optax

from ofasys_tpu.configure.configs import OptimizationConfig


def polynomial_decay_schedule(
    lr: float,
    total_num_update: int,
    warmup_updates: int = 0,
    warmup_ratio: float = 0.0,
    end_learning_rate: float = 0.0,
    power: float = 1.0,
) -> optax.Schedule:
    """Linear warmup then polynomial decay to end LR at total_num_update."""
    if warmup_ratio > 0:
        warmup_updates = int(warmup_ratio * total_num_update)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = jnp.float32(max(warmup_updates, 0))
        total = jnp.float32(max(total_num_update, 1))
        warmup_lr = lr * step / jnp.maximum(warm, 1.0)
        pct_remaining = 1.0 - (step - warm) / jnp.maximum(total - warm, 1.0)
        pct_remaining = jnp.clip(pct_remaining, 0.0, 1.0)
        decayed = (lr - end_learning_rate) * pct_remaining ** power + end_learning_rate
        return jnp.where(step < warm, warmup_lr, decayed)

    return schedule


def build_lr_schedule(cfg: OptimizationConfig, total_num_update: Optional[int] = None) -> optax.Schedule:
    total = total_num_update or cfg.total_num_update or cfg.max_update or 100000
    name = cfg.lr_scheduler
    if name in ("ofa_polynomial_decay", "polynomial_decay"):
        return polynomial_decay_schedule(
            lr=cfg.lr[0],
            total_num_update=total,
            warmup_updates=cfg.warmup_updates,
            warmup_ratio=cfg.warmup_ratio,
            end_learning_rate=cfg.end_learning_rate,
            power=cfg.power,
        )
    if name in ("fixed", "constant"):
        return optax.constant_schedule(cfg.lr[0])
    if name == "inverse_sqrt":
        warm = max(cfg.warmup_updates, 1)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.lr[0], warm),
             lambda s: cfg.lr[0] * (warm / (s + warm)) ** 0.5],
            [warm],
        )
    raise ValueError(f"unknown lr scheduler {name!r}")


def build_optimizer(cfg: OptimizationConfig, total_num_update: Optional[int] = None) -> optax.GradientTransformation:
    """adam/adamw/adafactor/sgd/adagrad/adadelta behind the reference's
    --optimizer names (engine/optim/__init__.py)."""
    schedule = build_lr_schedule(cfg, total_num_update)
    name = cfg.optimizer
    if name in ("adam", "adamw"):
        use_w = cfg.use_adamw or name == "adamw" or cfg.weight_decay > 0
        opt = optax.adamw(
            schedule,
            b1=cfg.adam_betas[0],
            b2=cfg.adam_betas[1],
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay if use_w else 0.0,
        )
    elif name == "adafactor":
        opt = optax.adafactor(schedule)
    elif name == "sgd":
        opt = optax.sgd(schedule)
    elif name == "nag":
        opt = optax.sgd(schedule, momentum=0.99, nesterov=True)
    elif name == "adagrad":
        opt = optax.adagrad(schedule)
    elif name == "adadelta":
        opt = optax.adadelta(schedule)
    elif name == "adamax":
        opt = optax.adamax(schedule, b1=cfg.adam_betas[0], b2=cfg.adam_betas[1], eps=cfg.adam_eps)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    chain = []
    if cfg.clip_norm and cfg.clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_norm))
    chain.append(opt)
    return optax.chain(*chain)
