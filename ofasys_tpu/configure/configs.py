"""Trainer config dataclass tree.

TPU-native counterpart of the reference config tree
(ofasys/configure/configs.py:33-895). Deliberate deltas from the reference:

  * fp16 + DynamicLossScaler subsystem is replaced by a single
    ``dtype: "bfloat16"`` compute policy (fp32 params/optimizer) — bf16 on
    TPU needs no loss scaling. The fp16 flags remain accepted for config
    compatibility but map onto the bf16 policy.
  * DDP/FSDP/ZeRO wrapper selection collapses into mesh axis sizes
    (``ParallelConfig``): one jax.sharding.Mesh with
    (data, fsdp, tensor) axes instead of wrapper classes
    (reference distributed/distributed_model_dispatcher.py:25).
  * pipeline_* scaffolding of the reference is mapped to an optional
    ``pipeline`` mesh axis (reference never shipped the wrap).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class BaseDataclass:
    """Marker base so components can test isinstance; also hosts `.update`."""

    def update(self, **kwargs):
        from ofasys_tpu.configure.config_store import update_config

        return update_config(self, **kwargs)


@dataclass
class CommonConfig(BaseDataclass):
    # reference configure/configs.py:107 (seed/fp16/bf16/amp/profile)
    seed: int = 1
    # compute dtype policy: "bfloat16" | "float32"; params+opt always fp32.
    # fp16/bf16 are reference-config compat flags: either one forces the
    # bfloat16 policy (there is no fp16+loss-scaler path on TPU).
    dtype: str = "bfloat16"
    fp16: bool = False
    bf16: bool = False
    log_interval: int = 100
    log_format: str = "simple"
    tensorboard_logdir: Optional[str] = None
    wandb_project: Optional[str] = None
    azureml_logging: bool = False
    # jax.profiler trace of the whole update loop -> profile_dir
    # (TensorBoard/Perfetto-readable; see CLAUDE.md for the xplane recipe)
    profile: bool = False
    profile_dir: str = "/tmp/ofasys_tpu_profile"
    # extra module directory imported before config build so user
    # @register_config side effects fire (reference common.user_dir)
    user_dir: Optional[str] = None
    # (reference empty_cache_freq / model_parallel_size are deleted: the
    # first is a CUDA allocator knob with no XLA counterpart, the second
    # is superseded by parallel.tensor)


@dataclass
class ParallelConfig(BaseDataclass):
    """One mesh instead of DDP/FSDP/ZeRO wrappers (reference §2.10).

    Axis sizes multiply to the device count; -1 means "absorb the rest"
    (at most one axis may be -1).
    """

    data: int = -1       # pure data-parallel axis (DCN-friendly)
    fsdp: int = 1        # parameter/optimizer sharding axis (ZeRO-3 analogue)
    tensor: int = 1      # tensor/model parallelism (Megatron analogue)
    expert: int = 1      # MoE expert-parallel axis
    sequence: int = 1    # context/sequence parallelism (beyond-reference)
    pipeline: int = 1    # GPipe pipeline stages (parallel/pipeline.py)
    # remat ('none'|'selective'|'full') — activation checkpointing, mapped
    # onto model.remat by Trainer.fit ('selective' = save matmul results,
    # recompute elementwise chains). Default none: on the v5e mixed-task
    # bench even the selective policy measured ~14% slower than storing
    # activations (1170 vs 1360 samples/s) — remat is a MEMORY knob for
    # large archs/long sequences, not a throughput win at base scale.
    remat: str = "none"
    # shard optimizer state along fsdp axis even when fsdp==1 & data>1 (ZeRO-1)
    zero1: bool = False


@dataclass
class DatasetConfig(BaseDataclass):
    # reference configure/configs.py:377
    num_workers: int = 2           # host-side prefetch depth (threaded; XLA
                                   # has no worker *processes* to spawn)
    batch_size: int = 8
    batch_size_valid: Optional[int] = None
    # token-budget batching, resolved STATICALLY per task: batch_size =
    # max_tokens // (max_src_length + max_tgt_length), floored to
    # required_batch_size_multiple (XLA needs shape-stable batches; the
    # reference's per-batch dynamic length bucketing would retrace)
    max_tokens: Optional[int] = None
    update_freq: int = 1           # gradient accumulation microbatches
    required_batch_size_multiple: int = 8
    train_data: str = ""
    valid_data: str = ""
    test_data: str = ""
    selected_cols: Optional[str] = None
    text_bin_length: int = 512     # record length for oss-bin LM streams
    disable_validation: bool = False
    validate_interval: int = 1     # validate every N epochs (epoch = first
                                   # task's iterator rollover)
    validate_interval_updates: int = 0
    fixed_validation_seed: Optional[int] = None
    max_valid_batches: Optional[int] = None  # cap validation batches per pass
    # (reference skip_invalid_size_inputs_valid_test deleted: preprocessors
    # truncate to max lengths instead of skipping, so no sample is invalid;
    # num_workers doubles as the host-side prefetch depth)


@dataclass
class OptimizationConfig(BaseDataclass):
    # reference configure/configs.py:453
    max_epoch: int = 0
    max_update: int = 0
    lr: Tuple[float, ...] = (0.0001,)
    stop_min_lr: float = -1.0
    clip_norm: float = 1.0
    sentence_avg: bool = False
    # keep the ragged final batch of each epoch? Default False (= skip):
    # a second program shape per task would retrace under jit
    skip_remainder_batch: bool = True
    optimizer: str = "adam"
    lr_scheduler: str = "ofa_polynomial_decay"
    # adam/adamw
    adam_betas: Tuple[float, float] = (0.9, 0.999)
    adam_eps: float = 1e-8
    weight_decay: float = 0.01
    use_adamw: bool = True
    # Multi-task scheduling: 'sum' = reference co-training semantics (one
    # optimizer step per update, gradients summed across all task batches,
    # ofasys/engine/trainer.py:766-880); 'round_robin' = one optimizer step
    # per task batch.
    multi_task_mode: str = "sum"
    # polynomial decay
    warmup_updates: int = 0
    warmup_ratio: float = 0.0
    end_learning_rate: float = 0.0
    power: float = 1.0
    total_num_update: Optional[int] = None


@dataclass
class CheckpointConfig(BaseDataclass):
    # reference configure/configs.py:490
    save_dir: str = "checkpoints"
    restore_file: str = "checkpoint_last"
    finetune_from_model: Optional[str] = None
    reset_dataloader: bool = False
    reset_lr_scheduler: bool = False
    reset_meters: bool = False
    reset_optimizer: bool = False
    save_interval: int = 1
    save_interval_updates: int = 0
    keep_interval_updates: int = -1
    # even when rotation would delete them, keep update checkpoints whose
    # update count is a multiple of this (reference
    # keep_interval_updates_pattern, checkpoint_utils.py:99-107)
    keep_interval_updates_pattern: int = -1
    keep_last_epochs: int = -1
    keep_best_checkpoints: int = -1
    no_save: bool = False
    no_epoch_checkpoints: bool = False
    no_last_checkpoints: bool = False
    no_save_optimizer_state: bool = False
    best_checkpoint_metric: str = "loss"
    maximize_best_checkpoint_metric: bool = False
    patience: int = -1
    async_save: bool = True        # orbax async checkpointing
    # (reference optimizer_overrides deleted: the optax chain is always
    # rebuilt from cfg.optimization on resume, so editing the config IS the
    # override mechanism; checkpoint_suffix / checkpoint_shard_count /
    # load_checkpoint_on_all_dp_ranks deleted: orbax checkpoints are
    # natively sharded and every host participates in save/restore)


@dataclass
class EMAConfig(BaseDataclass):
    # reference configure/configs.py:847
    store_ema: bool = False
    ema_decay: float = 0.9999
    ema_start_update: int = 0      # shadow copies the raw params before this
    ema_update_freq: int = 1       # decay applied every N updates
    # (reference ema_fp32 deleted: params — and therefore the EMA shadow —
    # are always fp32 masters under the bf16-compute policy)


@dataclass
class GenerationConfig(BaseDataclass):
    # reference configure/configs.py:610 (+ hub per-modality defaults)
    beam: int = 5
    max_len_a: float = 0.0
    max_len_b: int = 200
    min_len: int = 1
    ngram_blocker: int = 0         # no_repeat_ngram_size
    sampling: bool = False
    sampling_topk: int = -1
    sampling_topp: float = -1.0
    temperature: float = 1.0
    return_n_best: int = 1
    constraint_range: Optional[str] = None
    lenpen: float = 1.0
    unkpen: float = 0.0
    max_len: int = -1              # hard cap on a*src+b (reference max_len=256)
    normalize_scores: bool = True  # divide final scores by len**lenpen
    match_source_len: bool = False # force output length == source length
    # search strategy family (reference utils/search.py:204-787)
    search_strategy: str = "beam"    # beam | diverse_beam | diverse_siblings | lexical
    num_groups: int = 2              # diverse_beam groups
    diversity_strength: float = 0.5  # diverse_beam Hamming penalty
    diversity_rate: float = 0.5      # diverse_siblings rank penalty


@dataclass
class TrainerConfig(BaseDataclass):
    # reference configure/configs.py:863-895
    common: CommonConfig = field(default_factory=CommonConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimization: OptimizationConfig = field(default_factory=OptimizationConfig)
    checkpoint: CheckpointConfig = field(default_factory=CheckpointConfig)
    ema: EMAConfig = field(default_factory=EMAConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)

    @classmethod
    def from_yaml(cls, path: str) -> "TrainerConfig":
        from ofasys_tpu.launch import load_yaml_config
        from ofasys_tpu.configure.config_store import from_dict

        data = load_yaml_config(path)
        return from_dict(cls, data.get("trainer", data))
