"""Config flags wired in the round-2 dead-flag sweep: epoch checkpoints,
restore_file / finetune_from_model / params-only checkpoints, reset
modifiers, max_tokens static batching, EMA start/freq gating, fp16/bf16
compat dtype flags."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, Task, Trainer
from ofasys_tpu.configure import TrainerConfig


def _task(n=32, name="copy"):
    words = ["alpha", "beta", "gamma", "delta"]
    recs = [{"src": w, "tgt": w} for w in words] * (n // 4)
    task = Task(name=name, instruction="[TEXT:src] -> [TEXT:tgt]")
    task.cfg.dataset.batch_size = 8
    task.add_dataset(recs, "train")
    return task


def _model(layers=1):
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = layers
    m.cfg.dropout = 0.0
    return m


def test_epoch_checkpoints_and_rotation(tmp_path):
    """Epoch boundary saves checkpoint_e<N>; keep_last_epochs rotates."""
    cfg = TrainerConfig()
    cfg.optimization.lr = (1e-3,)
    cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
    cfg.checkpoint.keep_last_epochs = 2
    # 32 records / batch 8 = 4 updates per epoch; 20 updates ≈ 5 epochs
    Trainer(cfg).fit(_model(), [_task()], max_update=20)
    names = sorted(os.listdir(cfg.checkpoint.save_dir))
    epochs = [n for n in names if n.startswith("checkpoint_e")
              and not n.endswith(".meta.json")]
    assert epochs, names
    assert len(epochs) <= 2, epochs  # rotation kept only the last 2


def test_max_epoch_stops_training(tmp_path):
    cfg = TrainerConfig()
    cfg.optimization.lr = (1e-3,)
    cfg.optimization.max_epoch = 2
    cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
    tr = Trainer(cfg)
    tr.fit(_model(), [_task()], max_update=100)
    # 4 updates/epoch, max_epoch 2 -> stopped well before 100
    assert int(tr.state.step) <= 12, int(tr.state.step)


def test_finetune_from_model_and_params_only(tmp_path):
    """no_save_optimizer_state saves a params-only ckpt; finetune_from_model
    warm-starts weights with a fresh optimizer."""
    cfg = TrainerConfig()
    cfg.optimization.lr = (1e-3,)
    cfg.checkpoint.save_dir = str(tmp_path / "a")
    cfg.checkpoint.no_save_optimizer_state = True
    tr = Trainer(cfg)
    state = tr.fit(_model(), [_task()], max_update=3)
    src_params = jax.device_get(state.params)

    cfg2 = TrainerConfig()
    cfg2.optimization.lr = (0.0,)  # lr 0: params must stay the warm-start
    cfg2.checkpoint.save_dir = str(tmp_path / "b")
    cfg2.checkpoint.finetune_from_model = str(tmp_path / "a" / "checkpoint_last")
    tr2 = Trainer(cfg2)
    state2 = tr2.fit(_model(), [_task()], max_update=1)
    a = jax.tree.leaves(src_params)[0]
    b = jax.tree.leaves(jax.device_get(state2.params))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(state2.step) == 1  # fresh run, not resumed


def test_restore_file_selects_checkpoint(tmp_path):
    cfg = TrainerConfig()
    cfg.optimization.lr = (1e-3,)
    cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
    cfg.checkpoint.save_interval_updates = 2
    Trainer(cfg).fit(_model(), [_task()], max_update=4)
    assert os.path.exists(tmp_path / "ckpt" / "checkpoint_1_2")

    cfg2 = TrainerConfig()
    cfg2.optimization.lr = (1e-3,)
    cfg2.checkpoint.save_dir = str(tmp_path / "ckpt")
    cfg2.checkpoint.restore_file = "checkpoint_1_2"
    cfg2.checkpoint.reset_dataloader = True
    cfg2.checkpoint.reset_meters = True
    tr = Trainer(cfg2)
    start = tr.setup(_model(), [_task()], max_update=6)
    assert start == 2  # resumed from the named mid-run checkpoint


def test_reset_optimizer_restores_weights(tmp_path):
    """reset_optimizer keeps the checkpoint's model weights but restarts the
    optimizer and step count (reference trainer.py:642)."""
    cfg = TrainerConfig()
    cfg.optimization.lr = (1e-3,)
    cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
    tr = Trainer(cfg)
    state = tr.fit(_model(), [_task()], max_update=3)
    trained = jax.tree.leaves(jax.device_get(state.params))[0]

    cfg2 = TrainerConfig()
    cfg2.optimization.lr = (0.0,)
    cfg2.checkpoint.save_dir = str(tmp_path / "ckpt")
    cfg2.checkpoint.reset_optimizer = True
    tr2 = Trainer(cfg2)
    start = tr2.setup(_model(), [_task()], max_update=1)
    assert start == 0  # step restarts at zero
    a = jax.tree.leaves(jax.device_get(tr2.state.params))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(trained), atol=1e-6)


def test_max_tokens_static_batching():
    task = _task()
    task.cfg.dataset.max_tokens = 4096
    task.cfg.dataset.required_batch_size_multiple = 4
    pre = None
    # initialize to build preprocessors (vocab irrelevant here)
    from ofasys_tpu.preprocessor.dictionary import Dictionary

    task.initialize(Dictionary())
    it = task.get_batch_iterator("train")
    expected = (4096 // task.max_sample_tokens()) // 4 * 4
    assert it.batch_size == max(4, expected), (it.batch_size, expected)


def test_ema_start_and_freq_gating():
    """Before ema_start_update the shadow tracks raw params; after, decay."""
    import optax

    from ofasys_tpu.engine.train_step import TrainState, make_apply_step

    opt = optax.sgd(0.1)
    params = {"w": jnp.ones((4,))}
    state = TrainState.create(params, opt, ema=True)
    apply_step = make_apply_step(opt, ema_decay=0.9, ema_start_update=2,
                                 ema_update_freq=1)
    grads = {"w": jnp.ones((4,))}
    # steps 0,1: before start -> ema == params exactly
    for _ in range(2):
        state, _ = apply_step(state, grads, jnp.float32(1.0))
        np.testing.assert_allclose(np.asarray(state.ema_params["w"]),
                                   np.asarray(state.params["w"]))
    # step 2: decay kicks in -> shadow lags the params
    state, _ = apply_step(state, grads, jnp.float32(1.0))
    assert float(state.ema_params["w"][0]) > float(state.params["w"][0])


def test_fp16_flag_forces_bf16_policy(tmp_path):
    cfg = TrainerConfig()
    cfg.common.dtype = "float32"
    cfg.common.fp16 = True   # reference-config compat: forces bf16 compute
    cfg.optimization.lr = (1e-3,)
    cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
    cfg.checkpoint.no_save = True
    m = _model()
    Trainer(cfg).fit(m, [_task()], max_update=1)
    assert m.net.dtype == jnp.bfloat16


def test_zero1_shards_optimizer_state():
    """zero1 on a pure-DP mesh shards optimizer moments over 'data' while
    params stay replicated; a sharded step still runs."""
    from ofasys_tpu.configure.configs import ParallelConfig
    from ofasys_tpu.parallel import build_mesh

    cfg = TrainerConfig()
    cfg.optimization.lr = (1e-3,)
    cfg.parallel = ParallelConfig(data=-1, fsdp=1, zero1=True)
    cfg.checkpoint.no_save = True
    tr = Trainer(cfg)
    task = _task()
    tr.fit(_model(), [task], max_update=2)
    # find a large moment leaf and check its sharding spec uses 'data'
    import jax

    specs = [
        (x.sharding.spec if hasattr(x, "sharding") else None)
        for x in jax.tree.leaves(tr.state.opt_state)
        if getattr(x, "ndim", 0) >= 2
    ]
    assert any(s is not None and "data" in str(s) for s in specs), specs
    p_specs = {
        str(x.sharding.spec)
        for x in jax.tree.leaves(tr.state.params)
        if getattr(x, "ndim", 0) >= 2
    }
    assert all("data" not in s for s in p_specs), p_specs


def test_layerdrop_trains_and_evals_deterministically():
    import optax

    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch
    from ofasys_tpu import ModalityType

    d = Dictionary()
    for i in range(40):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 2
    m.cfg.encoder.layerdrop = m.cfg.decoder.layerdrop = 0.5
    m.cfg.dropout = 0.0
    m.initialize(d, active_adaptors=("text",), dtype=jnp.float32)
    r = np.random.default_rng(0)
    toks = jnp.asarray(r.integers(4, 40, (2, 6)), jnp.int32)
    slots = [
        SlotBatch(ModalityType.TEXT, True, {"inputs": toks}, "src"),
        SlotBatch(ModalityType.TEXT, False, {"inputs": toks}, "tgt"),
    ]
    params = m.init_params(jax.random.PRNGKey(0), slots)
    # training mode: different dropout rngs give different outputs (layers
    # actually drop); eval is deterministic and uses all layers
    o1, _ = m.apply(params, slots, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    o2, _ = m.apply(params, slots, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(o1, np.float32), np.asarray(o2, np.float32))
    e1, _ = m.apply(params, slots, deterministic=True)
    e2, _ = m.apply(params, slots, deterministic=True)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    # scan_layers + layerdrop is an explicit config error
    m2 = GeneralistModel(arch="tiny")
    m2.cfg.encoder.layerdrop = 0.1
    m2.cfg.scan_layers = True
    with pytest.raises(ValueError):
        m2.initialize(d, active_adaptors=("text",))


def test_unkpen_penalizes_unk():
    from ofasys_tpu.generator import SequenceGenerator
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch
    from ofasys_tpu import ModalityType

    d = Dictionary()
    for i in range(40):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 1
    m.cfg.dropout = 0.0
    m.initialize(d, active_adaptors=("text",), dtype=jnp.float32)
    r = np.random.default_rng(0)
    toks = jnp.asarray(r.integers(4, 40, (1, 5)), jnp.int32)
    slots = [
        SlotBatch(ModalityType.TEXT, True, {"inputs": toks}, "src"),
        SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.zeros((1, 4), jnp.int32)}, "tgt"),
    ]
    params = m.init_params(jax.random.PRNGKey(0), slots)
    sample = {"net_input": {"slots": slots}}
    # a huge unk penalty must keep <unk> out of the emitted tokens
    gen = SequenceGenerator(m, d, beam_size=2, max_len_b=6, min_len=1, unkpen=1e6)
    out = gen.generate(params, sample)
    for hyp in out[0]:
        assert d.unk() not in list(hyp.tokens)


def test_keep_interval_updates_pattern(tmp_path):
    """Rotation never deletes updates divisible by the pattern
    (reference checkpoint_utils.py:99-107)."""
    from ofasys_tpu.utils.checkpoint_utils import _prune

    d = str(tmp_path)
    for u in (5, 10, 15, 20, 25, 30):
        os.makedirs(os.path.join(d, f"checkpoint_1_{u}"))
    _prune(d, keep=2, keep_multiple=10)
    left = sorted(os.listdir(d))
    # multiples of 10 survive; of the rest only the newest 2 remain
    assert left == ["checkpoint_1_10", "checkpoint_1_15",
                    "checkpoint_1_20", "checkpoint_1_25", "checkpoint_1_30"], left


def test_user_dir_imports_modules(tmp_path):
    from ofasys_tpu.launch import import_user_dir

    (tmp_path / "my_plugin.py").write_text("MAGIC = 41\n")
    import_user_dir(str(tmp_path))
    import sys

    assert sys.modules["ofasys_user_my_plugin"].MAGIC == 41
