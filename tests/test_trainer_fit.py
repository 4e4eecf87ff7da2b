"""End-to-end: Task + GeneralistModel + Trainer.fit on a synthetic text task
(the reference's scripts/trainer_api.py usage surface)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig
from ofasys_tpu.configure.configs import ParallelConfig


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def make_records(n=64):
    words = ["red", "blue", "green", "bird", "dog", "cat", "sky", "tree"]
    rng = np.random.default_rng(0)
    recs = []
    for i in range(n):
        ws = [words[j] for j in rng.integers(0, len(words), size=4)]
        s = " ".join(ws)
        recs.append({"src": s, "tgt": s})
    return recs


def test_fit_end_to_end(tmp_path):
    task = Task(name="copy", instruction="[TEXT:src] -> [TEXT:tgt]")
    task.cfg.dataset.batch_size = 8
    task.add_dataset(make_records(), "train")
    task.add_dataset(make_records(16), "valid")

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    model.cfg.dropout = 0.0

    cfg = TrainerConfig()
    cfg.parallel = ParallelConfig(data=8)
    cfg.common.dtype = "bfloat16"
    cfg.optimization.lr = (5e-3,)
    cfg.optimization.warmup_updates = 5
    cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
    cfg.common.log_interval = 10
    trainer = Trainer(cfg)
    state = trainer.fit(model, [task], max_update=30)
    assert int(state.step) == 30

    loss0 = trainer.meters["copy:loss"].avg
    assert np.isfinite(loss0)

    # validation runs
    val = trainer.validate(task, max_batches=2)
    assert "loss" in val and np.isfinite(val["loss"])

    # checkpoint written with metadata
    assert os.path.exists(tmp_path / "ckpt" / "checkpoint_last")
    assert os.path.exists(str(tmp_path / "ckpt" / "checkpoint_last") + ".meta.json")

    # inference through the task API produces text
    it = task.get_batch_iterator("valid")
    batch = next(it.next_epoch_itr(shuffle=False))
    task.cfg.generation.beam = 2
    task.cfg.generation.max_len_b = 8
    outputs = task.inference(model, trainer.state.params, batch)
    assert len(outputs) == 8
    assert outputs[0][0].text is not None


def test_fit_resumes_from_checkpoint(tmp_path):
    task = Task(name="copy", instruction="[TEXT:src] -> [TEXT:tgt]")
    task.cfg.dataset.batch_size = 8
    task.add_dataset(make_records(), "train")
    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2

    cfg = TrainerConfig()
    cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
    trainer = Trainer(cfg)
    state = trainer.fit(model, [task], max_update=5)
    p1 = jnp.asarray(state.params["embed_tokens"]["embedding"])

    ConfigStore().reset()
    # new trainer picks up checkpoint_last and continues
    task2 = Task(name="copy", instruction="[TEXT:src] -> [TEXT:tgt]")
    task2.cfg.dataset.batch_size = 8
    task2.add_dataset(make_records(), "train")
    model2 = GeneralistModel(arch="tiny")
    model2.cfg.encoder.layers = model2.cfg.decoder.layers = 2
    trainer2 = Trainer(cfg)
    state2 = trainer2.fit(model2, [task2], max_update=5)
    # restore happened: start_update == 5, so no extra updates ran
    p2 = jnp.asarray(state2.params["embed_tokens"]["embedding"])
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_patience_early_stop_and_best_checkpoint(tmp_path):
    """validate_and_save: mean-metric tracking, checkpoint_best, patience
    (reference engine/trainer.py:1535-1698, should_stop_early:1381)."""
    task = Task(name="copy", instruction="[TEXT:src] -> [TEXT:tgt]")
    task.cfg.dataset.batch_size = 8
    task.add_dataset(make_records(), "train")
    task.add_dataset(make_records(16), "valid")

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 1
    model.cfg.dropout = 0.0

    cfg = TrainerConfig()
    cfg.optimization.lr = (0.0,)  # frozen model: valid loss can never improve
    cfg.dataset.validate_interval_updates = 2
    cfg.dataset.max_valid_batches = 1
    cfg.checkpoint.patience = 2
    cfg.checkpoint.save_dir = str(tmp_path / "ckpt")
    trainer = Trainer(cfg)
    state = trainer.fit(model, [task], max_update=40)
    # first validation sets best (+ saves checkpoint_best); the next two
    # cannot improve -> stop at update 6, far before 40
    assert int(state.step) <= 8
    assert os.path.exists(tmp_path / "ckpt" / "checkpoint_best")
    assert any(k.startswith("valid:copy:") for k in trainer.meters.keys())
