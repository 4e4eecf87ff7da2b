"""Checkpoint surgery: vocab-remap on resume, prune, legacy upgrade
(reference model/ofa.py:443-511, utils/checkpoint_utils.py:465,579)."""

import jax
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig
from ofasys_tpu.utils import checkpoint_utils


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def _records(words, n=32, seed=0):
    rng = np.random.default_rng(seed)
    return [{"src": " ".join(words[j] for j in rng.integers(0, len(words), 4)),
             "tgt": " ".join(words[j] for j in rng.integers(0, len(words), 3))}
            for _ in range(n)]


def _model():
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 1
    m.cfg.dropout = 0.0
    return m


def test_resume_after_vocab_growth_remaps_embeddings(tmp_path):
    words_a = ["red", "blue", "green", "bird"]
    save_dir = str(tmp_path / "ckpt")

    # --- run 1: single task, train 2 updates, checkpoint
    t1 = Task(name="copy", instruction="[TEXT:src] -> [TEXT:tgt]")
    t1.cfg.dataset.batch_size = 8
    t1.add_dataset(_records(words_a), "train")
    cfg = TrainerConfig()
    cfg.checkpoint.save_dir = save_dir
    cfg.optimization.lr = (1e-3,)
    tr1 = Trainer(cfg)
    m1 = _model()
    state1 = tr1.fit(m1, [t1], max_update=2)
    saved_emb = np.asarray(
        jax.device_get(state1.params["embed_tokens"]["embedding"]), np.float32
    )
    saved_dict = tr1.global_dict

    # --- run 2: add a task whose records grow the vocab, resume
    words_b = ["zephyr", "quixotic", "marmalade", "nebula", "sprocket"]
    t1b = Task(name="copy", instruction="[TEXT:src] -> [TEXT:tgt]")
    t1b.cfg.dataset.batch_size = 8
    t1b.add_dataset(_records(words_a), "train")
    t2 = Task(name="extra", instruction="[TEXT:src] more -> [TEXT:tgt]")
    t2.cfg.dataset.batch_size = 8
    t2.add_dataset(_records(words_b, seed=1), "train")
    cfg2 = TrainerConfig()
    cfg2.checkpoint.save_dir = save_dir
    cfg2.optimization.lr = (1e-3,)
    tr2 = Trainer(cfg2)
    m2 = _model()
    state2 = tr2.fit(m2, [t1b, t2], max_update=4)

    # resumed from update 2, trained to 4 (sum mode: 1 step per update)
    assert int(state2.step) == 4
    assert np.isfinite(tr2.meters["copy:loss"].avg)
    assert np.isfinite(tr2.meters["extra:loss"].avg)

    # old-token embeddings were carried over bit-identically at restore time:
    # verify via a fresh restore through the surgery path
    tr3 = Trainer(cfg2)
    m3 = _model()
    start = tr3.setup(m3, [t1b, t2], max_update=8)
    # NOTE: checkpoint_last now holds run-2 state (same vocab as tr3) — so
    # instead check the remap function directly against run-1 data.
    new_dict = tr3.global_dict
    remapped = checkpoint_utils.remap_vocab_rows(
        {"params": {"embed_tokens": {"embedding": saved_emb}}},
        saved_dict.state_dict()["symbols"],
        new_dict,
    )
    new_emb = remapped["params"]["embed_tokens"]["embedding"]
    assert new_emb.shape[0] == len(new_dict)
    for sym, old_idx in list(saved_dict.indices.items())[:50]:
        ni = new_dict.indices.get(sym)
        if ni is not None:
            np.testing.assert_array_equal(new_emb[ni], saved_emb[old_idx])


def test_remap_vocab_rows_moments_zero_init():
    from ofasys_tpu.preprocessor.dictionary import Dictionary

    old = Dictionary()
    for w in ["alpha", "beta"]:
        old.add_symbol(w)
    new = Dictionary()
    for w in ["alpha", "gamma", "beta"]:
        new.add_symbol(w)

    E = 4
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((len(old), E)).astype(np.float32)
    mu = rng.standard_normal((len(old), E)).astype(np.float32)
    state = {
        "params": {"embed_tokens": {"embedding": emb}},
        "opt_state": {"mu": {"embed_tokens": {"embedding": mu}}},
    }
    out = checkpoint_utils.remap_vocab_rows(state, old.state_dict()["symbols"], new)
    new_emb = out["params"]["embed_tokens"]["embedding"]
    new_mu = out["opt_state"]["mu"]["embed_tokens"]["embedding"]
    assert new_emb.shape[0] == len(new)
    # carried rows identical in both params and moments
    np.testing.assert_array_equal(new_emb[new.index("alpha")], emb[old.index("alpha")])
    np.testing.assert_array_equal(new_mu[new.index("beta")], mu[old.index("beta")])
    # brand-new token: params row is random-normal, moment row is zeros
    g = new.index("gamma")
    assert np.abs(new_emb[g]).sum() > 0
    np.testing.assert_array_equal(new_mu[g], np.zeros(E, np.float32))


def test_prune_and_upgrade_helpers():
    state = {
        "params": {
            "encoder": {"layers_0": {"k": np.ones(2)}, "layers_1": {"k": np.ones(2)}},
            "decoder": {"layers_0": {"k": np.ones(2)}},
        }
    }
    pruned = checkpoint_utils.prune_state_dict(state, drop=["encoder/layers_1"])
    assert "layers_1" not in pruned["params"]["encoder"]
    assert "layers_0" in pruned["params"]["encoder"]

    meta = {"dictionary": {"symbols": ["a"]}, "iterator_states": [{"epoch": 1}]}
    up = checkpoint_utils.upgrade_state_meta(meta)
    assert "global_dict" in up and up["iterator_states"]["0"]["epoch"] == 1
