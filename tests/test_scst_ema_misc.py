import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.configure import ConfigStore
from ofasys_tpu.configure.configs import OptimizationConfig


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def test_scst_update_improves_reward_signal():
    """One SCST policy-gradient update runs end-to-end and produces finite
    loss/grads on the toy model."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_step import copy_batch, tiny_model

    from ofasys_tpu.engine.criterion.scst_loss import ScstRewardCriterion, ScstRewardCriterionConfig, scst_train_step
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState
    from ofasys_tpu.generator import SequenceGenerator

    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=2, T=5)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    opt = build_optimizer(OptimizationConfig(lr=(1e-4,)), total_num_update=10)
    state = TrainState.create(params, opt)

    crit = ScstRewardCriterion(ScstRewardCriterionConfig(scst_n_samples=2), pad_id=d.pad())
    gen = SequenceGenerator(m, d, beam_size=1, max_len_b=5, sampling=True, sampling_topk=10)

    class _RawPre:  # decode = raw token string (test vocab has no bpe range)
        @staticmethod
        def decode(toks):
            return " ".join(map(str, np.asarray(toks).tolist()))

    crit.setup(gen, _RawPre())

    # surrogate reward varying with hypothesis length so the advantage is
    # nonzero (CIDEr of random tokens vs random refs is uniformly 0)
    class _LenReward:
        @staticmethod
        def compute(hyps, refs):
            return {"cider": float(len(str(hyps[0])))}

    crit.cider = _LenReward()
    refs = [["some reference text"], ["other reference"]]
    state2, metrics = scst_train_step(crit, m, state, opt, batch, refs)
    assert int(state2.step) == 1
    assert np.isfinite(metrics["loss"]) and np.isfinite(metrics["reward"])
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(state2.params))
    )
    assert moved


def test_ema_shadow_updates():
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_step import copy_batch, tiny_model

    from ofasys_tpu.engine.criterion.label_smoothed_cross_entropy import (
        LabelSmoothedCrossEntropyCriterion,
        LabelSmoothedCrossEntropyCriterionConfig,
    )
    from ofasys_tpu.engine.optim import build_optimizer
    from ofasys_tpu.engine.train_step import TrainState, make_train_step

    m, d = tiny_model(dropout=0.0)
    rng = np.random.default_rng(0)
    batch = copy_batch(d, rng, B=4, T=5)
    params = m.init_params(jax.random.PRNGKey(0), batch["net_input"]["slots"])
    crit = LabelSmoothedCrossEntropyCriterion(LabelSmoothedCrossEntropyCriterionConfig(), pad_id=d.pad())
    opt = build_optimizer(OptimizationConfig(lr=(1e-2,)), total_num_update=10)
    state = TrainState.create(params, opt, ema=True)
    step = jax.jit(make_train_step(m, crit, opt, ema_decay=0.9))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    # ema lags params but is no longer the init values
    p0 = jax.tree.leaves(params)[0]
    pe = jax.tree.leaves(state.ema_params)[0]
    pn = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(pe), np.asarray(p0))
    assert not np.allclose(np.asarray(pe), np.asarray(pn))


def test_cached_path_and_lock(tmp_path):
    from ofasys_tpu.utils.file_utils import cached_path, local_file_lock, register_scheme_fetcher

    f = tmp_path / "x.txt"
    f.write_text("hi")
    assert cached_path(str(f)) == str(f)
    assert cached_path(f"file://{f}") == str(f)

    def fake_fetch(url, dest):
        with open(dest, "w") as fh:
            fh.write("fetched:" + url)

    register_scheme_fetcher("fake", fake_fetch)
    os.environ["OFA_CACHE_HOME"] = str(tmp_path / "cache")
    p = cached_path("fake://bucket/obj.txt")
    assert open(p).read() == "fetched:fake://bucket/obj.txt"
    # second call hits cache (no re-fetch needed to equal content)
    assert cached_path("fake://bucket/obj.txt") == p
    with local_file_lock(str(tmp_path / "l.lock")):
        pass
    with pytest.raises(FileNotFoundError):
        cached_path(str(tmp_path / "missing.txt"))


def test_draw_parses_logs(tmp_path):
    from ofasys_tpu.draw import parse_log

    log = tmp_path / "t.log"
    log.write_text('{"loss": 2.5, "lr": 0.001}\n'
                   "INFO update 10/100 | copy:loss 2.1 | gnorm 0.5\n")
    series = parse_log(str(log))
    assert series["loss"] == [2.5]
    assert series["copy:loss"] == [2.1]
