import sqlite3

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_execution_accuracy(tmp_path):
    from ofasys_tpu.utils.sql_eval import execution_accuracy, execution_match

    db = str(tmp_path / "farm.sqlite")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE cows (id INTEGER, name TEXT, weight REAL)")
    conn.executemany("INSERT INTO cows VALUES (?,?,?)",
                     [(1, "bess", 500.0), (2, "anna", 450.0), (3, "carl", 600.0)])
    conn.commit()
    conn.close()

    gold = "SELECT name FROM cows WHERE weight > 460 ORDER BY weight"
    # semantically equivalent, different syntax
    pred_ok = "select name from cows where weight >= 461 order by weight asc"
    pred_bad = "SELECT name FROM cows"
    pred_invalid = "SELEC nothing"
    assert execution_match(db, pred_ok, gold)
    assert not execution_match(db, pred_bad, gold)
    assert not execution_match(db, pred_invalid, gold)
    # unordered compare ignores ordering
    assert execution_match(db, "SELECT id FROM cows ORDER BY id DESC", "SELECT id FROM cows")
    acc = execution_accuracy([pred_ok, pred_bad], [gold, gold], [db, db])
    assert acc == 0.5


def test_pooling_head():
    from ofasys_tpu.model.pooling import OFAPoolingModel, PoolingDecoderConfig

    for mode in ("mean", "max", "first"):
        m = OFAPoolingModel(PoolingDecoderConfig(num_classes=3, pooling=mode))
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 16)), jnp.float32)
        mask = jnp.asarray([[False] * 5, [False, False, False, True, True]])
        params = m.init_params(jax.random.PRNGKey(0), x, mask)
        out = m.apply(params, x, mask)
        assert out.shape == (2, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_hifigan_generator_shapes():
    from ofasys_tpu.model.hifigan import HifiGanConfig, HifiGanVocoder

    cfg = HifiGanConfig(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                        upsample_initial_channel=32,
                        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),))
    voc = HifiGanVocoder(cfg)
    assert voc.hop_length == 16
    mel = np.random.default_rng(0).standard_normal((12, 80)).astype(np.float32)
    wav = voc(mel)
    assert wav.shape == (12 * 16,)
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0
