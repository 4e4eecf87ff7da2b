import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu.logging import metrics as M
from ofasys_tpu.logging.progress_bar import JsonProgressBar, build_progress_bar
from ofasys_tpu.engine.nan_detector import check_tree
from ofasys_tpu.utils.profiler import Watchdog, time_fn


def test_metrics_aggregation_contexts():
    M.reset_meters()
    M.log_scalar("loss", 2.0)
    with M.aggregate("valid") as agg:
        M.log_scalar("loss", 4.0)
        assert agg.get_smoothed_values()["loss"] == 4.0
    vals = M.get_smoothed_values("default")
    assert vals["loss"] == 3.0  # averaged over both updates
    state = M.state_dict()
    M.load_state_dict(state)
    assert M.get_smoothed_values("valid")["loss"] == 4.0


def test_progress_bar_json(capsys):
    bar = JsonProgressBar(epoch=2)
    bar.log({"loss": 1.23456}, step=10)
    out = capsys.readouterr().out
    assert '"loss": 1.2346' in out and '"epoch": 2' in out
    assert build_progress_bar("simple") is not None


def test_nan_detector_finds_paths():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    bad = check_tree(tree)
    assert bad == ["b/c"]
    assert check_tree({"x": jnp.ones(2)}) == []


def test_watchdog_fires_without_kill():
    import time

    wd = Watchdog(timeout=0.3, kill=False).start()
    time.sleep(1.0)
    wd.stop()
    assert wd.fired


def test_time_fn():
    f = jax.jit(lambda x: x * 2)
    dt = time_fn(f, jnp.ones(8), iters=3)
    assert dt > 0


def test_save_checkpoint_over_symlink(tmp_path):
    """Saving under a name that currently exists as the checkpoint_last
    symlink (the final explicit save after interval saves) must not crash —
    rmtree raises on symlinks."""
    from ofasys_tpu.utils.checkpoint_utils import load_checkpoint, save_checkpoint

    state = {"w": jnp.arange(4, dtype=jnp.float32)}
    sd = str(tmp_path)
    save_checkpoint(sd, "checkpoint_1_10", state, meta={"step": 10})
    import os

    assert os.path.islink(os.path.join(sd, "checkpoint_last"))
    state2 = {"w": jnp.arange(4, dtype=jnp.float32) * 2}
    save_checkpoint(sd, "checkpoint_last", state2, meta={"step": 11})
    restored, meta = load_checkpoint(os.path.join(sd, "checkpoint_last"), target=state2)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state2["w"]))
    assert meta["step"] == 11


def test_torch_import_roundtrip():
    """Export our params with torch naming, re-import, require bit equality —
    validates every mapping rule without the real checkpoint."""
    from ofasys_tpu import GeneralistModel, ModalityType
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch
    from ofasys_tpu.utils.torch_import import (
        export_reference_state_dict,
        import_reference_state_dict,
    )

    d = Dictionary()
    for i in range(64):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 2
    m.initialize(d, active_adaptors=("text",))
    src = SlotBatch(ModalityType.TEXT, True, {"inputs": jnp.ones((2, 6), jnp.int32)}, "s")
    tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.ones((2, 4), jnp.int32)}, "t")
    params = m.init_params(jax.random.PRNGKey(0), [src, tgt])

    sd = export_reference_state_dict(params)
    assert "encoder.adaptor.embed_tokens.weight" in sd
    assert "encoder.layers.0.self_attn.q_proj.weight" in sd
    assert "encoder.adaptor.text.token_rel_pos_table_list.0.weight" in sd
    assert "decoder.cross_pos_q_linear.weight" in sd
    assert "decoder.layers.1.ffn_layernorm.weight" in sd

    # corrupt target params, then restore from exported dict
    zeros = jax.tree.map(jnp.zeros_like, params)
    restored, missing, unused = import_reference_state_dict(sd, zeros)
    assert missing == [], missing[:5]
    assert unused == [], unused[:5]
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # torch-shaped quirks vs real reference checkpoints: type_embedding is
    # Embedding(1, E).weight = (1, E) (reference adaptor/base.py:143) and the
    # token embedding vocab axis is padded to 8 by fairseq vs 128 here
    te_key = "encoder.adaptor.text.type_embedding.weight"
    emb_key = "encoder.adaptor.embed_tokens.weight"
    assert sd[te_key].ndim == 2 and sd[te_key].shape[0] == 1
    sd2 = dict(sd)
    sd2[emb_key] = sd[emb_key][:-4]  # simulate smaller fairseq padding
    restored2, missing2, _ = import_reference_state_dict(sd2, zeros)
    assert not any("embed_tokens" in m or "type_embedding" in m for m in missing2)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(restored2)[0]
    }
    emb = flat["embed_tokens/embedding"]
    orig = np.asarray(sd[emb_key])
    np.testing.assert_array_equal(np.asarray(emb)[: orig.shape[0] - 4], orig[:-4])


def test_ms_wrapper_import_is_gated():
    """ModelScope wrapper must import cleanly without modelscope installed
    (registration only fires when the SDK is present)."""
    import ofasys_tpu.ms_wrapper as ms

    assert hasattr(ms, "_HAS_MODELSCOPE")
    assert ms.TASK_NAME == "ofasys-task"
