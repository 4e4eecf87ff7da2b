"""torch_import CLI (docs/migrating.md porting checklist step 1):
export a tiny model to reference-named torch format, convert back with
main(), load the result through OFASys.from_pretrained, assert identity."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp


def test_cli_roundtrip(tmp_path):
    from ofasys_tpu import GeneralistModel, ModalityType, OFASys
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch
    from ofasys_tpu.utils import torch_import as ti

    from ofasys_tpu.preprocessor.general import GeneralPreprocess

    d = Dictionary()
    GeneralPreprocess(d, active=["text"])    # same registration the CLI does
    for i in range(100):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)

    model = GeneralistModel(arch="tiny")
    model.cfg.dropout = 0.0
    model.initialize(d, active_adaptors=("text",), dtype=jnp.float32)
    src = SlotBatch(ModalityType.TEXT, True,
                    {"inputs": jnp.zeros((1, 4), jnp.int32)}, "s")
    tgt = SlotBatch(ModalityType.TEXT, False,
                    {"inputs": jnp.zeros((1, 4), jnp.int32)}, "t")
    params = model.init_params(jax.random.PRNGKey(3), [src, tgt])

    sd = ti.export_reference_state_dict(params)
    pt = tmp_path / "ref.pt"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}},
               str(pt))

    out = tmp_path / "converted"
    ti.main([str(pt), str(out), "--arch", "tiny", "--adaptors", "text"])

    hub = OFASys.from_pretrained(str(out / "checkpoint_last"))
    got = {ti._path_str(p): np.asarray(v) for p, v in
           jax.tree_util.tree_flatten_with_path(hub.params)[0]}
    want = {ti._path_str(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    assert set(got) == set(want)
    for kname in want:
        np.testing.assert_allclose(got[kname].astype(np.float32),
                                   want[kname].astype(np.float32),
                                   rtol=2e-2, atol=2e-2, err_msg=kname)
    # the imported vocabulary is placeholder-but-size-matched
    assert len(hub.global_dict) == len(d)
