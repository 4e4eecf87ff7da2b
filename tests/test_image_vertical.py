"""Image vertical: caption-style task end-to-end with the patch-embed and
resnet adaptors, plus box quantization round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, ModalityType, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def fake_image(rng, size=64):
    return (rng.random((size, size, 3)) * 255).astype(np.float32)


def make_caption_records(n=16):
    rng = np.random.default_rng(0)
    caps = ["a red bird", "a blue dog", "a green cat", "a tall tree"]
    return [{"img": fake_image(rng), "cap": caps[i % 4]} for i in range(n)]


def _configure_small_images(task):
    # small images keep the CPU test fast
    for name in ("image", "imagenet"):
        node = ConfigStore().get("ofasys.preprocess", name)
        node.config.patch_image_size = 32


def test_caption_task_trains():
    task = Task(name="caption", instruction="[IMAGE:img] what does the image describe? -> [TEXT:cap]")
    _configure_small_images(task)
    task.cfg.dataset.batch_size = 8
    task.add_dataset(make_caption_records(), "train")

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    model.cfg.dropout = 0.0

    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    cfg.optimization.lr = (5e-3,)
    trainer = Trainer(cfg)
    state = trainer.fit(model, [task], max_update=8)
    assert np.isfinite(trainer.meters["caption:loss"].avg)
    # adaptors activated from the template
    assert "image_vit" in model.net.active_adaptors
    assert "text" in model.net.active_adaptors

    # inference produces text
    it = task.get_batch_iterator("train", fresh=True)
    batch = next(it.next_epoch_itr(shuffle=False))
    task.cfg.generation.beam = 2
    task.cfg.generation.max_len_b = 6
    outs = task.inference(model, state.params, batch)
    assert outs[0][0].text is not None


def test_resnet_adaptor_forward():
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.utils.pytree import SlotBatch

    d = Dictionary()
    for i in range(50):
        d.add_symbol(f"<text>_{i}")
    d.pad_to_multiple_(8)
    m = GeneralistModel(arch="tiny")
    m.cfg.encoder.layers = m.cfg.decoder.layers = 1
    m.initialize(d, active_adaptors=("text", "image_resnet"))
    ConfigStore().get("ofasys.adaptor", "image_resnet").config.resnet_type = "resnet50"
    rng = np.random.default_rng(0)
    img = SlotBatch(ModalityType.IMAGE, True, {"inputs": jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)}, "img",
                    attributes=("adaptor=image_resnet",))
    tgt = SlotBatch(ModalityType.TEXT, False, {"inputs": jnp.ones((2, 4), jnp.int32)}, "cap")
    params = m.init_params(jax.random.PRNGKey(0), [img, tgt])
    logits, _ = m.apply(params, [img, tgt])
    # 64/16 = 4x4 grid; logits over vocab for 4 target positions
    assert logits.shape == (2, 4, len(d))
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_box_quantization_roundtrip():
    from ofasys_tpu.preprocessor.box import BoxPreprocess, BoxPreprocessConfig
    from ofasys_tpu.preprocessor.dictionary import Dictionary

    d = Dictionary()
    bp = BoxPreprocess(d, BoxPreprocessConfig(num_bins=1000))
    box = np.asarray([0.1, 0.2, 0.8, 0.9], np.float32)
    toks = bp.encode_box(box)
    assert toks.shape == (4,)
    assert (toks >= bp.bin_start).all() and (toks < bp.bin_end).all()
    rec = bp.decode(toks)
    np.testing.assert_allclose(rec, box, atol=1e-3)
    # pixel-space round trip
    rec_px = bp.decode(toks, width=640, height=480)
    np.testing.assert_allclose(rec_px, box * [640, 480, 640, 480], atol=1.0)


def test_grounding_template_mixes_box_into_text():
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.general import GeneralPreprocess
    from ofasys_tpu.preprocessor.instruction import Instruction

    d = Dictionary()
    g = GeneralPreprocess(d, active=["text", "image", "box"])
    node = ConfigStore().get("ofasys.preprocess", "image")
    node.config.patch_image_size = 32
    rng = np.random.default_rng(0)
    ist = Instruction(
        '[IMAGE:img] which region does " [TEXT:txt] " describe? -> [BOX:box]'
    ).format(img=fake_image(rng), txt="the red ball", box=[0.2, 0.3, 0.6, 0.7])
    processed = g(ist)
    # image slot + merged text slot on src; box tokens as target text run
    mods = [(s.modality, s.is_src) for s in processed.slots]
    assert mods[0] == (ModalityType.IMAGE, True)
    tgt = processed.slots[-1]
    assert not tgt.is_src
    assert len(tgt.value["inputs"]) == 6  # bos + 4 bins + eos
    batch = g.collate([processed])
    assert batch["target"].shape[0] == 1


def test_patch_embed_matches_strided_conv():
    """PatchEmbed (space-to-depth + matmul — the TPU lowering) must be a
    bit-for-param drop-in for nn.Conv(E, (p,p), strides=(p,p), VALID)."""
    import flax.linen as nn

    from ofasys_tpu.adaptor.image import PatchEmbed

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3), jnp.float32)
    pe = PatchEmbed(32, 16, dtype=jnp.float32)
    conv = nn.Conv(32, (16, 16), strides=(16, 16), padding="VALID",
                   dtype=jnp.float32, param_dtype=jnp.float32)
    params = conv.init(jax.random.PRNGKey(1), x)   # conv params drive both
    assert jax.tree.map(lambda a: a.shape, pe.init(jax.random.PRNGKey(1), x)) == \
        jax.tree.map(lambda a: a.shape, params)
    np.testing.assert_allclose(
        np.asarray(pe.apply(params, x)), np.asarray(conv.apply(params, x)),
        rtol=1e-5, atol=1e-5,
    )
