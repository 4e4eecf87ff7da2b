"""image_gen vertical: text -> VQGAN code tokens, trained with the
image_vqgan decoder adaptor and decoded back to an image with the
constraint range."""

import dataclasses

import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def test_image_gen_end_to_end():
    # tiny VQGAN raster: 32px / 8 = 4x4 = 16 codes per image
    pcfg = ConfigStore().get("ofasys.preprocess", "image_vqgan").config
    pcfg.code_image_size = 32
    acfg = ConfigStore().get("ofasys.adaptor", "image_vqgan").config
    acfg.code_image_size = 32

    rng = np.random.default_rng(0)
    recs = [{"cap": ["a red square", "a blue circle"][i % 2],
             "code": (rng.random((32, 32, 3)) * 255).astype(np.float32)} for i in range(8)]

    task = Task(name="image_gen", instruction="what is the image of [TEXT:cap]? -> "
                "[IMAGE:code,preprocess=image_vqgan,adaptor=image_vqgan]")
    task.cfg.dataset.batch_size = 8
    task.add_dataset(recs, "train")

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    trainer = Trainer(cfg)
    trainer.fit(model, [task], max_update=4)
    assert np.isfinite(trainer.meters["image_gen:loss"].avg)
    assert "image_vqgan" in model.net.active_adaptors

    # constrained generation: only <code> tokens may be produced
    pre = task.general_preprocess.name2pre["image_vqgan"]
    task.cfg.generation.beam = 1
    task.cfg.generation.max_len_b = 16
    task.cfg.generation.min_len = 16
    task.cfg.generation.constraint_range = pre.constraint_range
    it = task.get_batch_iterator("train", fresh=True)
    batch = next(it.next_epoch_itr(shuffle=False))
    outs = task.inference(model, trainer.state.params, batch)
    toks = outs[0][0].tokens[:-1]  # strip eos
    assert (toks >= pre.code_start).all() and (toks < pre.code_end).all()
    # postprocess decoded an image
    assert outs[0][0].image is not None
    assert outs[0][0].image.shape == (32, 32, 3)


def test_image_gen_rerank_best_of_n():
    """Best-of-N: N sampled candidates decode in one batched VQGAN pass and
    return best-first under a pluggable scorer (reference
    task/image_gen.py:15-75, image_code.py:202-214 rerank_with_clip;
    hermetic proxy scorer here — CLIP resolves via $OFA_CLIP_PATH in prod)."""
    from ofasys_tpu.configure import ConfigStore
    from ofasys_tpu.task.tasks import ImageGenTask

    pcfg = ConfigStore().get("ofasys.preprocess", "image_vqgan").config
    pcfg.code_image_size = 32
    acfg = ConfigStore().get("ofasys.adaptor", "image_vqgan").config
    acfg.code_image_size = 32

    rng = np.random.default_rng(0)
    recs = [{"cap": "a red square",
             "code": (rng.random((32, 32, 3)) * 255).astype(np.float32)}
            for _ in range(8)]
    task = ImageGenTask(name="image_gen")
    task.cfg.dataset.batch_size = 8
    task.cfg.generation.max_len_b = 16
    task.cfg.generation.min_len = 16
    task.cfg.generation.return_n_best = 3
    task.add_dataset(recs, "train")

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 1
    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    trainer = Trainer(cfg)
    trainer.fit(model, [task], max_update=2)

    pre = task.general_preprocess.name2pre["image_vqgan"]
    # hermetic scorer: brightness of the decoded image (deterministic,
    # distinguishes candidates) — stands in for CLIP text-image similarity
    calls = []
    def scorer(images, text):
        calls.append((images.shape, text))
        return images.reshape(images.shape[0], -1).mean(axis=1)
    pre.rerank_scorer = scorer

    it = task.get_batch_iterator("train", fresh=True)
    batch = next(it.next_epoch_itr(shuffle=False))
    outs = task.inference(model, trainer.state.params, batch)

    assert len(outs[0]) == 3                       # N candidates returned
    assert calls and calls[0][0][0] == 3           # scorer saw the stack
    assert "red square" in calls[0][1]             # query text recovered
    for hyps in outs:
        scores = [h.extra["rerank_score"] for h in hyps]
        assert scores == sorted(scores, reverse=True)   # best-first
        for h in hyps:
            assert h.image is not None and h.image.shape == (32, 32, 3)
            toks = h.tokens[:-1]
            pre_ = pre
            assert (toks >= pre_.code_start).all() and (toks < pre_.code_end).all()
