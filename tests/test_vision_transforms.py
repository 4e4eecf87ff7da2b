"""Joint image+box transforms + RandAugment (reference utils/transforms.py,
utils/vision_helper.py:332)."""

import numpy as np
import pytest

from ofasys_tpu.utils import transforms as T
from ofasys_tpu.utils.vision_helper import OPS, RandAugment


def _img(h=100, w=80):
    rng = np.random.default_rng(0)
    return (rng.random((h, w, 3)) * 255).astype(np.float32)


def test_resize_scales_boxes():
    img = _img(100, 80)
    boxes = np.asarray([[8.0, 10.0, 40.0, 50.0]], np.float32)
    out, b = T.resize(img, boxes, 40)  # short side 80 -> 40, scale 0.5
    assert out.shape[:2] == (50, 40)
    np.testing.assert_allclose(b[0], [4, 5, 20, 25], atol=0.5)


def test_hflip_mirrors_boxes():
    img = _img(10, 100)
    boxes = np.asarray([[10.0, 2.0, 30.0, 8.0]], np.float32)
    out, b = T.hflip(img, boxes)
    np.testing.assert_allclose(b[0], [70, 2, 90, 8])
    np.testing.assert_array_equal(out, img[:, ::-1])


def test_crop_translates_and_clips():
    img = _img(100, 100)
    boxes = np.asarray([[10.0, 10.0, 60.0, 60.0]], np.float32)
    out, b = T.crop(img, boxes, (20, 20, 50, 50), drop_empty=False)
    assert out.shape[:2] == (50, 50)
    np.testing.assert_allclose(b[0], [0, 0, 40, 40])


def test_object_center_crop_keeps_box():
    img = _img(200, 200)
    boxes = np.asarray([[150.0, 150.0, 190.0, 190.0]], np.float32)
    out, b = T.object_center_crop(img, boxes, 100)
    assert out.shape[:2] == (100, 100)
    x0, y0, x1, y1 = b[0]
    # the referred object stays fully inside the crop
    assert 0 <= x0 < x1 <= 100 and 0 <= y0 < y1 <= 100
    assert (x1 - x0) == 40 and (y1 - y0) == 40


def test_large_scale_jitter_output_size():
    lsj = T.LargeScaleJitter(output_size=64, rng=np.random.default_rng(0))
    for _ in range(5):
        out, b = lsj(_img(), np.asarray([[5.0, 5.0, 20.0, 20.0]], np.float32))
        assert out.shape[:2] == (64, 64)


def test_rand_augment_all_ops_valid():
    img = _img(32, 32)
    for name, op in OPS.items():
        out = op(img.copy(), 15)
        assert out.shape == img.shape, name
        assert np.isfinite(out).all(), name
    ra = RandAugment(2, 9, rng=np.random.default_rng(0))
    out = ra(img.copy())
    assert out.shape == img.shape


def test_box_instruction_map_joint_transform():
    from ofasys_tpu.configure import ConfigStore
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.general import GeneralPreprocess
    from ofasys_tpu.preprocessor.instruction import Instruction

    try:
        d = Dictionary()
        # configure BEFORE construction: each GeneralPreprocess deep-copies
        # the store configs (post-hoc store mutation no longer leaks in)
        ConfigStore().get("ofasys.preprocess", "image").config.patch_image_size = 32
        g = GeneralPreprocess(d, active=["text", "image", "box"])
        rng = np.random.default_rng(0)
        img = (rng.random((64, 64, 3)) * 255).astype(np.float32)
        ist = Instruction(
            '[IMAGE:img] which region does " [TEXT:txt] " describe? -> [BOX:box]',
            split="train",
        ).format(img=img, txt="the ball", box=[0.25, 0.25, 0.75, 0.75])
        processed = g(ist)
        assert processed is not None
        # image slot went through the joint pipeline and the image preproc
        from ofasys_tpu import ModalityType

        img_slot = [s for s in processed.slots if s.modality == ModalityType.IMAGE][0]
        assert img_slot.value["inputs"].shape == (32, 32, 3)
        # the target box tokens exist and decode to a valid box
        bp = g.name2pre["box"]
        tgt = [s for s in processed.slots if not s.is_src][-1]
        toks = np.asarray(tgt.value["target"])
        bins = [t for t in toks if bp.bin_start <= t < bp.bin_end]
        assert len(bins) == 4
        box = bp.decode(np.asarray(bins))
        assert (box >= 0).all() and (box <= 1).all()
        assert box[2] > box[0] and box[3] > box[1]
    finally:
        ConfigStore().reset()
