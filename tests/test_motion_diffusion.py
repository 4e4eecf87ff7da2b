"""Diffusion + motion vertical: BVH round-trip, diffusion math, text-to-motion
task training + DDIM sampling."""

import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig
from ofasys_tpu.utils.motion_utils import (
    bvh_to_features,
    euler_to_rotmat,
    features_to_bvh,
    forward_kinematics,
    parse_bvh,
    rot6d_to_rotmat,
    rotmat_to_euler,
    rotmat_to_rot6d,
    save_bvh,
)

BVH = """HIERARCHY
ROOT Hips
{
  OFFSET 0 0 0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Spine
  {
    OFFSET 0 10 0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0 5 0
    }
  }
}
MOTION
Frames: 3
Frame Time: 0.033333
0 90 0 10 5 -3 20 0 10
1 91 0 12 4 -2 18 1 9
2 92 0 14 3 -1 16 2 8
"""


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def test_rotation_roundtrips():
    rng = np.random.default_rng(0)
    ang = rng.uniform(-60, 60, (10, 3))
    for order in ("ZXY", "ZYX", "XYZ"):
        R = euler_to_rotmat(ang, order)
        # orthonormality
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                                   np.broadcast_to(np.eye(3), R.shape), atol=1e-10)
        ang2 = rotmat_to_euler(R, order)
        R2 = euler_to_rotmat(ang2, order)
        np.testing.assert_allclose(R, R2, atol=1e-8)
    R = euler_to_rotmat(ang, "ZXY")
    d6 = rotmat_to_rot6d(R)
    np.testing.assert_allclose(rot6d_to_rotmat(d6), R, atol=1e-8)


def test_bvh_parse_features_roundtrip():
    header, frames = parse_bvh(BVH)
    assert header.num_joints == 2
    assert frames.shape == (3, 9)
    feats = bvh_to_features(header, frames)
    assert feats.shape == (3, 3 + 2 * 6)
    # root positions preserved
    np.testing.assert_allclose(feats[:, :3], frames[:, :3])
    frames2 = features_to_bvh(header, feats)
    np.testing.assert_allclose(frames2, frames, atol=1e-5)
    text = save_bvh(header, frames2)
    header3, frames3 = parse_bvh(text)
    np.testing.assert_allclose(frames3, frames, atol=1e-4)
    pos = forward_kinematics(header, feats)
    assert pos.shape == (3, 2, 3)


def test_diffusion_qsample_and_ddim():
    import jax
    import jax.numpy as jnp

    from ofasys_tpu.model.diffusion import GaussianDiffusion

    gd = GaussianDiffusion(num_steps=100, schedule="cosine")
    x0 = jnp.ones((2, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(0), x0.shape)
    # t=0: nearly x0; t=99: nearly noise
    x_early = gd.q_sample(x0, jnp.zeros((2,), jnp.int32), noise)
    x_late = gd.q_sample(x0, jnp.full((2,), 99, jnp.int32), noise)
    assert float(jnp.abs(x_early - x0).mean()) < 0.3
    assert float(jnp.abs(x_late - noise).mean()) < 0.3
    # perfect denoiser recovers x0 via DDIM
    denoise = lambda x_t, t: (x_t - jnp.sqrt(1 - gd._alphas_bar[t]).reshape(-1, 1, 1) * noise) \
        / jnp.sqrt(gd._alphas_bar[t]).reshape(-1, 1, 1) * 0 + noise
    out = gd.ddim_sample(denoise, x0.shape, jax.random.PRNGKey(1), num_inference_steps=10)
    assert np.isfinite(np.asarray(out)).all()


def test_text_to_motion_task():
    rng = np.random.default_rng(0)
    ConfigStore().get("ofasys.preprocess", "motion_6d").config.window_size = 8
    ConfigStore().get("ofasys.adaptor", "motion_6d").config.feature_dim = 15
    recs = [{"text": ["walk", "run"][i % 2],
             "bvh": rng.standard_normal((12, 15)).astype(np.float32)} for i in range(16)]
    task = Task(
        name="t2m",
        instruction="motion of [TEXT:text] -> [MOTION:bvh,preprocess=motion_6d,adaptor=motion_6d]",
        criterion="diffusion_criterion",
    )
    task.cfg.dataset.batch_size = 8
    task.add_dataset(recs, "train")
    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    trainer = Trainer(cfg)
    trainer.fit(model, [task], max_update=6)
    assert np.isfinite(trainer.meters["t2m:loss"].avg)
    assert "motion_6d" in model.net.active_adaptors

    # DDIM sampling end-to-end
    from ofasys_tpu.generator import DiffusionGenerator

    it = task.get_batch_iterator("train", fresh=True)
    batch = next(it.next_epoch_itr(shuffle=False))
    gen = DiffusionGenerator(model, num_steps=100, num_inference_steps=5)
    outs = gen.generate(trainer.state.params, batch)
    assert len(outs) == 8
    assert outs[0].feature.shape == (8, 15)
    assert np.isfinite(outs[0].feature).all()
