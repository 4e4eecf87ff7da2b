"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding (dp/fsdp/tp/sp/ep) is validated on fake CPU devices
because only one real TPU chip is available in CI; the same Mesh code runs
unchanged on a real slice.
"""

import os
import sys

# Force-override: the ambient environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel) and the plugin wins over the env var — jax.config.update is the
# only reliable override. Must happen before any backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Fast tier: `pytest -m "not slow"` finishes in a few minutes for quick
# iteration; the full suite (with the heavy small-model-training fixtures
# below) takes >1h and remains the round gate. Marked at file granularity
# because the cost is usually a session fixture that trains a model — any
# test in the file pays it. Measured with --durations=0; a file lands here
# when its aggregate call+setup time exceeds ~80s on a contended CPU box.
SLOW_FILES = {
    "test_audio_vertical.py",
    "test_checkpoint_surgery.py",
    "test_fuse_qkv.py",
    "test_generator.py",
    "test_image_gen.py",
    "test_image_vertical.py",
    "test_launch_and_hub.py",
    "test_moe_ring.py",
    "test_motion_diffusion.py",
    "test_multihost.py",
    "test_multitask_sum.py",
    "test_pallas_attention.py",
    "test_parallel.py",
    "test_pipeline.py",
    "test_quant.py",
    "test_quant_training.py",
    "test_reference_parity.py",
    "test_scan_remat.py",
    "test_scst_ema_misc.py",
    "test_sharded_checkpoint.py",
    "test_sharded_decode.py",
    "test_speculative.py",
    "test_speech_pretrain.py",
    "test_task_zoo.py",
    "test_train_step.py",
    "test_trainer_fit.py",
    "test_trainer_flags.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_FILES:
            item.add_marker(pytest.mark.slow)
