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

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
