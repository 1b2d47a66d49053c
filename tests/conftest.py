"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host platform devices (the JAX-native
way to test meshes without a TPU pod); the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compile cache: UNet/VGG compiles dominate suite runtime.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
