"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on host platform devices (the JAX-native
way to test meshes without a TPU pod); the driver separately dry-runs the
multi-chip path via ``__graft_entry__.dryrun_multichip``.
"""

import os

# Force CPU even when the outer environment selects the TPU platform
# (tests must run on the virtual 8-device mesh, not through the tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon site hook overrides JAX_PLATFORMS at import; force cpu here.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: UNet/VGG compiles dominate suite runtime.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
