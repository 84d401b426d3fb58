"""Test configuration.

Forces JAX onto the host CPU backend with 8 virtual devices so that
multi-chip sharding (Mesh/shard_map) is exercised without TPU hardware.
Must run before jax initializes a backend, hence the env mutation at import
time of this conftest (pytest imports it first).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# A site-wide plugin may have force-registered a TPU backend before pytest
# imported this conftest (and ahead of the JAX_PLATFORMS env var). The config
# update below wins regardless of registration order, pinning tests to the
# 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
