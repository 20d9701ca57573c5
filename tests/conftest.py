"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), standing in for real TPU
chips; the driver separately dry-run-compiles the multi-chip path.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin overrides JAX_PLATFORMS at registration time, so the
# env var alone is not enough — force the CPU platform via the config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
