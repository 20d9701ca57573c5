"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``), standing in for real TPU
chips; the driver separately dry-run-compiles the multi-chip path.

On-chip lane: ``UFR_TPU_TESTS=1`` skips the CPU forcing so the suite runs
on the real TPU backend — ``scripts/run_tpu_tests.sh`` uses this to run
the TPU-gated subset (the tests that skip themselves unless
``jax.default_backend() == "tpu"``) as a regression guard instead of
ad-hoc scripts.
"""

import os
import sys

_ON_CHIP = os.environ.get("UFR_TPU_TESTS", "") == "1"

if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _ON_CHIP:
    # The axon TPU plugin overrides JAX_PLATFORMS at registration time, so
    # the env var alone is not enough — force CPU via the config too.
    jax.config.update("jax_platforms", "cpu")
else:
    # persistent compile cache: repeat on-chip runs must not pay the
    # multi-minute remote compiles again
    from understanding_flow_robustness_tpu.utils import (  # noqa: E402
        enable_compilation_cache,
    )

    enable_compilation_cache()
