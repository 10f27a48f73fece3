"""Test harness: force an 8-device virtual CPU mesh.

Mirrors the reference's trick of forcing CPU + torch fallbacks for CI
(/root/reference/tests/test_train.py:32-43); here the analog is a virtual
multi-device CPU platform so kernel and sharding tests run without burning
TPU time. NOTE: the axon TPU plugin in this image overwrites JAX_PLATFORMS
at `import jax` time, so we must force the platform via jax.config *after*
import; XLA_FLAGS still must be set *before*.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests compare against float64-ish oracles; keep matmuls at full precision.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
