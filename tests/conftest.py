"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths are
exercised without TPU hardware (the analog of the reference requiring a real
GPU for its gtest suite, ``msb/tests/main.cu:20-34`` — we deliberately do
better and keep tests hardware-independent).

Environment must be set before the first ``import jax`` anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the TPU plugin and forces the
# platform programmatically; force tests back onto CPU regardless.
jax.config.update("jax_platforms", "cpu")

# 64-bit key dtypes are accepted at the API boundary (then decomposed to
# uint32 planes internally); tests need x64 to build those inputs.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
