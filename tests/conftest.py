"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the multi-chip test strategy from SURVEY §4(e): fake an 8-device mesh
with XLA's host-platform device-count flag so sharding/collective code is
exercised without TPU hardware. The hosting image pre-registers a TPU PJRT
plugin from sitecustomize, so env-var overrides alone don't stick —
``jax.config.update('jax_platforms', 'cpu')`` after import does.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Numerical-parity tests compare against torch/scipy oracles in float32;
# force full-precision matmuls/convs under test (production keeps the fast
# TPU defaults).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.key(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
