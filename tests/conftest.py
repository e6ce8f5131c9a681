"""Test configuration.

All tests run on CPU with 8 virtual XLA devices (multi-chip sharding tests
without hardware, SURVEY.md §4) and float64 enabled — the verification
precision mode that backs the 1e-6 oracle-agreement bar (SURVEY.md §7
"Numerics"). TPU benchmarking is separate (bench.py).

NOTE on this machine's TPU tunnel: the axon sitecustomize registers the TPU
backend at interpreter start and *overrides* the JAX_PLATFORMS env var, so we
must force CPU via jax.config after import (env vars alone are ignored).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
