"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Multi-chip sharding logic (parallel/, ba/ sharded solves) is exercised on a
virtual 8-device CPU platform so the suite runs anywhere; the real TPU path is
covered by bench.py and __graft_entry__.py.

Note: this environment's sitecustomize imports jax and registers a remote-TPU
("axon") backend before pytest starts, so setting JAX_PLATFORMS in os.environ
here is too late — we must go through jax.config, which takes effect at first
backend use.
"""

import os

# XLA reads XLA_FLAGS when the CPU client is created (lazily), so this one can
# still be set via the environment.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(123456789)
