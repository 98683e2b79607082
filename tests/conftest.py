"""Test config: force the CPU backend with 8 virtual devices so
sharding/pjit tests run the standard JAX fake-backend trick
(SURVEY.md section 4 item 4).

The session environment pre-sets JAX_PLATFORMS=axon (one real TPU chip via
a tunnel) and a sitecustomize imports jax at interpreter start, so env vars
are too late here — use jax.config.update, which works any time before the
backend is first used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
