"""Test configuration: force an 8-device virtual CPU platform so sharding
and multi-chip code paths run without TPU hardware (SURVEY.md section 4.5).

Must set env vars before jax initializes, hence module-level code here.
"""

import os

# Force, don't setdefault: the environment ships JAX_PLATFORMS=axon (the
# TPU tunnel) and a sitecustomize that registers that backend; tests must
# run on the virtual 8-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize's axon register() overrides jax_platforms directly; win
# the override war by setting the config (takes precedence over env).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
