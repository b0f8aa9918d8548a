import os

# Tests run on a virtual 8-device CPU mesh so that the multi-chip sharding
# paths compile and execute without TPU hardware. jax may already be imported
# (sitecustomize), so use jax.config in addition to env vars — both must
# happen before the first backend initialization.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(42)
