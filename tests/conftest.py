"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip sharding logic is validated the standard JAX way — on virtual CPU
devices — since tests must run without a pod (SURVEY.md §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
from dpe_mvs_tpu.utils import jaxconfig  # noqa: E402
jaxconfig.setup()
import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon at interpreter startup; the env var
# alone does not stick, so force the CPU platform through the config.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
