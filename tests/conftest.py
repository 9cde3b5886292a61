"""Test harness: force an 8-device virtual CPU platform BEFORE jax import.

Tests run everywhere (no TPU needed); Pallas kernels run in interpreter mode
on CPU (selected automatically by backend detection in rasterize_pallas).
"""

import os

# NOTE: the axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# programmatically, so env vars alone do NOT keep tests off the (single,
# tunneled, slow-to-compile) TPU — we must override the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
