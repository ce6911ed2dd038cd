"""Test environment: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere (the reference has no tests at
all — SURVEY.md §4; this is the fake-backend layer it lacks).
"""

import os
import sys

# Force CPU (the session presets JAX_PLATFORMS=axon for the real chip);
# set MAMIMO_TEST_PLATFORM to override (e.g. to run the suite on TPU).
os.environ["JAX_PLATFORMS"] = os.environ.get("MAMIMO_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The session's TPU plugin sitecustomize force-sets jax_platforms to
# "axon,cpu" on interpreter start; pin the test platform after import,
# before any backend is initialized.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

from mamimo_tpu.config import SimConfig, TrainConfig  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    """Full-size paper config (BS32)."""
    return SimConfig()


@pytest.fixture(scope="session")
def small_cfg():
    """Reduced config for fast CPU tests (Nt=8, Nr=2, 20 scatterers)."""
    return SimConfig(num_tx=8, num_rx=2, n_scatterers=20, n_rays=50)


@pytest.fixture(scope="session")
def tcfg():
    return TrainConfig(hidden=(64, 64), batch_size=16, epochs=3)
