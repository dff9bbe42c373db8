"""Test harness: force a CPU-simulated 8-device mesh (SURVEY.md §4).

Multi-device behavior (halo exchange, replica swaps, psum moments) is tested
without TPU hardware by spoofing 8 host devices, exactly as the reference's CI
would (there is no reference distributed test to port — the capability is new).
Set TSU_TEST_TPU=1 to run the suite on real TPU devices instead.
"""

import os

if not os.environ.get("TSU_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # Must beat any site-level platform override (e.g. TPU plugin env):
    # jax.config wins over JAX_PLATFORMS set by the environment.
    import jax

    jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
