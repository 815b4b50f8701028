"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

Something in this environment pre-selects the `axon` TPU platform regardless
of JAX_PLATFORMS, so the platform is forced through jax.config as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
