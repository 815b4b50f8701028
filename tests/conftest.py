"""Test configuration: run everything on a virtual 8-device CPU mesh so the
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4).

Something in this environment pre-selects the `axon` TPU platform regardless
of JAX_PLATFORMS, so the platform is forced through jax.config as well.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Never let tests touch the persistent compile cache: test_cli runs the
# CLI in-process, which would enable .jax_cache/ for the REST of the
# suite — and CPU executables AOT-compiled on an earlier host
# generation (mismatched machine features; the cpu_aot_loader warning)
# can miscompute, which surfaced as a flaky exact-equality failure in
# test_chunked_dense_entry_matches_oneshot (full-suite order only).
os.environ["SHINE_NO_COMPILE_CACHE"] = "1"
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
