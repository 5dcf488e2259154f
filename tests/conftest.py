"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that kernel logic and multi-chip
sharding are unit-testable on any host (the standard JAX trick the reference
never needed; see SURVEY.md §4).  Pallas kernels automatically run in
interpreter mode on CPU via ``nf4_tpu.utils.env``.

Set ``NF4TPU_TEST_TPU=1`` to run the suite against the real attached TPU
instead (single chip; sharding tests will skip if fewer than 8 devices).
"""

import os

if os.environ.get("NF4TPU_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    # Some hosted TPU plugins (e.g. the 'axon' tunnel) override JAX_PLATFORMS
    # at registration time; jax.config after import is authoritative.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
