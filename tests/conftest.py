"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The environment's sitecustomize imports jax and registers the TPU platform at
interpreter startup, so env-var overrides are too late — the platform must be
switched via jax.config. XLA_FLAGS is still read lazily at first backend init,
so the host-device-count flag works from here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--regen-golden", action="store_true", default=False,
        help="re-record tests/golden_outputs.json (intentional numerics change)",
    )


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(42)
