"""Test env: force CPU with 8 fake devices (SURVEY.md §4 "Distributed tests
without a cluster"). All tests run on CPU; kernel parity on the real TPU chip
is exercised by bench.py / scripts/, not CI.

Note: this environment's sitecustomize pre-registers the axon TPU backend and
pins JAX_PLATFORMS=axon, so we must both extend XLA_FLAGS *and* flip the
platform via jax.config (env-var edits alone are too late)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from uig.runtime import make_mesh

    return make_mesh(8)


@pytest.fixture(scope="session")
def mesh1():
    from uig.runtime import make_mesh

    return make_mesh(1)
