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
# Shared persistent XLA compilation cache (same dir as dryrun_multichip):
# structurally identical tiny programs recur across test files and runs;
# warm re-runs skip backend compilation entirely (measured ~4x on the
# dryrun's CycleGAN family on this 1-core host).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # quiet AOT-loader logs

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from uig.runtime import make_mesh

    return make_mesh(8)


@pytest.fixture(scope="session")
def mesh1():
    from uig.runtime import make_mesh

    return make_mesh(1)
