"""Device mesh + sharding helpers — the L1 runtime layer (SURVEY.md §1 L1).

The reference repo has zero parallelism code (it is an empty stub,
/root/reference/README.md:1); the TPU-native design here is the one
BASELINE.json's north star requires: a 1-D ``data`` mesh axis for
data-parallel training, batch sharded over it, gradients reduced with
``pmean`` over ICI inside the single jitted train step (DCN across hosts in
multi-host DP — XLA routes the collective, no NCCL/MPI equivalent needed).

All sharded entry points in uig take a ``Mesh`` built here; tests exercise
the same code on a fake 8-device CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=8``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices (0 = all).

    Multi-host: ``jax.devices()`` already enumerates the global device set
    after ``jax.distributed.initialize``; the mesh is global, and per-host
    input sharding is handled by the data pipeline (each process feeds its
    addressable shard — see uig/data/pipeline.py).
    """
    devices = jax.devices()
    if num_devices:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} present"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def maybe_init_multihost(enabled: bool) -> None:
    """Initialize the JAX distributed runtime (DCN coordination) if requested.

    Ordering matters: ``jax.distributed.initialize()`` must run BEFORE the
    XLA backend is touched (any ``jax.devices()`` / ``jax.process_count()``
    call initializes it, after which distributed init is impossible and a
    multi-host launch would silently degrade into N independent single-host
    trainings). We therefore check distributed state directly — never via
    ``jax.process_count()`` — and fail loudly on a mis-ordered call.
    """
    if not enabled:
        return
    if jax.distributed.is_initialized():
        return  # launcher (or a previous fit()) already initialized
    from jax._src import xla_bridge

    if xla_bridge.backends_are_initialized():
        raise RuntimeError(
            "parallel.multihost=True, but the XLA backend was already "
            "initialized before jax.distributed.initialize() could run "
            "(some code touched jax.devices()/process_count() first). "
            "Call maybe_init_multihost() before any other JAX use, or "
            "initialize jax.distributed in your launcher."
        )
    try:
        jax.distributed.initialize()
    except ValueError as e:
        # No coordinator address and no auto-detectable cluster environment:
        # this is a plain single-process run of a multihost-enabled preset.
        # That is fine for development — but say so, loudly, instead of
        # letting a misconfigured pod launch degrade silently.
        if "coordinator_address" not in str(e):
            raise
        import warnings

        warnings.warn(
            "parallel.multihost=True but no distributed coordinator was "
            "found (no JAX_COORDINATOR_ADDRESS / cluster env); continuing "
            "single-process. If this is a pod launch, the launcher is "
            "misconfigured.",
            RuntimeWarning,
            stacklevel=2,
        )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def pool_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Replay-buffer sharding: pool slots live with their data shard.

    The image replay pool (SURVEY.md §2 "Image replay buffer") is kept
    *per-shard*: each device owns ``pool_size`` slots and swaps only with
    locally produced fakes — zero collectives on the pool path. Represented
    globally as an array of shape (ndev * pool_size, H, W, C) sharded on
    axis 0.
    """
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place a host batch (numpy / jax arrays, leading batch dim) on the mesh.

    Single-host: a straight ``device_put`` with leading-axis sharding.
    Multi-host: each process passes its *local* shard; we assemble the global
    array from per-host local data.
    """
    sharding = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        local = np.asarray(x)
        global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
        return jax.make_array_from_process_local_data(sharding, local, global_shape)

    return jax.tree_util.tree_map(put, batch)


def host_local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n
