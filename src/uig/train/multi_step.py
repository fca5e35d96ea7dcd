"""k-steps-per-dispatch: scan the per-device train step inside ONE jitted
XLA program (``run.steps_per_dispatch``).

Why: every train_step dispatch pays a host→device launch. At 256² the step
is hundreds of ms and async dispatch pipelining hides the launch entirely;
at small resolutions (the 64² rungs) the device step is a few ms and the
host becomes the bottleneck — the classic TPU fix is to move the step LOOP
onto the device with ``lax.scan`` (one launch per k steps), which is also
the shape production JAX trainers use for pods where a dispatch crosses the
PCIe/gRPC boundary.

Semantics are IDENTICAL to k separate dispatches: the scanned body is the
same ``_device_step``, per-step PRNG keys derive from ``state.step`` (which
increments inside the carry), pools/EMA/optimizers advance in the carry,
and the returned metrics are the LAST step's (so a log at an aligned
boundary reads exactly what single-stepping would have logged). Verified
bit-level in tests/integration/test_multi_step.py.

Constraints (enforced loudly in loop.fit): log/ckpt/fid/sample cadences and
the profiler window must be multiples of k, so every host-visible boundary
falls between dispatches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def build_multi_step(trainer, k: int):
    """Return ``step_k(state, a_k, b_k) -> (state, last_metrics)`` where
    a_k/b_k are (k, B, H, W, C) batches (leading axis = scan steps, second
    axis sharded over the data mesh). Works for every trainer whose
    ``_device_step`` is (state, real_a, real_b); the VQGAN prior's frozen
    stage-1 params are threaded through automatically as a replicated
    argument."""
    if k < 2:
        raise ValueError(f"steps_per_dispatch must be >= 2, got {k}")
    axis = trainer.axis
    mesh = trainer.mesh
    has_extra = hasattr(trainer, "vqgan_params")

    abstract = jax.eval_shape(trainer._abstract_state, jax.random.PRNGKey(0))
    specs = trainer._specs_for(abstract)

    # metrics pytree structure (incl. names) from the already-built
    # single-step program — no per-trainer metric lists needed here
    cfg = trainer.cfg
    gb = cfg.data.batch_size
    load = cfg.data.load_size
    batch_struct = jax.ShapeDtypeStruct((gb, load, load, cfg.model.in_channels),
                                        jnp.uint8)
    if has_extra:
        _, metrics_struct = jax.eval_shape(
            trainer._train_step, abstract, trainer.vqgan_params,
            batch_struct, batch_struct)
    else:
        _, metrics_struct = jax.eval_shape(
            trainer._train_step, abstract, batch_struct, batch_struct)
    metric_specs = jax.tree_util.tree_map(lambda _: P(), metrics_struct)

    def device_multi(state, *args):
        *extra, a_k, b_k = args

        def body(s, ab):
            return trainer._device_step(s, *extra, ab[0], ab[1])

        state, ms = jax.lax.scan(body, state, (a_k, b_k))
        return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

    extra_specs = ()
    if has_extra:
        extra_specs = (jax.tree_util.tree_map(lambda _: P(),
                                              trainer.vqgan_params),)
    shmapped = jax.shard_map(
        device_multi, mesh=mesh,
        in_specs=(specs,) + extra_specs + (P(None, axis), P(None, axis)),
        out_specs=(specs, metric_specs), check_vma=False)
    jitted = jax.jit(shmapped, donate_argnums=(0,))
    stacked_sharding = NamedSharding(mesh, P(None, axis))

    def step_k(state, batches):
        """batches: list of k (real_a, real_b) pairs as yielded by the
        input pipeline (each (B, H, W, C), batch axis sharded)."""
        if len(batches) != k:
            raise ValueError(f"expected {k} batches, got {len(batches)}")
        a_k = jax.device_put(jnp.stack([p[0] for p in batches]),
                             stacked_sharding)
        b_k = jax.device_put(jnp.stack([p[1] for p in batches]),
                             stacked_sharding)
        if has_extra:
            return jitted(state, trainer.vqgan_params, a_k, b_k)
        return jitted(state, a_k, b_k)

    return step_k


def validate_dispatch_alignment(cfg, k: int | None = None) -> None:
    """Loud-failure check that every host-visible cadence is a multiple of
    the dispatch chunk (so boundaries fall between dispatches).  ``k``
    defaults to run.steps_per_dispatch; run.n_critic_fuse passes the
    trainer's n_critic instead."""
    if k is None:
        k = cfg.run.steps_per_dispatch
    if k <= 1:
        return
    cadences = {
        "run.log_every": cfg.run.log_every,
        "run.ckpt_every": cfg.run.ckpt_every,
        "eval.fid_every": cfg.eval.fid_every,
        "eval.sample_grid_every": cfg.eval.sample_grid_every,
        "run.profile_steps[0]": cfg.run.profile_steps[0],
        "run.profile_steps[1]": cfg.run.profile_steps[1],
    }
    bad = {n: v for n, v in cadences.items() if v and v % k}
    if bad:
        raise ValueError(
            f"dispatch chunk k={k} requires every cadence to be a "
            f"multiple of k; offending: {bad}")
