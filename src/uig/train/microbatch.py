"""In-graph gradient accumulation (``opt.grad_accum``).

Capability spec: SURVEY.md §7 "Donation/aliasing for the big states" — the
memory levers for fitting 256²/512² GAN steps in HBM. ``model.remat`` trades
FLOPs for memory by recomputing activations; gradient accumulation trades
*latency inside one step* instead: the per-device batch is split into ``k``
microbatches whose forward/backward run sequentially under ``lax.scan``, so
peak activation memory scales with ``B_local/k`` while the optimizer still
sees the exact full-batch gradient. Unlike remat there is no recompute —
total FLOPs are unchanged — and unlike shrinking the batch the training
trajectory is IDENTICAL (all uig losses are batch means, and a mean of
per-microbatch mean-gradients equals the full-batch mean gradient; the only
difference is fp reassociation).

TPU-native shape: the whole accumulation is one ``lax.scan`` INSIDE the one
compiled step program — static shapes, no host round-trips, and the DP
``pmean`` still happens exactly once per step after accumulation.

Contract for ``loss_fn(params, microbatch, mb_index)``:
  * returns ``(loss, aux)`` where ``loss`` and every scalar aux leaf is a
    MEAN over the microbatch (true for every loss in uig.train.losses), and
  * every non-scalar aux leaf has the microbatch as its leading axis
    (they are re-assembled to full-batch arrays in order).
``mb_index`` is the scan position (an int32 tracer; 0 when k == 1) for
callers that need per-microbatch RNG streams (e.g. ADA augmentation draws).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import tree_util as jtu

from uig.config import Config


# trainers whose grads route through microbatch_value_and_grad
SUPPORTED_TRAINERS = ("CycleGANTrainer", "VQGANTrainer")


def validate_grad_accum(cfg: Config, trainer: str, supported: bool,
                        local_batch: int | None = None) -> int:
    """Loudly reject unsupported/invalid opt.grad_accum configs; returns k.

    Trainers that do not route their grads through
    ``microbatch_value_and_grad`` must call this with supported=False so a
    grad_accum>1 config fails at construction instead of silently training
    at full microbatch memory. Supporting trainers pass their actual
    per-device ``local_batch`` for the divisibility check.
    """
    k = cfg.opt.grad_accum
    if k < 1:
        raise ValueError(f"opt.grad_accum must be >= 1, got {k}")
    if k == 1:
        return k
    if not supported:
        raise ValueError(
            f"opt.grad_accum={k} is not supported by {trainer}; supported "
            f"trainers: {', '.join(SUPPORTED_TRAINERS)} "
            "(use model.remat for the others)")
    if local_batch is not None and local_batch % k:
        raise ValueError(
            f"per-device batch {local_batch} is not divisible by "
            f"opt.grad_accum={k}")
    return k


def microbatch_value_and_grad(loss_fn: Callable, params, inputs, k: int):
    """``jax.value_and_grad(loss_fn, has_aux=True)`` over ``k`` sequential
    microbatches; exact full-batch semantics (see module docstring).

    inputs: pytree of arrays sharing a leading batch axis divisible by k.
    Returns ``((loss, aux), grads)`` shaped exactly like the k == 1 call.
    """
    if k <= 1:
        return jax.value_and_grad(loss_fn, has_aux=True)(
            params, inputs, jnp.int32(0))

    def split(x):
        b = x.shape[0]
        if b % k:
            raise ValueError(
                f"batch axis {b} not divisible by grad_accum={k}")
        return x.reshape((k, b // k) + x.shape[1:])

    mb = jtu.tree_map(split, inputs)
    grads0 = jtu.tree_map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
    inv_k = 1.0 / k

    def body(carry, x):
        acc, loss_acc, i = carry
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x, i)
        acc = jtu.tree_map(
            lambda a, gi: a + jnp.asarray(gi, jnp.float32) * inv_k, acc, g)
        return (acc, loss_acc + loss * inv_k, i + 1), aux

    (grads, loss, _), auxs = jax.lax.scan(
        body, (grads0, jnp.float32(0.0), jnp.int32(0)), mb)
    grads = jtu.tree_map(lambda g, p: jnp.asarray(g, p.dtype), grads, params)

    def reassemble(a):
        # scalars were stacked to (k,) -> mean; microbatch tensors were
        # stacked to (k, B/k, ...) -> flatten back to (B, ...), original order
        if a.ndim <= 1:
            return a.mean(0)
        return a.reshape((-1,) + a.shape[2:])

    return (loss, jtu.tree_map(reassemble, auxs)), grads
