"""Functional PRNG plumbing.

All randomness in uig is explicit: the train state carries one key; every
step derives per-purpose subkeys with ``fold_step`` + ``split_named``. No
hidden RNG state anywhere (this is also the JAX-level 'race detector' story —
SURVEY.md §5: explicit functional PRNG threading instead of TSAN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_step(key: jax.Array, step: jax.Array | int) -> jax.Array:
    """Derive the per-step key; stable across resume (depends only on step)."""
    return jax.random.fold_in(key, jnp.asarray(step, jnp.uint32))


def split_named(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    """Split a key into a dict of named subkeys (order-stable)."""
    keys = jax.random.split(key, len(names))
    return {n: k for n, k in zip(names, keys)}
