"""Exponential moving average of generator params (SURVEY.md §2 "EMA").

EMA params are the serving/eval artifact (BASELINE.json: "EMA generator
weights ... match the reference's output fidelity bit-for-bit in eval
mode"). Kept in fp32; updated inside the jitted train step so the whole
G-update (grads → adam → ema) is one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, new_params, decay: float):
    """ema ← decay·ema + (1−decay)·new, elementwise over the pytree."""
    d = jnp.float32(decay)
    return jax.tree_util.tree_map(
        lambda e, p: (d * e.astype(jnp.float32)
                      + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params,
        new_params,
    )
