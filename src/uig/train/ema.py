"""Exponential moving average of generator params (SURVEY.md §2 "EMA").

EMA params are the serving/eval artifact (BASELINE.json: "EMA generator
weights ... match the reference's output fidelity bit-for-bit in eval
mode"). Kept in fp32; updated inside the jitted train step so the whole
G-update (grads → adam → ema) is one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def swap_ema(state):
    """Swap live generator params with their EMA shadows (pytree-level).

    Use around an eval window when you want the *optimizer* to keep training
    from the live weights but run eval through EMA without copying state:
    ``state = swap_ema(state); ...eval...; state = swap_ema(state)``.
    Works for any trainer state exposing ``g_params``/``ema``.
    """
    ema = state.ema
    if set(ema.keys()) == {"a2b", "b2a"}:  # CycleGAN: ema mirrors g_params
        return state.replace(g_params=ema, ema=state.g_params)
    # single-G trainers keep ema under {"a2b": gen} while g_params nests it
    raise NotImplementedError(
        "swap_ema supports CycleGAN states; single-G trainers eval via "
        "trainer.translate(state.ema, ...) which needs no swap")


def ema_update(ema_params, new_params, decay: float):
    """ema ← decay·ema + (1−decay)·new, elementwise over the pytree."""
    d = jnp.float32(decay)
    return jax.tree_util.tree_map(
        lambda e, p: (d * e.astype(jnp.float32)
                      + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params,
        new_params,
    )
