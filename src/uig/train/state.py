"""Train-state pytrees and the optimizer factory (SURVEY.md §2 "CycleGAN trainer").

The full training state (2 generators + 2 discriminators + both Adam states +
EMA + replay pools + PRNG + step) is one pytree so that:
  * the whole step donates its input buffers (``donate_argnums=0``) and the
    2G+2D+opt+EMA+pool set fits HBM at 256²/512² (SURVEY.md §7),
  * orbax checkpoints it wholesale and resume is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct

from uig.config import OptConfig
from uig.train.pool import PoolState


class CycleGANState(struct.PyTreeNode):
    g_params: dict  # {"a2b": params, "b2a": params}
    d_params: dict  # {"a": params, "b": params}
    g_opt: optax.OptState
    d_opt: optax.OptState
    ema: dict  # {"a2b": params, "b2a": params}
    pool_a: PoolState  # historical fake-A images (feed D_A)
    pool_b: PoolState  # historical fake-B images (feed D_B)
    rng: jax.Array  # base key; per-step keys derive via fold_step
    step: jax.Array  # () int32
    # ADA augmentation probability (train/ada.py); () f32, carried so the
    # controller update is part of the one compiled step and resume is exact
    ada_p: jax.Array = None


def lr_schedule(opt: OptConfig, lr_scale: float = 1.0):
    """Learning-rate schedule shared by every trainer (opt.lr_decay):

      linear   — flat until ``decay_start_step``, then linear to 0 at
                 ``total_steps`` (the canonical CycleGAN schedule)
      cosine   — flat until ``decay_start_step``, then half-cosine to 0 at
                 ``total_steps``
      constant — flat for the whole run

    ``opt.warmup_steps > 0`` composes a linear ramp 0→lr over the first
    warmup steps with any of the above. ``lr_scale`` implements
    opt.d_lr_ratio / f_lr_ratio (TTUR-style per-network learning rates).
    """
    decay_steps = max(opt.total_steps - opt.decay_start_step, 1)
    kind = opt.lr_decay
    if kind not in ("linear", "cosine", "constant"):
        raise ValueError(
            f"opt.lr_decay must be linear|cosine|constant, got {kind!r}")
    if opt.warmup_steps < 0:
        raise ValueError(f"opt.warmup_steps must be >= 0, got {opt.warmup_steps}")

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip((step - opt.decay_start_step) / decay_steps, 0.0, 1.0)
        if kind == "linear":
            decay = 1.0 - frac
        elif kind == "cosine":
            decay = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        else:
            decay = 1.0
        lr = opt.lr * lr_scale * decay
        if opt.warmup_steps > 0:
            lr = lr * jnp.clip((step + 1.0) / opt.warmup_steps, 0.0, 1.0)
        return lr

    return schedule


def make_optimizer(opt: OptConfig,
                   lr_scale: float = 1.0) -> optax.GradientTransformation:
    sched = lr_schedule(opt, lr_scale)
    chain = []
    if opt.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(opt.grad_clip))
    if opt.optimizer == "adam":
        chain.append(
            optax.adamw(sched, b1=opt.b1, b2=opt.b2, eps=opt.eps,
                        weight_decay=opt.weight_decay)
            if opt.weight_decay > 0
            else optax.adam(sched, b1=opt.b1, b2=opt.b2, eps=opt.eps)
        )
    elif opt.optimizer == "sgd":
        chain.append(optax.sgd(sched))
    else:
        raise ValueError(f"unknown optimizer {opt.optimizer!r}")
    return optax.chain(*chain)
