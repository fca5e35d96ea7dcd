"""Device-resident image replay buffer (SURVEY.md §2 "Image replay buffer").

The classic CycleGAN trick: the discriminator trains on a 50/50 mix of fresh
fakes and fakes drawn from a pool of 50 historical ones, which stabilizes D.

TPU-native design — functional carried state inside the jitted train step
(SURVEY.md §7 "GAN training dynamics"): the pool is an explicit
(pool_size, H, W, C) array + fill counter threaded through ``query``. Under
data parallelism each shard owns its own pool slots and swaps only with
locally produced fakes (zero collectives on this path; the global pool is the
concatenation of the per-shard pools, sharded on axis 0 —
uig.runtime.pool_sharding).

Vectorization note: the classic implementation loops over the batch and
serializes swaps; here all batch elements decide independently (random slot +
bernoulli each) and duplicate-slot writes resolve by scatter order. This is
statistically equivalent and keeps the op a single gather + scatter.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PoolState(NamedTuple):
    buffer: jax.Array  # (S, H, W, C)
    count: jax.Array  # () int32, number of valid slots


class ImagePool:
    def __init__(self, pool_size: int = 50):
        self.pool_size = pool_size

    def init(self, image_shape: tuple[int, int, int],
             dtype=jnp.float32) -> PoolState:
        s = self.pool_size
        return PoolState(
            buffer=jnp.zeros((s,) + tuple(image_shape), dtype),
            count=jnp.zeros((), jnp.int32),
        )

    def query(self, state: PoolState, fakes: jax.Array,
              key: jax.Array) -> tuple[PoolState, jax.Array]:
        """Push a batch of fakes; return (new_state, images for D).

        Per element: while warming up, append and return the fresh fake; once
        full, with p=0.5 return a random historical fake (replacing it with
        the fresh one), else return the fresh fake untouched.
        """
        if self.pool_size <= 0:
            return state, fakes
        s = self.pool_size
        b = fakes.shape[0]
        buffer, count = state
        fakes = jax.lax.stop_gradient(fakes.astype(buffer.dtype))

        k_idx, k_use = jax.random.split(key)
        # sample only from FILLED slots: when a batch straddles the warmup
        # boundary, indices beyond `count` would read never-written zeros
        # and feed black images to D
        rand_idx = jax.random.randint(k_idx, (b,), 0, jnp.maximum(count, 1))
        use_pool = jax.random.bernoulli(k_use, 0.5, (b,))

        slot = count + jnp.arange(b, dtype=jnp.int32)  # warmup append slots
        in_warmup = slot < s

        pool_read = buffer[rand_idx]  # (B, H, W, C) gather
        out = jnp.where(
            (in_warmup | ~use_pool)[:, None, None, None], fakes, pool_read
        )

        write = in_warmup | use_pool
        tgt = jnp.where(in_warmup, slot, rand_idx)
        tgt = jnp.where(write, tgt, s)  # out-of-range => dropped by scatter
        new_buffer = buffer.at[tgt].set(fakes, mode="drop")
        new_count = jnp.minimum(count + b, s).astype(jnp.int32)
        return PoolState(new_buffer, new_count), out
