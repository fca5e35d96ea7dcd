"""70×70 PatchGAN discriminator (SURVEY.md §2 "PatchGAN discriminator" row).

C64 → C128 → C256 → C512 → 1-channel logit map. 4×4 convs, stride 2 on the
first ``n_layers`` blocks then stride 1; instance norm on all but the first
block; LeakyReLU(0.2). Output is an (B, h', w', 1) logit map — the loss
averages over patches (uig/train/losses.py).

Reference repo has no discriminator (empty stub, /root/reference/README.md:1);
semantics oracle-tested vs a hand-written torch model in tests/unit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from uig.models.layers import InstanceNorm, PadConv


class PatchDiscriminator(nn.Module):
    base_features: int = 64
    n_layers: int = 3
    # "instance" (canonical CycleGAN D) | "none" (MUNIT's multi-scale D runs
    # without normalization; biases stay on in that case since there is no
    # following norm to absorb them)
    norm: str = "instance"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        # "none" drops normalization (MUNIT); any other value — including
        # "group", which is a generator-side knob — keeps the canonical
        # instance-norm PatchGAN
        normed = self.norm != "none"
        x = x.astype(dt)
        f = self.base_features
        x = PadConv(f, 4, stride=2, pad=1, pad_mode="zeros", dtype=dt)(x)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for i in range(1, self.n_layers):
            mult = min(2**i, 8)
            x = PadConv(f * mult, 4, stride=2, pad=1, pad_mode="zeros",
                        use_bias=not normed, dtype=dt)(x)
            if normed:
                x = InstanceNorm(dtype=dt)(x)
            x = nn.leaky_relu(x, 0.2)
        mult = min(2**self.n_layers, 8)
        x = PadConv(f * mult, 4, stride=1, pad=1, pad_mode="zeros",
                    use_bias=not normed, dtype=dt)(x)
        if normed:
            x = InstanceNorm(dtype=dt)(x)
        x = nn.leaky_relu(x, 0.2)
        x = PadConv(1, 4, stride=1, pad=1, pad_mode="zeros", dtype=dt)(x)
        if 0 in x.shape:
            raise ValueError(
                f"PatchDiscriminator produced an EMPTY logit map {x.shape} — "
                f"input spatial size is too small for n_layers={self.n_layers} "
                "(losses over an empty map are NaN); use a larger image or "
                "fewer layers")
        return x


class MultiScaleDiscriminator(nn.Module):
    """MUNIT/pix2pixHD-style multi-scale PatchGAN: ``num_scales`` independent
    PatchDiscriminators judge an avg-pool input pyramid (full, 1/2, 1/4, …).
    Coarser scales see larger effective receptive fields, penalizing global
    structure; the fine scale keeps texture sharp.

    Returns a TUPLE of logit maps (one per scale; static length, so the
    structure is jit-friendly). Losses sum over scales
    (uig/train/losses.py: gan_loss_g/gan_loss_d accept tuples)."""

    base_features: int = 64
    n_layers: int = 3
    num_scales: int = 3
    norm: str = "none"  # MUNIT's D is unnormalized
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple:
        outs = []
        for i in range(self.num_scales):
            outs.append(PatchDiscriminator(
                base_features=self.base_features, n_layers=self.n_layers,
                norm=self.norm, dtype=self.dtype, name=f"scale_{i}")(x))
            if i < self.num_scales - 1:
                # count_include_pad semantics never matter: 2x pool of an
                # even-sized map needs no padding, and image sizes here are
                # powers-of-two multiples of the pyramid depth
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return tuple(outs)
