"""StarGAN v2 — style-based multi-domain multimodal translation.

SURVEY.md §0 pins the problem domain (the unpaired-translation lineage; the
reference repo is an empty stub — /root/reference/README.md:1). StarGAN v2
(Choi et al. 2020) supersedes StarGAN v1's label-conditioned generator with
an explicit STYLE code per domain, giving both multi-domain AND multimodal
translation from four networks:

  G(x, s)    generator: image + style vector → image
  F(z, y)    mapping network: latent z ~ N(0,I) + target domain → style
  E(x, y)    style encoder: image + domain → its style code
  D(x, y)    multi-task discriminator: one real/fake logit PER domain,
             selected by the domain label

Canonical architecture (paper + author reference config, img 256):
  * G: 3×3 from-RGB, log2(img)−4 downsampling IN-resblocks (64→512 capped),
    2 bottleneck IN-resblocks, 2 bottleneck AdaIN-resblocks, mirrored
    AdaIN-upsample blocks, to-RGB = IN→LeakyReLU→1×1 conv (NO tanh — the
    canonical v2 head is linear; serving clips at uint8 conversion).
    Every residual sum is scaled by 1/√2 (v2's unit-variance trick).
  * F: 16-d latent, shared 4×(fc 512 + ReLU) trunk, per-domain 4-layer
    unshared heads → 64-d style.
  * E/D: shared conv trunk — 1×1 from-RGB... (canonical: 3×3), log2(img)−2
    unnormalized downsampling resblocks to a 4×4 plane, LeakyReLU, 4×4
    VALID conv, LeakyReLU — then per-domain linear heads (style_dim for E,
    1 for D).
  * the high-pass-filter branch (w_hpf, CelebA-HQ only — needs external
    facial masks) is intentionally absent; the published AFHQ config also
    runs w_hpf=0.

TPU-first choices:
  * per-domain heads are STACKED parameters (D, in, out) evaluated for all
    domains in one einsum and selected with a one-hot contraction — static
    shapes, all-MXU, no parameter gather / dynamic dispatch per label.
  * AdaIN owns its style projection (Dense style→2C per site, fp32
    statistics — same one-pass-moments rule as layers.InstanceNorm).
  * built from the house PadConv blocks (fused reflect-at-zero-cost
    lowering is N/A here — v2 convs are zero-padded SAME convs, the
    canonical choice) with NHWC layout, fp32 params, selectable compute
    dtype.
  * modules are deterministic: all randomness (z, target domains) enters
    as explicit trainer arguments from the functional PRNG.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from uig.models.layers import InstanceNorm, PadConv

_SQRT2 = math.sqrt(2.0)

# scale-preserving init (canonical v2 relies on torch's fan-in defaults);
# the house normal(0.02) attenuates activations ~0.5x per conv through the
# deep /sqrt(2)-residual trunks, pinning D/E outputs at zero for thousands
# of steps (measured at init: logits ~1e-9)
_INIT = nn.initializers.he_uniform()


def _conv(features, kernel, **kw):
    """PadConv with the v2 scale-preserving init."""
    return PadConv(features, kernel, kernel_init=_INIT, **kw)


def _n_down_g(image_size: int) -> int:
    """Generator downsampling depth: log2(img) − 4 (canonical; bottleneck
    plane = 16² at 256²)."""
    n = int(math.log2(image_size)) - 4
    if 2 ** (n + 4) != image_size or n < 1:
        raise ValueError(
            f"starganv2 needs a power-of-two image_size >= 32, got "
            f"{image_size}")
    return n


def _n_down_de(image_size: int) -> int:
    """Style-encoder/discriminator trunk depth: log2(img) − 2 (final plane
    is always 4×4, closed by the 4×4 VALID conv)."""
    return int(math.log2(image_size)) - 2


class StyleAdaIN(nn.Module):
    """v2 AdaIN: IN statistics with (scale, bias) projected from the style
    vector by an owned Dense (scale = 1 + γ so a zero projection is the
    identity — the canonical parameterization)."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        p = nn.Dense(2 * self.features, dtype=jnp.float32,
                     param_dtype=jnp.float32, kernel_init=_INIT)(
            s.astype(jnp.float32))
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        gamma = p[:, : self.features][:, None, None, :]
        beta = p[:, self.features:][:, None, None, :]
        return ((1.0 + gamma) * y + beta).astype(self.dtype)


class V2ResBlk(nn.Module):
    """Pre-activation residual block, (res + shortcut)/√2.

    residual: [IN?] → LeakyReLU(0.2) → conv3 → [avgpool2] → [IN?] →
              LeakyReLU → conv3(features)
    shortcut: [1×1 conv if channels change] → [avgpool2]
    """

    features: int
    normalize: bool = False
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        h = x
        if self.normalize:
            h = InstanceNorm(dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        h = _conv(cin, 3, pad=1, pad_mode="zeros", dtype=self.dtype)(h)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), (2, 2))
        if self.normalize:
            h = InstanceNorm(dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        h = _conv(self.features, 3, pad=1, pad_mode="zeros",
                    dtype=self.dtype)(h)
        s = x
        if cin != self.features:
            s = _conv(self.features, 1, use_bias=False,
                        dtype=self.dtype)(s)
        if self.downsample:
            s = nn.avg_pool(s, (2, 2), (2, 2))
        return ((h + s) / _SQRT2).astype(self.dtype)


class V2AdainResBlk(nn.Module):
    """Style-conditioned residual block, (res + shortcut)/√2.

    residual: AdaIN → LeakyReLU → [nearest ×2] → conv3(features) → AdaIN →
              LeakyReLU → conv3(features)
    shortcut: [nearest ×2] → [1×1 conv if channels change]
    """

    features: int
    upsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        cin = x.shape[-1]

        def up(t):
            from uig.models.layers import nearest_up2

            return nearest_up2(t)  # gather-free (see layers.nearest_up2)

        h = StyleAdaIN(cin, dtype=self.dtype)(x, s)
        h = nn.leaky_relu(h, 0.2)
        if self.upsample:
            h = up(h)
        h = _conv(self.features, 3, pad=1, pad_mode="zeros",
                    dtype=self.dtype)(h)
        h = StyleAdaIN(self.features, dtype=self.dtype)(h, s)
        h = nn.leaky_relu(h, 0.2)
        h = _conv(self.features, 3, pad=1, pad_mode="zeros",
                    dtype=self.dtype)(h)
        sc = x
        if self.upsample:
            sc = up(sc)
        if cin != self.features:
            sc = _conv(self.features, 1, use_bias=False,
                         dtype=self.dtype)(sc)
        return ((h + sc) / _SQRT2).astype(self.dtype)


class V2Generator(nn.Module):
    """G(x, s): encode with IN-resblocks, decode with AdaIN-resblocks driven
    by the 64-d style vector. Linear RGB head (canonical — no tanh)."""

    image_size: int = 256
    style_dim: int = 64
    out_channels: int = 3
    base_features: int = 64
    max_features: int = 512
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, s: jax.Array) -> jax.Array:
        dt = self.dtype
        n_down = _n_down_g(self.image_size)
        rb = nn.remat(V2ResBlk) if self.remat_blocks else V2ResBlk
        ab = nn.remat(V2AdainResBlk) if self.remat_blocks else V2AdainResBlk

        x = x.astype(dt)
        s = s.astype(jnp.float32)
        x = _conv(self.base_features, 3, pad=1, pad_mode="zeros",
                    dtype=dt)(x)  # from-RGB
        # encoder: features double per downsample, capped at max_features;
        # record the dims so the decoder mirrors them exactly
        dims = []
        f = self.base_features
        for i in range(n_down):
            dims.append(f)
            f = min(f * 2, self.max_features)
            # explicit names: nn.remat renames the class, which would change
            # the param path between remat modes (models/unit.py rule)
            x = rb(f, normalize=True, downsample=True, dtype=dt,
                   name=f"Down_{i}")(x)
        for i in range(2):
            x = rb(f, normalize=True, dtype=dt, name=f"Bottle_{i}")(x)
        for i in range(2):
            x = ab(f, dtype=dt, name=f"AdaBottle_{i}")(x, s)
        for i, fo in enumerate(reversed(dims)):
            x = ab(fo, upsample=True, dtype=dt, name=f"Up_{i}")(x, s)
        x = InstanceNorm(dtype=dt)(x)
        x = nn.leaky_relu(x, 0.2)
        return _conv(self.out_channels, 1, dtype=dt)(x)


class _DomainHeads(nn.Module):
    """Per-domain unshared MLP heads as STACKED parameters: depth−1 hidden
    ReLU layers then a linear output, all domains evaluated in one einsum
    chain (D, B, ·) and selected with a one-hot contraction."""

    num_domains: int
    hidden: int
    out_dim: int
    depth: int = 4  # canonical mapping network: 3 hidden + 1 output

    @nn.compact
    def __call__(self, h: jax.Array, labels: jax.Array) -> jax.Array:
        init = _INIT
        h = h.astype(jnp.float32)  # (B, hidden_in)
        d = self.num_domains
        # first unshared layer lifts (B, ·) -> (D, B, hidden)
        widths = [self.hidden] * (self.depth - 1) + [self.out_dim]
        for i, w_out in enumerate(widths):
            w_in = h.shape[-1]
            w = self.param(f"w{i}", init, (d, w_in, w_out), jnp.float32)
            b = self.param(f"b{i}", nn.initializers.zeros, (d, w_out),
                           jnp.float32)
            if h.ndim == 2:
                h = jnp.einsum("bi,dio->dbo", h, w) + b[:, None, :]
            else:
                h = jnp.einsum("dbi,dio->dbo", h, w) + b[:, None, :]
            if i < len(widths) - 1:
                h = nn.relu(h)
        onehot = jax.nn.one_hot(labels, d, dtype=jnp.float32)  # (B, D)
        return jnp.einsum("dbo,bd->bo", h, onehot)


class V2MappingNetwork(nn.Module):
    """F(z, y): shared 4-layer MLP trunk + per-domain 4-layer unshared heads
    → style vector. All fp32 (tiny FLOPs; style numerics drive L1 style
    reconstruction)."""

    num_domains: int = 2
    latent_dim: int = 16
    style_dim: int = 64
    hidden: int = 512

    @nn.compact
    def __call__(self, z: jax.Array, labels: jax.Array) -> jax.Array:
        h = z.astype(jnp.float32)
        for _ in range(4):
            h = nn.Dense(self.hidden, dtype=jnp.float32,
                         param_dtype=jnp.float32, kernel_init=_INIT)(h)
            h = nn.relu(h)
        return _DomainHeads(self.num_domains, self.hidden, self.style_dim,
                            depth=4)(h, labels)


class _SharedTrunk(nn.Module):
    """The E/D conv trunk: 3×3 from-RGB, log2(img)−2 unnormalized
    downsampling resblocks (features double, capped), LeakyReLU, 4×4 VALID
    conv, LeakyReLU → (B, features) flat."""

    image_size: int = 256
    base_features: int = 64
    max_features: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dt = self.dtype
        x = x.astype(dt)
        x = _conv(self.base_features, 3, pad=1, pad_mode="zeros",
                    dtype=dt)(x)
        f = self.base_features
        for i in range(_n_down_de(self.image_size)):
            f = min(f * 2, self.max_features)
            x = V2ResBlk(f, downsample=True, dtype=dt, name=f"Down_{i}")(x)
        if x.shape[1] != 4 or x.shape[2] != 4:
            raise ValueError(
                f"starganv2 trunk expects a 4x4 final plane, got {x.shape} — "
                "image_size must be a power of two >= 16")
        x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(f, (4, 4), padding="VALID", dtype=dt,
                    param_dtype=jnp.float32, kernel_init=_INIT)(x)
        x = nn.leaky_relu(x, 0.2)
        return x.reshape(x.shape[0], f).astype(jnp.float32)


class V2StyleEncoder(nn.Module):
    """E(x, y): shared trunk + per-domain linear heads → style code."""

    image_size: int = 256
    num_domains: int = 2
    style_dim: int = 64
    base_features: int = 64
    max_features: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array) -> jax.Array:
        h = _SharedTrunk(self.image_size, self.base_features,
                         self.max_features, dtype=self.dtype)(x)
        return _DomainHeads(self.num_domains, h.shape[-1], self.style_dim,
                            depth=1)(h, labels)


class V2Discriminator(nn.Module):
    """D(x, y): shared trunk + per-domain linear heads → (B, 1) real/fake
    logit for each example's OWN domain label (multi-task discriminator)."""

    image_size: int = 256
    num_domains: int = 2
    base_features: int = 64
    max_features: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, labels: jax.Array) -> jax.Array:
        h = _SharedTrunk(self.image_size, self.base_features,
                         self.max_features, dtype=self.dtype)(x)
        return _DomainHeads(self.num_domains, h.shape[-1], 1,
                            depth=1)(h, labels)
