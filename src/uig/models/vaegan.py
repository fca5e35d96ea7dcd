"""VAE-GAN generator (SURVEY.md §0: "unconditional-generation variants
(VAE-GAN, VQGAN)"; BASELINE.json rung 4 "256² VAE-GAN / CUT-style").

Reuses the VQGAN conv ladder (encoder/decoder with attention bottleneck) but
with a Gaussian latent: the encoder emits (μ, logσ²) maps over the latent
grid, z is reparameterization-sampled, the decoder reconstructs. Sampling
from the prior (z ~ N(0, I)) gives the unconditional-generation path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from uig.models.vqgan import VQGANDecoder, VQGANEncoder


class VAEOutput(NamedTuple):
    recon: jax.Array
    mean: jax.Array
    logvar: jax.Array
    kl: jax.Array  # () mean KL per latent element


class VAEGANGenerator(nn.Module):
    base_features: int = 128
    channel_mults: tuple[int, ...] = (1, 1, 2, 2, 4)
    latent_dim: int = 256
    out_channels: int = 3
    attn_resolutions: tuple[int, ...] = (32,)
    attn_impl: str = "pallas"
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(
            base_features=self.base_features,
            channel_mults=self.channel_mults,
            attn_resolutions=self.attn_resolutions,
            attn_impl=self.attn_impl,
            remat_blocks=self.remat_blocks,
            dtype=self.dtype,
        )
        # encoder emits 2*latent_dim channels: (mu, logvar)
        self.encoder = VQGANEncoder(embed_dim=2 * self.latent_dim, **kw)
        self.decoder = VQGANDecoder(out_channels=self.out_channels, **kw)

    def encode(self, x):
        h = self.encoder(x).astype(jnp.float32)
        mean, logvar = jnp.split(h, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z):
        return self.decoder(z.astype(self.dtype))

    def __call__(self, x, rng) -> VAEOutput:
        mean, logvar = self.encode(x)
        eps = jax.random.normal(rng, mean.shape, jnp.float32)
        z = mean + jnp.exp(0.5 * logvar) * eps
        recon = self.decode(z)
        kl = 0.5 * jnp.mean(jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar)
        return VAEOutput(recon=recon, mean=mean, logvar=logvar, kl=kl)

    def sample(self, rng, n: int, latent_hw: int):
        """Unconditional generation from the prior."""
        z = jax.random.normal(rng, (n, latent_hw, latent_hw, self.latent_dim),
                              jnp.float32)
        return self.decode(z)
