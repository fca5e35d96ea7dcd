"""VQGAN model family (SURVEY.md §2 "VQGAN stretch"; BASELINE.json rung 5:
512² codebook generator + discriminator with Pallas attention blocks).

Encoder: conv stem → resblock/downsample ladder (channel mults) with
self-attention at the configured resolutions → GroupNorm/swish → conv to the
embedding dim. VectorQuantizer: nearest-codebook assignment with the
straight-through estimator and codebook+commitment losses (one big (HW, K)
distance matmul — MXU-friendly). Decoder mirrors the encoder. All NHWC,
fp32 params / selectable compute dtype, attention via
uig.kernels.attention_pallas.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from uig.kernels.attention_pallas import attention
from uig.models.layers import nearest_up2


def _swish(x):
    return x * jax.nn.sigmoid(x)


class GN(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = min(32, x.shape[-1])
        return nn.GroupNorm(num_groups=g, epsilon=1e-6, dtype=self.dtype,
                            param_dtype=jnp.float32)(x)


class VQResBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GN(self.dtype)(x)
        h = _swish(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        h = GN(self.dtype)(h)
        h = _swish(h)
        h = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                    param_dtype=jnp.float32)(h)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        return x + h


class AttnBlock(nn.Module):
    impl: str = "pallas"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = GN(self.dtype)(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(y)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(y)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32)(y)
        o = attention(q.reshape(b, h * w, c), k.reshape(b, h * w, c),
                      v.reshape(b, h * w, c), impl=self.impl)
        o = nn.Conv(c, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32)(o.reshape(b, h, w, c))
        return x + o


class VQGANEncoder(nn.Module):
    base_features: int = 128
    channel_mults: tuple[int, ...] = (1, 1, 2, 2, 4)
    embed_dim: int = 256
    attn_resolutions: tuple[int, ...] = (32,)
    attn_impl: str = "pallas"
    remat_blocks: bool = False  # per-block jax.checkpoint (model.remat="blocks")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        # explicit names matching flax auto-naming: nn.remat renames the class
        # (CheckpointVQResBlock) which would silently change param paths — and
        # so the init stream and checkpoint layout — between remat modes
        ctr = {"rb": 0, "ab": 0}
        RB_ = nn.remat(VQResBlock) if self.remat_blocks else VQResBlock
        AB_ = nn.remat(AttnBlock) if self.remat_blocks else AttnBlock

        def RB(f, dt):
            ctr["rb"] += 1
            return RB_(f, dt, name=f"VQResBlock_{ctr['rb'] - 1}")

        def AB(impl, dt):
            ctr["ab"] += 1
            return AB_(impl, dt, name=f"AttnBlock_{ctr['ab'] - 1}")

        x = x.astype(dt)
        h = nn.Conv(self.base_features, (3, 3), dtype=dt,
                    param_dtype=jnp.float32)(x)
        for i, mult in enumerate(self.channel_mults):
            f = self.base_features * mult
            h = RB(f, dt)(h)
            h = RB(f, dt)(h)
            if h.shape[1] in self.attn_resolutions:
                h = AB(self.attn_impl, dt)(h)
            if i < len(self.channel_mults) - 1:  # downsample between stages
                h = nn.Conv(f, (3, 3), strides=(2, 2), dtype=dt,
                            param_dtype=jnp.float32)(h)
        h = RB(h.shape[-1], dt)(h)
        h = AB(self.attn_impl, dt)(h)
        h = RB(h.shape[-1], dt)(h)
        h = GN(dt)(h)
        h = _swish(h)
        return nn.Conv(self.embed_dim, (1, 1), dtype=dt,
                       param_dtype=jnp.float32)(h)


class VQGANDecoder(nn.Module):
    base_features: int = 128
    channel_mults: tuple[int, ...] = (1, 1, 2, 2, 4)
    out_channels: int = 3
    attn_resolutions: tuple[int, ...] = (32,)
    attn_impl: str = "pallas"
    remat_blocks: bool = False  # per-block jax.checkpoint (model.remat="blocks")
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        dt = self.dtype
        # explicit names across remat modes — same rationale as the encoder
        ctr = {"rb": 0, "ab": 0}
        RB_ = nn.remat(VQResBlock) if self.remat_blocks else VQResBlock
        AB_ = nn.remat(AttnBlock) if self.remat_blocks else AttnBlock

        def RB(f, dt):
            ctr["rb"] += 1
            return RB_(f, dt, name=f"VQResBlock_{ctr['rb'] - 1}")

        def AB(impl, dt):
            ctr["ab"] += 1
            return AB_(impl, dt, name=f"AttnBlock_{ctr['ab'] - 1}")

        z = z.astype(dt)
        f = self.base_features * self.channel_mults[-1]
        h = nn.Conv(f, (3, 3), dtype=dt, param_dtype=jnp.float32)(z)
        h = RB(f, dt)(h)
        h = AB(self.attn_impl, dt)(h)
        h = RB(f, dt)(h)
        for i, mult in reversed(list(enumerate(self.channel_mults))):
            f = self.base_features * mult
            h = RB(f, dt)(h)
            h = RB(f, dt)(h)
            if h.shape[1] in self.attn_resolutions:
                h = AB(self.attn_impl, dt)(h)
            if i > 0:  # upsample between stages
                b, hh, ww, c = h.shape
                h = nearest_up2(h)  # gather-free (layers.nearest_up2)
                h = nn.Conv(c, (3, 3), dtype=dt, param_dtype=jnp.float32)(h)
        h = GN(dt)(h)
        h = _swish(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=dt,
                    param_dtype=jnp.float32)(h)
        return jnp.tanh(h)


class VQOutput(NamedTuple):
    quantized: jax.Array  # (B, h, w, D) straight-through
    codebook_loss: jax.Array  # ()
    commitment_loss: jax.Array  # ()
    codes: jax.Array  # (B, h, w) int32
    perplexity: jax.Array  # () codebook usage metric


class VectorQuantizer(nn.Module):
    codebook_size: int = 1024
    embed_dim: int = 256

    def setup(self):
        self.codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.codebook_size, self.embed_dim),
        )

    def embed(self, codes: jax.Array) -> jax.Array:
        """codes (..., ) int32 -> (..., D) codebook vectors."""
        return self.codebook[codes]

    def __call__(self, z: jax.Array) -> VQOutput:
        codebook = self.codebook
        z32 = z.astype(jnp.float32)
        flat = z32.reshape(-1, self.embed_dim)  # (BHW, D)
        # argmin_k ‖z − e_k‖² via one (BHW, K) matmul
        d = (
            jnp.sum(flat**2, 1, keepdims=True)
            - 2.0 * flat @ codebook.T
            + jnp.sum(codebook**2, 1)[None, :]
        )
        codes = jnp.argmin(d, axis=1)
        quant = codebook[codes].reshape(z32.shape)
        codebook_loss = jnp.mean(jnp.square(jax.lax.stop_gradient(z32) - quant))
        commitment = jnp.mean(jnp.square(z32 - jax.lax.stop_gradient(quant)))
        # straight-through estimator
        quant_st = z32 + jax.lax.stop_gradient(quant - z32)
        onehot_mean = jnp.mean(
            jax.nn.one_hot(codes, self.codebook_size, dtype=jnp.float32), 0)
        perplexity = jnp.exp(
            -jnp.sum(onehot_mean * jnp.log(onehot_mean + 1e-10)))
        return VQOutput(
            quantized=quant_st.astype(z.dtype),
            codebook_loss=codebook_loss,
            commitment_loss=commitment,
            codes=codes.reshape(z.shape[:-1]).astype(jnp.int32),
            perplexity=perplexity,
        )


class VQGANGenerator(nn.Module):
    """Encoder + VectorQuantizer + Decoder (the rung-5 'codebook generator')."""

    base_features: int = 128
    channel_mults: tuple[int, ...] = (1, 1, 2, 2, 4)
    embed_dim: int = 256
    codebook_size: int = 1024
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
        self.encoder = VQGANEncoder(embed_dim=self.embed_dim, **kw)
        self.decoder = VQGANDecoder(out_channels=self.out_channels, **kw)
        self.quantizer = VectorQuantizer(self.codebook_size, self.embed_dim)

    def __call__(self, x):
        vq = self.quantizer(self.encoder(x))
        recon = self.decoder(vq.quantized)
        return recon, vq

    def encode(self, x) -> VQOutput:
        return self.quantizer(self.encoder(x))

    def decode(self, z):
        return self.decoder(z)

    def decode_codes(self, codes):
        """codes (B, h, w) int32 -> images; the latent-space sampling path."""
        return self.decoder(self.quantizer.embed(codes))
