"""UNIT — UNsupervised Image-to-image Translation (shared-latent VAE pair).

SURVEY.md §0 pins the problem domain as "the CycleGAN family (CycleGAN /
CUT / UNIT / DiscoGAN lineage)"; the reference repo itself is an empty stub
(/root/reference/README.md:1), so this follows the canonical UNIT recipe
(Liu, Breuel, Kautz 2017): two domain VAEs with a SHARED latent space —
the last encoder residual blocks and the first decoder residual blocks use
the same parameters for both domains — trained with within-domain VAE
losses, cross-domain GAN losses, and cycle-consistency VAE losses.

TPU-first details (same playbook as ResNetGenerator):
  * NHWC, fp32 params, selectable compute dtype (bf16 train / fp32 eval);
    the latent (mu) is produced in fp32 so KL terms are numerically stable.
  * built from the fusion-friendly PadConv / ResnetBlock / UpsampleConv
    blocks — fused reflect-pad lowering, static shapes, one XLA program.
  * the module is DETERMINISTIC: encode() returns the posterior mean mu
    (the UNIT posterior is N(mu, I)); reparameterization noise is added by
    the trainer with an explicit functional PRNG key, so the serving path
    (translate = decode(encode(x, src), dst)) is bit-exact by construction.
  * remat_blocks: per-residual-block jax.checkpoint, as in the other
    generators (model.remat="blocks").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from uig.models.layers import InstanceNorm, PadConv, ResnetBlock, UpsampleConv


class _PrivateEncoder(nn.Module):
    """Domain-private half of a UNIT encoder: c7s1-f, d2f, d4f, then
    n_res private residual blocks at 4f channels / quarter resolution."""

    base_features: int = 64
    n_res: int = 2
    norm: str = "instance"
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    conv_impl: str = "xla"
    stem_s2d: int = 0  # space-to-depth factor for the c7s1 stem (0 = off)
    stem_dx_s2d: int = 0  # s2d-packed stem BACKWARD-DATA conv (0 = off)
    down_s2d: int = 0  # same for the stride-2 downsample convs
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f, dt = self.base_features, self.dtype
        block_cls = nn.remat(ResnetBlock) if self.remat_blocks else ResnetBlock
        x = PadConv(f, 7, pad=3, pad_mode=self.pad_mode, pad_impl=self.pad_impl,
                    dtype=dt, s2d_block=self.stem_s2d, impl=self.conv_impl,
                    dx_s2d=self.stem_dx_s2d)(x)
        x = InstanceNorm(dtype=dt)(x)
        x = nn.relu(x)
        for mult in (2, 4):
            x = PadConv(f * mult, 3, stride=2, pad=1, pad_mode="zeros",
                        dtype=dt, s2d_block=self.down_s2d,
                        impl=self.conv_impl)(x)
            x = InstanceNorm(dtype=dt)(x)
            x = nn.relu(x)
        for i in range(self.n_res):
            # explicit name: nn.remat renames the class (CheckpointResnetBlock)
            # which would change the param path — and hence the init stream and
            # checkpoint layout — between remat modes
            x = block_cls(f * 4, norm=self.norm, pad_mode=self.pad_mode,
                          pad_impl=self.pad_impl, dtype=dt,
                          name=f"ResnetBlock_{i}")(x)
        return x


class _PrivateDecoder(nn.Module):
    """Domain-private half of a UNIT decoder: n_res private residual blocks,
    u2f, uf, c7s1-out + tanh."""

    base_features: int = 64
    n_res: int = 2
    out_channels: int = 3
    norm: str = "instance"
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    conv_impl: str = "xla"
    head_s2d: int = 0  # space-to-depth factor for the c7s1-out head (0 = off)
    upsample: str = "conv_transpose"
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f, dt = self.base_features, self.dtype
        block_cls = nn.remat(ResnetBlock) if self.remat_blocks else ResnetBlock
        for i in range(self.n_res):
            # explicit name: keep param paths identical across remat modes
            x = block_cls(f * 4, norm=self.norm, pad_mode=self.pad_mode,
                          pad_impl=self.pad_impl, dtype=dt,
                          name=f"ResnetBlock_{i}")(x)
        for mult in (2, 1):
            x = UpsampleConv(f * mult, method=self.upsample, dtype=dt)(x)
            x = InstanceNorm(dtype=dt)(x)
            x = nn.relu(x)
        x = PadConv(self.out_channels, 7, pad=3, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, dtype=dt,
                    s2d_block=self.head_s2d, impl=self.conv_impl)(x)
        return jnp.tanh(x)


class UNITGenerator(nn.Module):
    """Two-domain shared-latent generator.

    Parameter groups: enc_a / enc_b (private), shared_enc (shared residual
    tail of BOTH encoders), shared_dec (shared residual head of BOTH
    decoders), dec_a / dec_b (private). The shared groups implement the
    shared-latent-space assumption: one set of weights serves both domains.

    encode(x, domain) -> mu  (posterior mean; the UNIT posterior is N(mu, I),
                              so mu IS the latent code for deterministic use)
    decode(z, domain) -> image in [-1, 1]
    """

    base_features: int = 64
    n_private_res: int = 2  # private residual blocks per encoder/decoder
    n_shared_res: int = 2   # SHARED residual blocks (one set for both domains)
    out_channels: int = 3
    norm: str = "instance"
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    conv_impl: str = "xla"
    stem_s2d: int = 0
    stem_dx_s2d: int = 0  # s2d-packed stem backward-data conv (0 = off)
    down_s2d: int = 0
    head_s2d: int = 0
    upsample: str = "conv_transpose"
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(base_features=self.base_features, norm=self.norm,
                  pad_mode=self.pad_mode, pad_impl=self.pad_impl,
                  conv_impl=self.conv_impl,
                  remat_blocks=self.remat_blocks, dtype=self.dtype)
        self.enc_a = _PrivateEncoder(n_res=self.n_private_res,
                                     stem_s2d=self.stem_s2d,
                                     stem_dx_s2d=self.stem_dx_s2d,
                                     down_s2d=self.down_s2d, **kw)
        self.enc_b = _PrivateEncoder(n_res=self.n_private_res,
                                     stem_s2d=self.stem_s2d,
                                     stem_dx_s2d=self.stem_dx_s2d,
                                     down_s2d=self.down_s2d, **kw)
        self.dec_a = _PrivateDecoder(
            n_res=self.n_private_res, out_channels=self.out_channels,
            upsample=self.upsample, head_s2d=self.head_s2d, **kw)
        self.dec_b = _PrivateDecoder(
            n_res=self.n_private_res, out_channels=self.out_channels,
            upsample=self.upsample, head_s2d=self.head_s2d, **kw)
        block_cls = (nn.remat(ResnetBlock) if self.remat_blocks
                     else ResnetBlock)
        blk = dict(norm=self.norm, pad_mode=self.pad_mode,
                   pad_impl=self.pad_impl, dtype=self.dtype)
        f4 = self.base_features * 4
        self.shared_enc = [block_cls(f4, **blk)
                           for _ in range(self.n_shared_res)]
        self.shared_dec = [block_cls(f4, **blk)
                           for _ in range(self.n_shared_res)]

    def encode(self, x: jax.Array, domain: str) -> jax.Array:
        if domain not in ("a", "b"):
            raise ValueError(f"domain must be 'a' or 'b', got {domain!r}")
        h = (self.enc_a if domain == "a" else self.enc_b)(
            x.astype(self.dtype))
        for blk in self.shared_enc:
            h = blk(h)
        # mu in fp32: KL + reparameterization stay numerically stable
        return h.astype(jnp.float32)

    def decode(self, z: jax.Array, domain: str) -> jax.Array:
        if domain not in ("a", "b"):
            raise ValueError(f"domain must be 'a' or 'b', got {domain!r}")
        h = z.astype(self.dtype)
        for blk in self.shared_dec:
            h = blk(h)
        return (self.dec_a if domain == "a" else self.dec_b)(h)

    def translate(self, x: jax.Array, src: str, dst: str) -> jax.Array:
        """Deterministic cross-domain translation through the posterior
        mean — the serving path."""
        return self.decode(self.encode(x, src), dst)

    def __call__(self, x_a: jax.Array, x_b: jax.Array) -> dict:
        """Full deterministic two-domain pass; touches every parameter group
        (used for init and shape tests — the trainer drives encode/decode
        directly so it can inject reparameterization noise functionally)."""
        mu_a = self.encode(x_a, "a")
        mu_b = self.encode(x_b, "b")
        return {
            "mu_a": mu_a,
            "mu_b": mu_b,
            "recon_a": self.decode(mu_a, "a"),
            "recon_b": self.decode(mu_b, "b"),
            "x_ab": self.decode(mu_a, "b"),
            "x_ba": self.decode(mu_b, "a"),
        }
