"""NICE-GAN — reusing discriminators for encoding (decoupled E/G training).

SURVEY.md §0 pins the unpaired-translation lineage; the reference repo is
an empty stub (/root/reference/README.md:1). NICE-GAN (Chen, Xu, Yang, Tao
— CVPR 2020) removes the generator's dedicated encoder: translation A→B is
``Dec_B(E_A(x_A))`` where **E_A is the first stage of discriminator D_A**
(D_A = C_A ∘ E_A). Its second idea is the *decoupled training paradigm*:
E is trained ONLY by the adversarial (D) objective; the generator losses
update the decoders alone, with gradients flowing *through* the frozen
encoder function but never into its parameters — resolving E's conflicting
roles as both a GAN critic feature and a translation representation.

Architecture here (paradigm-faithful; component deviations documented):
  * **Encoder E** (per domain, lives inside D): spectral-normalized 4×4
    stride-2 conv ×2 then a 3×3 SN conv to 4f — encoding is (H/4, W/4, 4f),
    the same plane the decoder family consumes. (The published E is also a
    short SN conv stack; exact widths/depths there are tied to its 7-layer
    D split.)
  * **Decoder** (per domain): exactly the U-GAT-IT light decoder the paper
    adopts — per-example (γ, β) from a gap→FC MLP on the encoding, n_res
    AdaLIN residual blocks, two nearest-resize+conv+ILN upsamples, c7s1
    tanh head (models/ugatit.py building blocks).
  * **Classifier C** (per domain, rest of D): continues the SN PatchGAN
    ladder on the encoding with a CAM head (gap/gmp 1-logit SN linears
    whose weights re-weight the channels — the U-GAT-IT mechanism the
    paper keeps) and emits (patch logits, cam logits). The published
    classifier is additionally multi-scale; this one is single-scale +
    CAM, which the trainer documents and tests as such.

TPU-first choices: NHWC, fp32 params + moments, selectable compute dtype,
functional spectral norm (power-iteration vector in the carried "sn"
collection, advanced once per step), all four networks inside one
shard_map program. Decoupled training is value_and_grad over the DECODER
params only — the JAX-native expression of "backward through E, step only
Dec" (no stop_gradient on activations, no boolean requires_grad state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from uig.models.layers import PadConv, nearest_up2
from uig.models.ugatit import AdaLINResBlock, ILN, SNConv, spectral_normalize


class NICEEncoder(nn.Module):
    """E: the discriminator's first stage, reused as the translation
    encoder. SN conv4 s2 (f) → SN conv4 s2 (2f) → SN conv3 s1 (4f), leaky
    ReLU throughout; encoding (B, H/4, W/4, 4f)."""

    base_features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False):
        f, dt = self.base_features, self.dtype
        x = x.astype(dt)
        x = SNConv(f, 4, stride=2, pad=1, dtype=dt)(x, update_stats)
        x = nn.leaky_relu(x, 0.2)
        x = SNConv(2 * f, 4, stride=2, pad=1, dtype=dt)(x, update_stats)
        x = nn.leaky_relu(x, 0.2)
        x = SNConv(4 * f, 3, stride=1, pad=1, dtype=dt)(x, update_stats)
        return nn.leaky_relu(x, 0.2)


class NICEDecoder(nn.Module):
    """Decoder: the U-GAT-IT light decoder consuming a (H/4, W/4, 4f)
    encoding — gap→FC→(γ, β), n_res AdaLIN residual blocks, two
    nearest-resize+conv+ILN upsamples, c7s1 tanh head."""

    base_features: int = 64
    n_res_blocks: int = 4
    out_channels: int = 3
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        f, dt = self.base_features, self.dtype
        f4 = 4 * f
        ada_cls = (nn.remat(AdaLINResBlock) if self.remat_blocks
                   else AdaLINResBlock)
        x = z.astype(dt)

        # light γ/β MLP on the pooled encoding
        h = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (B, 4f)
        for _ in range(2):
            h = nn.Dense(f4, use_bias=False, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.02))(h)
            h = nn.relu(h)
        gamma = nn.Dense(f4, use_bias=False, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.02))(h)
        beta = nn.Dense(f4, use_bias=False, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.02))(h)

        for i in range(self.n_res_blocks):
            # explicit name: nn.remat renames the class, which would change
            # the param path between remat modes (models/munit.py rule)
            x = ada_cls(f4, pad_mode=self.pad_mode, pad_impl=self.pad_impl,
                        dtype=dt, name=f"DecBlock_{i}")(x, gamma, beta)
        for mult in (2, 1):
            b, hh, ww, c = x.shape
            x = nearest_up2(x)  # gather-free (layers.nearest_up2)
            x = PadConv(f * mult, 3, pad=1, pad_mode=self.pad_mode,
                        pad_impl=self.pad_impl, use_bias=False, dtype=dt)(x)
            x = ILN(dtype=dt)(x)
            x = nn.relu(x)
        x = PadConv(self.out_channels, 7, pad=3, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, use_bias=False, dtype=dt)(x)
        return jnp.tanh(x)


class NICEClassifier(nn.Module):
    """C: the rest of the discriminator, on top of the shared encoding.
    Continues the SN PatchGAN ladder (one stride-2 + one stride-1 4×4 SN
    conv) with a CAM head, then the 4×4 SN patch-logit conv.

    Returns (patch logit map, cam logits (B, 2))."""

    base_features: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array, update_stats: bool = False):
        f, dt = self.base_features, self.dtype
        x = z.astype(dt)
        x = SNConv(8 * f, 4, stride=2, pad=1, dtype=dt)(x, update_stats)
        x = nn.leaky_relu(x, 0.2)
        x = SNConv(8 * f, 4, stride=1, pad=1, dtype=dt)(x, update_stats)
        x = nn.leaky_relu(x, 0.2)
        # the final 4×4 conv shrinks the plane by 1 more: catch too-small
        # encodings HERE, before the CAM pools reduce a zero-size plane
        if x.shape[1] < 2 or x.shape[2] < 2:
            raise ValueError(
                f"NICEClassifier plane {x.shape} is too small for the "
                "4×4 patch-logit conv — input image too small for the "
                "encoder+classifier ladder")

        # CAM with spectral-normalized 1-logit heads (U-GAT-IT mechanism,
        # incl. the published un-normalized-attention quirk)
        c = x.shape[-1]
        w_gap = self.param("gap_w", nn.initializers.normal(0.02), (c, 1))
        w_gmp = self.param("gmp_w", nn.initializers.normal(0.02), (c, 1))
        w_gap_n = spectral_normalize(self, "gap_u", w_gap, update_stats)
        w_gmp_n = spectral_normalize(self, "gmp_u", w_gmp, update_stats)
        x32 = x.astype(jnp.float32)
        gap_logit = jnp.mean(x32, axis=(1, 2)) @ w_gap_n.astype(jnp.float32)
        gmp_logit = jnp.max(x32, axis=(1, 2)) @ w_gmp_n.astype(jnp.float32)
        cam_logit = jnp.concatenate([gap_logit, gmp_logit], axis=1)
        x_gap = x * w_gap[:, 0].astype(dt)
        x_gmp = x * w_gmp[:, 0].astype(dt)
        x = jnp.concatenate([x_gap, x_gmp], axis=-1)
        x = PadConv(c, 1, pad=0, dtype=dt)(x)
        x = nn.leaky_relu(x, 0.2)

        # plane >= 2 was checked above, so this map is always >= 1x1
        x = SNConv(1, 4, stride=1, pad=1, use_bias=False, dtype=dt)(
            x, update_stats)
        return x, cam_logit
