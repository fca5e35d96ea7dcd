"""MUNIT — Multimodal UNsupervised Image-to-image Translation.

SURVEY.md §0 pins the problem domain as the unpaired-translation lineage
("CycleGAN / CUT / UNIT / DiscoGAN"); the reference repo is an empty stub
(/root/reference/README.md:1). MUNIT (Huang, Liu, Belongie, Kautz 2018) is
the multimodal extension of UNIT: an image decomposes into a
domain-invariant CONTENT code (spatial feature map) and a domain-specific
STYLE code (low-dim vector). Translation recombines the source content with
a target-domain style — sampled from N(0, I) for diverse outputs, or
extracted from a reference image for style-guided translation.

Canonical architecture (paper + author config):
  * content encoder: c7s1-f, two stride-2 downsamples (f→2f→4f), then
    n_content_res IN residual blocks — same topology as the UNIT encoder.
  * style encoder: c7s1-f, four stride-2 convs (NO normalization — IN would
    erase exactly the statistics that carry style), global average pool,
    1×1 conv → style_dim (default 8).
  * decoder: MLP(style) → per-layer AdaIN (scale, bias); n_content_res
    AdaIN residual blocks on the content code, two ×2 upsamples
    (nearest-resize + conv with per-example LayerNorm), c7s1-out + tanh.
  * discriminator: multi-scale PatchGAN (models/patch_disc.py).

TPU-first choices (same playbook as the other generators):
  * NHWC, fp32 params, selectable compute dtype; AdaIN/LayerNorm statistics
    accumulate in fp32 (bf16 spatial moments at 256² are not accurate
    enough — same rule as layers.InstanceNorm).
  * built from the fusion-friendly PadConv blocks (fused reflect lowering,
    static shapes, one XLA program per step).
  * the module is DETERMINISTIC: all randomness (style sampling) enters as
    explicit arguments from the trainer's functional PRNG, so the serving
    path is bit-exact for a fixed style code by construction.
  * the style MLP produces ALL AdaIN parameters in one fused matmul chain
    (one (B, style_dim) × (style_dim, mlp_dim) × … × (mlp_dim, n_adain·2·C)
    stack), sliced per layer — tiny FLOPs, MXU-friendly, no scalar loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from uig.models.layers import InstanceNorm, PadConv, nearest_up2


class AdaIN(nn.Module):
    """Adaptive instance norm: IN statistics with PER-EXAMPLE (scale, bias)
    supplied from the style MLP instead of learned parameters.

    ``params`` is (B, 2·C): [scale − 1 ‖ bias] — the MLP's zero output is
    the identity transform, matching the canonical initialization."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, params: jax.Array) -> jax.Array:
        c = x.shape[-1]
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        p32 = params.astype(jnp.float32)
        scale = 1.0 + p32[:, :c][:, None, None, :]
        bias = p32[:, c:][:, None, None, :]
        return (y * scale + bias).astype(self.dtype)


class LayerNorm2d(nn.Module):
    """Per-example layer norm over (H, W, C) with per-channel affine — the
    normalization MUNIT uses in the decoder's upsample blocks (IN there
    would fight the AdaIN-injected style statistics)."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return (y * scale + bias).astype(self.dtype)


class AdaINResBlock(nn.Module):
    """Residual block [conv3 AdaIN ReLU conv3 AdaIN] + skip; the two AdaIN
    parameter vectors arrive pre-sliced from the style MLP."""

    features: int
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, p1: jax.Array,
                 p2: jax.Array) -> jax.Array:
        h = PadConv(self.features, 3, pad=1, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, dtype=self.dtype)(x)
        h = AdaIN(dtype=self.dtype)(h, p1)
        h = nn.relu(h)
        h = PadConv(self.features, 3, pad=1, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, dtype=self.dtype)(h)
        h = AdaIN(dtype=self.dtype)(h, p2)
        return x + h


class _ContentEncoder(nn.Module):
    """c7s1-f, d2f, d4f, n_res IN residual blocks → content code
    (B, H/4, W/4, 4f)."""

    base_features: int = 64
    n_res: int = 4
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    conv_impl: str = "xla"
    stem_s2d: int = 0
    stem_dx_s2d: int = 0  # s2d-packed stem backward-data conv (0 = off)
    down_s2d: int = 0
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from uig.models.layers import ResnetBlock

        f, dt = self.base_features, self.dtype
        block_cls = nn.remat(ResnetBlock) if self.remat_blocks else ResnetBlock
        x = PadConv(f, 7, pad=3, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, dtype=dt,
                    s2d_block=self.stem_s2d, impl=self.conv_impl,
                    dx_s2d=self.stem_dx_s2d)(x)
        x = InstanceNorm(dtype=dt)(x)
        x = nn.relu(x)
        for mult in (2, 4):
            x = PadConv(f * mult, 4, stride=2, pad=1, pad_mode="zeros",
                        dtype=dt, s2d_block=self.down_s2d,
                        impl=self.conv_impl)(x)
            x = InstanceNorm(dtype=dt)(x)
            x = nn.relu(x)
        for i in range(self.n_res):
            # explicit name: nn.remat renames the class, which would change
            # the param path (init stream + checkpoint layout) between
            # remat modes — same rule as models/unit.py
            x = block_cls(f * 4, pad_mode=self.pad_mode,
                          pad_impl=self.pad_impl, dtype=dt,
                          name=f"ResnetBlock_{i}")(x)
        return x


class _StyleEncoder(nn.Module):
    """c7s1-f, four stride-2 convs, global average pool, FC → style vector
    (B, style_dim). NO normalization anywhere — channel means/variances ARE
    the style signal AdaIN re-injects."""

    base_features: int = 64
    style_dim: int = 8
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        f, dt = self.base_features, self.dtype
        x = PadConv(f, 7, pad=3, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, dtype=dt)(x)
        x = nn.relu(x)
        for mult in (2, 4, 4, 4):
            x = PadConv(f * mult, 4, stride=2, pad=1, pad_mode="zeros",
                        dtype=dt)(x)
            x = nn.relu(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # global avg pool
        # style in fp32: the latent-recon L1 and N(0,I) sampling stay stable
        return nn.Dense(self.style_dim, dtype=jnp.float32,
                        param_dtype=jnp.float32,
                        kernel_init=nn.initializers.normal(0.02))(x)


class _Decoder(nn.Module):
    """MLP(style) → AdaIN params; n_res AdaIN residual blocks on the content
    code, two nearest+conv upsamples with LayerNorm, c7s1-out + tanh."""

    base_features: int = 64
    n_res: int = 4
    out_channels: int = 3
    mlp_dim: int = 256
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    conv_impl: str = "xla"
    head_s2d: int = 0
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, content: jax.Array, style: jax.Array) -> jax.Array:
        f, dt = self.base_features, self.dtype
        f4 = f * 4
        # ONE fused MLP producing every AdaIN (scale−1, bias) pair: per res
        # block two AdaINs of 2·4f params each
        n_adain = 2 * self.n_res
        h = style.astype(jnp.float32)
        for _ in range(2):
            h = nn.Dense(self.mlp_dim, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         kernel_init=nn.initializers.normal(0.02))(h)
            h = nn.relu(h)
        ada = nn.Dense(n_adain * 2 * f4, dtype=jnp.float32,
                       param_dtype=jnp.float32,
                       kernel_init=nn.initializers.normal(0.02))(h)
        ada = ada.reshape(ada.shape[0], n_adain, 2 * f4)

        block_cls = (nn.remat(AdaINResBlock) if self.remat_blocks
                     else AdaINResBlock)
        x = content.astype(dt)
        for i in range(self.n_res):
            # explicit name — see _ContentEncoder
            x = block_cls(f4, pad_mode=self.pad_mode, pad_impl=self.pad_impl,
                          dtype=dt, name=f"AdaINResBlock_{i}")(
                x, ada[:, 2 * i], ada[:, 2 * i + 1])
        for mult in (2, 1):
            b, hh, ww, c = x.shape
            x = nearest_up2(x)  # gather-free (layers.nearest_up2)
            x = PadConv(f * mult, 5, pad=2, pad_mode=self.pad_mode,
                        pad_impl=self.pad_impl, dtype=dt)(x)
            x = LayerNorm2d(dtype=dt)(x)
            x = nn.relu(x)
        x = PadConv(self.out_channels, 7, pad=3, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, dtype=dt,
                    s2d_block=self.head_s2d, impl=self.conv_impl)(x)
        return jnp.tanh(x)


class MUNITGenerator(nn.Module):
    """Two-domain content/style generator.

    Parameter groups per domain d ∈ {a, b}: content_enc_d, style_enc_d,
    dec_d — no cross-domain sharing (the canonical MUNIT design; the
    shared-latent assumption applies to the CONTENT space through the
    losses, not through tied weights).

    encode(x, domain)          -> (content (B,H/4,W/4,4f), style (B,S))
    decode(content, style, d)  -> image in [-1, 1]
    translate(x, src, dst, s)  -> decode(content(x), s, dst)  [deterministic
                                  for a fixed style code s]
    """

    base_features: int = 64
    n_content_res: int = 4
    style_dim: int = 8
    mlp_dim: int = 256
    out_channels: int = 3
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    conv_impl: str = "xla"
    stem_s2d: int = 0
    stem_dx_s2d: int = 0  # s2d-packed stem backward-data conv (0 = off)
    down_s2d: int = 0
    head_s2d: int = 0
    remat_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        ckw = dict(base_features=self.base_features, n_res=self.n_content_res,
                   pad_mode=self.pad_mode, pad_impl=self.pad_impl,
                   conv_impl=self.conv_impl, stem_s2d=self.stem_s2d,
                   stem_dx_s2d=self.stem_dx_s2d,
                   down_s2d=self.down_s2d, remat_blocks=self.remat_blocks,
                   dtype=self.dtype)
        skw = dict(base_features=self.base_features, style_dim=self.style_dim,
                   pad_mode=self.pad_mode, pad_impl=self.pad_impl,
                   dtype=self.dtype)
        dkw = dict(base_features=self.base_features, n_res=self.n_content_res,
                   out_channels=self.out_channels, mlp_dim=self.mlp_dim,
                   pad_mode=self.pad_mode, pad_impl=self.pad_impl,
                   conv_impl=self.conv_impl, head_s2d=self.head_s2d,
                   remat_blocks=self.remat_blocks, dtype=self.dtype)
        self.content_enc_a = _ContentEncoder(**ckw)
        self.content_enc_b = _ContentEncoder(**ckw)
        self.style_enc_a = _StyleEncoder(**skw)
        self.style_enc_b = _StyleEncoder(**skw)
        self.dec_a = _Decoder(**dkw)
        self.dec_b = _Decoder(**dkw)

    def _check(self, domain: str):
        if domain not in ("a", "b"):
            raise ValueError(f"domain must be 'a' or 'b', got {domain!r}")

    def encode_content(self, x: jax.Array, domain: str) -> jax.Array:
        self._check(domain)
        enc = self.content_enc_a if domain == "a" else self.content_enc_b
        return enc(x.astype(self.dtype))

    def encode_style(self, x: jax.Array, domain: str) -> jax.Array:
        self._check(domain)
        enc = self.style_enc_a if domain == "a" else self.style_enc_b
        return enc(x.astype(self.dtype))

    def encode(self, x: jax.Array, domain: str):
        return self.encode_content(x, domain), self.encode_style(x, domain)

    def decode(self, content: jax.Array, style: jax.Array,
               domain: str) -> jax.Array:
        self._check(domain)
        dec = self.dec_a if domain == "a" else self.dec_b
        return dec(content, style)

    def translate(self, x: jax.Array, src: str, dst: str,
                  style: jax.Array) -> jax.Array:
        """Cross-domain translation with an explicit target-domain style
        code — the serving path (bit-exact for a fixed style)."""
        return self.decode(self.encode_content(x, src), style, dst)

    def __call__(self, x_a: jax.Array, x_b: jax.Array) -> dict:
        """Full deterministic two-domain pass touching every parameter group
        (init and shape tests; the trainer drives encode/decode directly so
        it can inject sampled styles functionally)."""
        c_a, s_a = self.encode(x_a, "a")
        c_b, s_b = self.encode(x_b, "b")
        return {
            "c_a": c_a, "s_a": s_a, "c_b": c_b, "s_b": s_b,
            "recon_a": self.decode(c_a, s_a, "a"),
            "recon_b": self.decode(c_b, s_b, "b"),
            "x_ab": self.decode(c_a, s_b, "b"),
            "x_ba": self.decode(c_b, s_a, "a"),
        }
