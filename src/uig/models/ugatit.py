"""U-GAT-IT — attention-guided unpaired translation with AdaLIN.

SURVEY.md §0 pins the problem domain as the unpaired-translation lineage;
the reference repo is an empty stub (/root/reference/README.md:1). U-GAT-IT
(Kim, Kim, Kang, Lee 2019) is the attention member of the family: a Class
Activation Map (CAM) module makes the generator attend to the regions that
distinguish the two domains, and Adaptive Layer-Instance Normalization
(AdaLIN) lets the decoder learn, per channel, how much instance-vs-layer
normalization the translation needs (shape-changing translations want LN,
texture-preserving ones want IN).

Canonical architecture (paper + author reference config, "light" variant):
  * encoder: c7s1-f, two stride-2 downsamples (f→2f→4f), n_res IN residual
    blocks — the CycleGAN encoder topology.
  * CAM (generator): global-average and global-max pooled features each feed
    a 1-logit linear classifier; the classifier WEIGHTS re-weight the feature
    map per channel (that is the attention); the two attended maps concat
    through a 1×1 conv + relu back to 4f channels. The two logits train with
    BCE so the encoder learns domain-discriminative channels.
  * γ/β MLP ("light"): global-avg pool of the attended map → two FC+relu →
    per-example (γ, β) vectors shared by every decoder AdaLIN block. (The
    non-light variant flattens the full H/4·W/4·4f map into the FC — ~268M
    params at 256²; the light variant is the published memory-sane config
    and the only one built here.)
  * decoder: n_res AdaLIN residual blocks (ρ init 0.9 — start near IN), two
    nearest-resize+conv upsamples with ILN (ρ init 0.0 — start at LN), then
    c7s1-out + tanh.
  * discriminators: per domain a GLOBAL (n_layers=7) and LOCAL (n_layers=5)
    PatchGAN, every conv/linear spectral-normalized, each with its own CAM
    whose logits join the adversarial loss.

TPU-first choices (same playbook as the other model families):
  * NHWC, fp32 params, selectable compute dtype; all normalization moments
    and CAM/MLP math accumulate in fp32 (layers.InstanceNorm rule).
  * built from the fusion-friendly PadConv blocks (fused reflect lowering,
    static shapes) so the whole step compiles to one XLA program.
  * spectral norm is FUNCTIONAL: the power-iteration vector u lives in a
    flax "sn" variable collection the trainer carries in its train state and
    threads through apply(mutable=["sn"]) — one iteration per D update step,
    exact resume, no hidden buffers. σ's gradient flows through the weight
    only (u, v are stop-gradient), matching the canonical formulation.
  * the modules are deterministic; every output is a pure function of
    (params, sn-state, inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from uig.models.layers import (InstanceNorm, PadConv, ResnetBlock,
                                   nearest_up2)


def _l2n(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return v * jax.lax.rsqrt(jnp.sum(jnp.square(v)) + eps)


def spectral_normalize(module: nn.Module, name: str, w: jax.Array,
                       update_stats: bool) -> jax.Array:
    """One-power-iteration spectral normalization of ``w`` (any shape; the
    LAST axis is the output dim), with the persistent left-singular estimate
    ``u`` stored in the module's "sn" variable collection under ``name``.

    σ = stop_grad(v)ᵀ W stop_grad(u′): the gradient flows through W only —
    the canonical SN-GAN formulation. ``update_stats`` gates the write of
    u′ (callers pass True exactly once per train step, on the D-loss real
    pass, and must request mutable=["sn"] there)."""
    m = w.shape[-1]
    wm = w.reshape(-1, m).astype(jnp.float32)
    u_var = module.variable(
        "sn", name, lambda: jnp.full((m,), 1.0 / np.sqrt(m), jnp.float32))
    u = u_var.value
    v = _l2n(wm @ u)                       # (N,)
    u_new = _l2n(wm.T @ v)                 # (M,)
    sigma = jax.lax.stop_gradient(v) @ wm @ jax.lax.stop_gradient(u_new)
    if update_stats and not module.is_initializing():
        u_var.value = jax.lax.stop_gradient(u_new)
    return (w.astype(jnp.float32) / sigma).astype(w.dtype)


class SNConv(nn.Module):
    """Spectral-normalized padded conv (explicit reflect pad — D planes are
    small and shrink fast, so the fused-ring lowering isn't worth its ops
    here; the canonical D pads reflect)."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool) -> jax.Array:
        k, f = self.kernel, self.features
        w = self.param("kernel", nn.initializers.normal(0.02),
                       (k, k, x.shape[-1], f))
        w = spectral_normalize(self, "u", w, update_stats)
        if self.pad:
            x = jnp.pad(x, ((0, 0), (self.pad, self.pad),
                            (self.pad, self.pad), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.stride, self.stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (f,))
            y = y + b.astype(self.dtype)
        return y


class AdaLIN(nn.Module):
    """Adaptive Layer-Instance Norm: out = γ·(ρ·IN(x) + (1−ρ)·LN(x)) + β
    with ρ a learned per-channel blend in [0, 1] (the trainer clips it after
    every optimizer step — the published RhoClipper) and per-example (γ, β)
    vectors supplied by the generator's style MLP. ``rho_init=0.9`` starts
    the decoder residual blocks near IN (the paper's initialization)."""

    rho_init: float = 0.9
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, gamma: jax.Array,
                 beta: jax.Array) -> jax.Array:
        c = x.shape[-1]
        rho = self.param("rho", nn.initializers.constant(self.rho_init), (c,))
        x32 = x.astype(jnp.float32)
        # UNBIASED variances (×N/(N−1)): the canonical implementation uses
        # torch.var's default here — unlike its (biased) InstanceNorm2d
        # encoder norms — and weight-import parity requires the same quirk.
        n_in = x.shape[1] * x.shape[2]
        n_ln = n_in * c
        # IN moments: per (example, channel) over H, W
        m_in = jnp.mean(x32, axis=(1, 2), keepdims=True)
        v_in = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
            - jnp.square(m_in), 0.0) * (n_in / (n_in - 1))
        # LN moments: per example over H, W, C
        m_ln = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        v_ln = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
            - jnp.square(m_ln), 0.0) * (n_ln / (n_ln - 1))
        a_in = (x32 - m_in) * jax.lax.rsqrt(v_in + self.eps)
        a_ln = (x32 - m_ln) * jax.lax.rsqrt(v_ln + self.eps)
        y = rho * a_in + (1.0 - rho) * a_ln
        g = gamma.astype(jnp.float32)[:, None, None, :]
        b = beta.astype(jnp.float32)[:, None, None, :]
        return (y * g + b).astype(self.dtype)


class ILN(nn.Module):
    """Layer-Instance Norm with LEARNED per-channel (γ, β) and blend ρ
    (init 0.0 — the upsample blocks start at pure LN, per the paper)."""

    rho_init: float = 0.0
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        rho = self.param("rho", nn.initializers.constant(self.rho_init), (c,))
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        # unbiased variances — the canonical torch.var quirk (see AdaLIN)
        n_in = x.shape[1] * x.shape[2]
        n_ln = n_in * c
        m_in = jnp.mean(x32, axis=(1, 2), keepdims=True)
        v_in = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
            - jnp.square(m_in), 0.0) * (n_in / (n_in - 1))
        m_ln = jnp.mean(x32, axis=(1, 2, 3), keepdims=True)
        v_ln = jnp.maximum(
            jnp.mean(jnp.square(x32), axis=(1, 2, 3), keepdims=True)
            - jnp.square(m_ln), 0.0) * (n_ln / (n_ln - 1))
        a_in = (x32 - m_in) * jax.lax.rsqrt(v_in + self.eps)
        a_ln = (x32 - m_ln) * jax.lax.rsqrt(v_ln + self.eps)
        y = rho * a_in + (1.0 - rho) * a_ln
        return (y * gamma + beta).astype(self.dtype)


class AdaLINResBlock(nn.Module):
    """[pad1 conv3 AdaLIN ReLU pad1 conv3 AdaLIN] + skip; every block in
    the decoder shares the SAME per-example (γ, β) pair (the light-MLP
    design — one vector pair drives all blocks)."""

    features: int
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, gamma: jax.Array,
                 beta: jax.Array) -> jax.Array:
        h = PadConv(self.features, 3, pad=1, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, use_bias=False,
                    dtype=self.dtype)(x)
        h = AdaLIN(dtype=self.dtype)(h, gamma, beta)
        h = nn.relu(h)
        h = PadConv(self.features, 3, pad=1, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, use_bias=False,
                    dtype=self.dtype)(h)
        h = AdaLIN(dtype=self.dtype)(h, gamma, beta)
        return x + h


class _CAM(nn.Module):
    """Generator-side Class Activation Map block. The two 1-logit linear
    heads (gap/gmp) double as the attention: their weight VECTORS re-weight
    the feature channels. Returns (attended map, cam logits (B, 2),
    heatmap (B, H, W, 1))."""

    features: int  # channel count of the attended output (= input channels)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        c = x.shape[-1]
        w_gap = self.param("gap_w", nn.initializers.normal(0.02), (c, 1))
        w_gmp = self.param("gmp_w", nn.initializers.normal(0.02), (c, 1))
        x32 = x.astype(jnp.float32)
        gap = jnp.mean(x32, axis=(1, 2))            # (B, C)
        gmp = jnp.max(x32, axis=(1, 2))             # (B, C)
        gap_logit = gap @ w_gap                     # (B, 1)
        gmp_logit = gmp @ w_gmp
        cam_logit = jnp.concatenate([gap_logit, gmp_logit], axis=1)  # (B, 2)
        x_gap = x * w_gap[:, 0].astype(x.dtype)
        x_gmp = x * w_gmp[:, 0].astype(x.dtype)
        h = jnp.concatenate([x_gap, x_gmp], axis=-1)
        h = PadConv(self.features, 1, pad=0, dtype=self.dtype)(h)
        h = nn.relu(h)
        heatmap = jnp.sum(h.astype(jnp.float32), axis=-1, keepdims=True)
        return h, cam_logit, heatmap


class UGATITGenerator(nn.Module):
    """One-direction U-GAT-IT generator ("light" variant).

    __call__(x) -> (image in [-1, 1], cam_logit (B, 2), heatmap) — the cam
    logit trains with BCE in the trainer (1 for the translation source
    domain, 0 for the other domain's images through the identity pass)."""

    base_features: int = 64
    n_res_blocks: int = 4
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

    @nn.compact
    def __call__(self, x: jax.Array):
        f, dt = self.base_features, self.dtype
        f4 = f * 4
        block_cls = nn.remat(ResnetBlock) if self.remat_blocks else ResnetBlock
        ada_cls = (nn.remat(AdaLINResBlock) if self.remat_blocks
                   else AdaLINResBlock)

        # ---- encoder (CycleGAN topology) ----
        x = x.astype(dt)
        x = PadConv(f, 7, pad=3, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, use_bias=False, dtype=dt,
                    s2d_block=self.stem_s2d, impl=self.conv_impl,
                    dx_s2d=self.stem_dx_s2d)(x)
        x = InstanceNorm(dtype=dt)(x)
        x = nn.relu(x)
        for mult in (2, 4):
            # UGATIT's downsamples reflect-pad (k3 s2 p1) — unlike the
            # CycleGAN family's zero-padded downs
            x = PadConv(f * mult, 3, stride=2, pad=1, pad_mode=self.pad_mode,
                        use_bias=False, dtype=dt, s2d_block=self.down_s2d,
                        impl=self.conv_impl)(x)
            x = InstanceNorm(dtype=dt)(x)
            x = nn.relu(x)
        for i in range(self.n_res_blocks):
            # explicit name: nn.remat renames the class, which would change
            # the param path between remat modes (models/munit.py rule)
            x = block_cls(f4, pad_mode=self.pad_mode, pad_impl=self.pad_impl,
                          dtype=dt, name=f"EncBlock_{i}")(x)

        # ---- CAM attention + domain logits ----
        x, cam_logit, heatmap = _CAM(f4, dtype=dt)(x)

        # ---- light γ/β MLP: gap → FC → relu → FC → relu → (γ, β) ----
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

        # ---- AdaLIN decoder ----
        for i in range(self.n_res_blocks):
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
                    pad_impl=self.pad_impl, use_bias=False, dtype=dt,
                    s2d_block=self.head_s2d, impl=self.conv_impl)(x)
        return jnp.tanh(x), cam_logit, heatmap

    def translate(self, x: jax.Array) -> jax.Array:
        """Serving path: image output only."""
        return self(x)[0]


class UGATITDiscriminator(nn.Module):
    """Spectral-normalized PatchGAN with a CAM head. ``n_layers=7`` is the
    published GLOBAL discriminator (5 stride-2 convs), ``n_layers=5`` the
    LOCAL one (3 stride-2 convs). Call with ``update_stats=True`` (and
    mutable=["sn"]) exactly once per train step to advance the SN power
    iteration.

    Returns (patch logit map, cam logit (B, 2), heatmap).

    Published-quirk note: the official implementation's CAM attention
    multiplies by the UN-normalized classifier weight (torch spectral_norm
    exposes `weight_orig` through .parameters()) while the logit itself uses
    the normalized weight — reproduced here deliberately."""

    base_features: int = 64
    n_layers: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, update_stats: bool = False):
        f, dt = self.base_features, self.dtype
        x = x.astype(dt)
        x = SNConv(f, 4, stride=2, pad=1, dtype=dt)(x, update_stats)
        x = nn.leaky_relu(x, 0.2)
        mult = 1
        for i in range(1, self.n_layers - 2):
            mult = 2 ** (i - 1)
            x = SNConv(f * mult * 2, 4, stride=2, pad=1, dtype=dt)(
                x, update_stats)
            x = nn.leaky_relu(x, 0.2)
        mult = 2 ** (self.n_layers - 2 - 1)
        x = SNConv(f * mult * 2, 4, stride=1, pad=1, dtype=dt)(
            x, update_stats)
        x = nn.leaky_relu(x, 0.2)

        # CAM with spectral-normalized 1-logit linear heads
        c = x.shape[-1]
        w_gap = self.param("gap_w", nn.initializers.normal(0.02), (c, 1))
        w_gmp = self.param("gmp_w", nn.initializers.normal(0.02), (c, 1))
        w_gap_n = spectral_normalize(self, "gap_u", w_gap, update_stats)
        w_gmp_n = spectral_normalize(self, "gmp_u", w_gmp, update_stats)
        x32 = x.astype(jnp.float32)
        gap_logit = jnp.mean(x32, axis=(1, 2)) @ w_gap_n.astype(jnp.float32)
        gmp_logit = jnp.max(x32, axis=(1, 2)) @ w_gmp_n.astype(jnp.float32)
        cam_logit = jnp.concatenate([gap_logit, gmp_logit], axis=1)
        x_gap = x * w_gap[:, 0].astype(dt)   # un-normalized (see quirk note)
        x_gmp = x * w_gmp[:, 0].astype(dt)
        x = jnp.concatenate([x_gap, x_gmp], axis=-1)
        x = PadConv(c, 1, pad=0, dtype=dt)(x)
        x = nn.leaky_relu(x, 0.2)
        heatmap = jnp.sum(x.astype(jnp.float32), axis=-1, keepdims=True)

        x = SNConv(1, 4, stride=1, pad=1, use_bias=False, dtype=dt)(
            x, update_stats)
        if 0 in x.shape:
            raise ValueError(
                f"UGATITDiscriminator produced an EMPTY logit map {x.shape} "
                f"— input too small for n_layers={self.n_layers}")
        return x, cam_logit, heatmap
