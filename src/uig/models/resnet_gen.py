"""ResNet-block generator (SURVEY.md §2 "ResNet generator" row).

Architecture (canonical CycleGAN topology, derived in SURVEY.md — the
reference repo has no code, /root/reference/README.md:1):

    c7s1-64 → d128 → d256 → R256 × n (6 @128², 9 @256²) → u128 → u64 → c7s1-3, tanh

TPU-first details:
  * NHWC, fp32 params, selectable compute dtype (bf16 train / fp32 eval).
  * the whole forward is one fusion-friendly chain of lax.convs — no python
    control flow, static shapes, so jit compiles one XLA program that keeps
    the MXU busy end to end.
  * ``extract_until``/feature taps support the CUT/PatchNCE variant: the
    layer list is flat, so nce_layers index into it directly.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from uig.models.layers import (BlurPool, BlurUpsample, InstanceNorm, PadConv,
                               ResnetBlock, UpsampleConv)


class ResNetGenerator(nn.Module):
    out_channels: int = 3
    base_features: int = 64
    n_res_blocks: int = 9
    norm: str = "instance"
    pad_mode: str = "reflect"
    upsample: str = "conv_transpose"
    # "strided": canonical CycleGAN resampling (stride-2 convs down,
    # `upsample` up). "antialias": the official CUT generator's default —
    # stride-1 conv + blur-pool down, blur-upsample + conv up (Zhang 2019
    # antialiased resampling; `upsample` is then ignored). Layer indices
    # shift, so nce tap configs are per-resample-mode.
    resample: str = "strided"
    head_s2d: int = 0  # space-to-depth factor for the c7s1-3 head (0 = off)
    stem_s2d: int = 0  # same for the c7s1-64 stem conv (0 = off)
    down_s2d: int = 0  # same for the stride-2 downsample convs (0 = off)
    # >1: the stem's BACKWARD-DATA conv runs s2d-packed (its dx writes a
    # 3-lane image-grad plane — the worst conv in the round-4 per-op
    # budget); forward lowering unchanged, so the round-3 stem_s2d
    # negative (broken stem->IN fusion) does not apply. 0 = off.
    stem_dx_s2d: int = 0
    # per-block jax.checkpoint (model.remat="blocks"): each residual block
    # stores only its input and recomputes internals in backward — near-full
    # trunk memory savings with many small remat regions instead of one
    # giant one (compiler-friendlier than remat="full" at 512²)
    remat_blocks: bool = False
    # "pallas" routes the 7x7 head conv to uig.kernels.conv_pallas
    # (free-view coarse s2d kernel; 1.5x faster than XLA in ISOLATION).
    # Default stays "xla": in the full fused graph XLA's cross-op fusion
    # wins (G fwd measured 17.3 ms xla vs 21.6 ms pallas at 256^2 B=16 —
    # BASELINE.md round 2). Kept as an experimentation knob and for
    # shapes/backends where the fusion story differs.
    conv_impl: str = "xla"
    # reflect-conv lowering: "fused" = implicit-zero-pad conv + exact
    # additive border-ring delta (reflect semantics at zero-pad fusion
    # cost — layers.reflect_conv2d); "explicit" = materialized reflect pad.
    pad_impl: str = "fused"
    # route trunk conv+IN(+ReLU) pairs through the fused Pallas kernel
    # (uig.kernels.convin_pallas): one VMEM residency per pair, two
    # full-plane HBM reads saved. Identical param tree.
    convin_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        f = self.base_features
        dt = self.dtype
        ci = self.conv_impl
        pi = self.pad_impl
        block_cls = nn.remat(ResnetBlock) if self.remat_blocks else ResnetBlock
        layers: list = []
        # stem: c7s1-64
        layers += [
            PadConv(f, 7, pad=3, pad_mode=self.pad_mode, pad_impl=pi,
                    dtype=dt, s2d_block=self.stem_s2d, impl=ci,
                    dx_s2d=self.stem_dx_s2d),
            InstanceNorm(dtype=dt),
            "relu",
        ]
        if self.resample not in ("strided", "antialias"):
            raise ValueError(f"unknown resample mode {self.resample!r}")
        aa = self.resample == "antialias"
        # downsample: d128, d256
        for mult in (2, 4):
            if aa:
                layers += [
                    PadConv(f * mult, 3, stride=1, pad=1, pad_mode="zeros",
                            dtype=dt, impl=ci),
                    InstanceNorm(dtype=dt),
                    "relu",
                    BlurPool(dtype=dt),
                ]
            else:
                layers += [
                    PadConv(f * mult, 3, stride=2, pad=1, pad_mode="zeros",
                            dtype=dt, s2d_block=self.down_s2d, impl=ci),
                    InstanceNorm(dtype=dt),
                    "relu",
                ]
        # residual trunk
        for _ in range(self.n_res_blocks):
            layers += [
                block_cls(f * 4, norm=self.norm, pad_mode=self.pad_mode,
                          pad_impl=pi, convin=self.convin_pallas, dtype=dt)
            ]
        # upsample: u128, u64
        for mult in (2, 1):
            if aa:
                layers += [
                    BlurUpsample(dtype=dt),
                    PadConv(f * mult, 3, stride=1, pad=1, pad_mode="zeros",
                            dtype=dt),
                    InstanceNorm(dtype=dt),
                    "relu",
                ]
            else:
                layers += [
                    UpsampleConv(f * mult, method=self.upsample, dtype=dt),
                    InstanceNorm(dtype=dt),
                    "relu",
                ]
        # head: c7s1-3 + tanh
        layers += [
            PadConv(self.out_channels, 7, pad=3, pad_mode=self.pad_mode,
                    pad_impl=pi, dtype=dt, s2d_block=self.head_s2d, impl=ci),
            "tanh",
        ]
        self.layers = layers

    def _run(self, x: jax.Array, taps: Sequence[int] | None):
        feats = []
        x = x.astype(self.dtype)
        for i, layer in enumerate(self.layers):
            if layer == "relu":
                x = nn.relu(x)
            elif layer == "tanh":
                x = jnp.tanh(x)
            else:
                x = layer(x)
            if taps is not None and i in taps:
                feats.append(x)
        return x, feats

    def __call__(self, x: jax.Array) -> jax.Array:
        y, _ = self._run(x, None)
        return y

    def with_features(self, x: jax.Array, taps: Sequence[int]):
        """Full forward pass returning (output, [features at layer indices])."""
        return self._run(x, tuple(taps))

    def encode_features(self, x: jax.Array, taps: Sequence[int]):
        """Encoder-side features ONLY: stops at the last tap, skipping the
        decoder half entirely — the CUT/PatchNCE hot path (the NCE loss
        discards the translated output of its feature passes, so running the
        upsample/head layers would be ~25% wasted generator FLOPs per step).
        """
        taps = tuple(taps)
        last = max(taps)
        feats = []
        x = x.astype(self.dtype)
        for i, layer in enumerate(self.layers):
            if layer == "relu":
                x = nn.relu(x)
            elif layer == "tanh":
                x = jnp.tanh(x)
            else:
                x = layer(x)
            if i in taps:
                feats.append(x)
            if i >= last:
                break
        return feats

    @property
    def num_layers(self) -> int:
        # static layer count for choosing nce tap indices
        per_stage = 4 if self.resample == "antialias" else 3
        return 3 + 2 * per_stage + self.n_res_blocks + 2 * per_stage + 2
