"""Core NHWC building blocks (SURVEY.md §2 "ResNet generator" row).

TPU-first choices:
  * NHWC layout throughout — the native conv layout for XLA:TPU; the MXU sees
    convs as (spatial·batch) × Cin × Cout matmuls with C on the lanes.
  * params are fp32; compute dtype is a knob (bf16 for training, fp32 for the
    bit-exact eval path — BASELINE.json north_star fidelity clause).
  * instance-norm statistics are always accumulated in fp32 regardless of the
    compute dtype (bf16 mean/var at 256² spatial is not accurate enough).

The reference repo contains no model code (empty stub,
/root/reference/README.md:1); module semantics follow the canonical CycleGAN
architecture described in SURVEY.md §2 and are oracle-tested against
hand-written torch-CPU implementations in tests/unit/test_layers_oracle.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    """Per-example, per-channel normalization over spatial dims (NHWC).

    Equivalent to torch InstanceNorm2d(affine=True, eps=eps) with
    track_running_stats=False: stats are always computed from the batch, in
    train and eval alike, so there is no batch-size coupling and nothing to
    psum across data-parallel shards (SURVEY.md §7 "Instance norm at batch=1
    under DP").
    """

    eps: float = 1e-5
    affine: bool = True
    # "pallas": one-VMEM-residency kernel for full-resolution planes
    # (XLA's lowering measured ~21x off bandwidth-bound at 256²x64 —
    # BASELINE.md round 2); falls back to xla when the plane won't fit
    # or affine params are absent.
    impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    # >0: declare the (scale, bias) params for that many features and
    # return them WITHOUT computing — the fused conv+IN kernel path
    # (ResnetBlock convin) consumes the params directly while the param
    # tree stays identical to the unfused composition.
    emit_params_only: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.emit_params_only:
            f = self.emit_params_only
            return (self.param("scale", nn.initializers.ones, (f,)),
                    self.param("bias", nn.initializers.zeros, (f,)))
        if self.impl == "pallas" and self.affine and _in_plane_fits(x.shape):
            from uig.kernels.norm_pallas import instance_norm_pallas

            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            return instance_norm_pallas(x, scale, bias,
                                        eps=self.eps).astype(self.dtype)
        x32 = x.astype(jnp.float32)
        # one-pass moments: E[x] and E[x²] reduce in a single sweep over the
        # (H, W) plane (XLA fuses both into one read of the activation);
        # fp32 accumulation keeps var = E[x²]−E[x]² accurate enough for IN
        # at ≤512² spatial extents.
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        mean_sq = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y.astype(self.dtype)


def _in_plane_fits(shape, budget: int = 40 << 20) -> bool:
    """Whole (H, W, C) plane (lane-padded, x2 for in+out blocks) in VMEM."""
    _, h, w, c = shape
    return h * w * (-(-c // 128) * 128) * 2 * 2 < budget


def _norm(kind: str, dtype) -> Callable[[], nn.Module]:
    if kind == "instance":
        return lambda: InstanceNorm(dtype=dtype)
    if kind == "group":
        return lambda: nn.GroupNorm(num_groups=32, dtype=dtype)
    if kind == "none":
        return lambda: (lambda x: x)
    raise ValueError(f"unknown norm {kind!r}")


def _conv_same_s1(x: jax.Array, w: jax.Array, p: int) -> jax.Array:
    """Stride-1 SAME conv with IMPLICIT zero padding (the fusable form)."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d_same_conv_s1(x: jax.Array, w: jax.Array, p: int,
                     block: int) -> jax.Array:
    """Stride-1 implicit-zero-pad SAME conv executed space-to-depth: ONE
    stride-``block`` conv whose kernel embeds w at the block² subpixel
    offsets (block²·f output lanes at 1/block² spatial), then
    depth-to-space. Same linear map, better MXU lane utilization when f is
    tiny. Output spatial must be divisible by ``block``."""
    k, cin, f = w.shape[0], w.shape[2], w.shape[3]
    bsz, h, wd = x.shape[0], x.shape[1], x.shape[2]
    assert h % block == 0 and wd % block == 0, (h, wd, block)
    kb = k + block - 1
    wb = jnp.zeros((kb, kb, cin, block * block * f), w.dtype)
    for di in range(block):
        for dj in range(block):
            o = (di * block + dj) * f
            wb = wb.at[di:di + k, dj:dj + k, :, o:o + f].set(w)
    y = jax.lax.conv_general_dilated(
        x, wb, window_strides=(block, block), padding=((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(bsz, h // block, wd // block, block, block, f)
    return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(bsz, h, wd, f)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_same_dx_s2d(x: jax.Array, w: jax.Array, p: int,
                     block: int) -> jax.Array:
    """Stride-1 implicit-zero-pad SAME conv whose BACKWARD-DATA pass runs
    space-to-depth packed.

    Why: for a conv with FEW input channels (the generator stem, cin=3),
    the forward contracts over 3·k² — fine — but the backward-data conv
    WRITES a 3-lane plane: profiled at 0.023 of MXU peak and ~4.4 ms each
    on the 256² step (round-4 per-op budget, scripts/perf_budget.py — the
    single worst conv in the program). dx = conv(cot, flip(w)ᵀ) is itself
    a stride-1 SAME conv with tiny OUTPUT lanes, i.e. exactly the shape
    the head's s2d trick already fixes — so run it s2d-packed. Forward
    lowering is untouched (stays fused with IN/ReLU); dw keeps the
    default formulation via jax.vjp. Same math, different schedule.

    Odd kernels only: dx = conv_same(ct, flip(w)ᵀ, p) relies on the
    identity 2p == k-1 (for even k the backward-data padding is k-1-p,
    not p, and the s2d dx would be silently wrong)."""
    if w.shape[0] % 2 == 0 or 2 * p != w.shape[0] - 1:
        raise ValueError(
            f"conv_same_dx_s2d requires an odd kernel with 2p == k-1, got "
            f"k={w.shape[0]}, p={p}; use the default VJP for even kernels")
    return _conv_same_s1(x, w, p)


def _conv_dx_s2d_fwd(x, w, p, block):
    return _conv_same_s1(x, w, p), (x, w)


def _conv_dx_s2d_bwd(p, block, res, ct):
    x, w = res
    _, vjp_w = jax.vjp(lambda ww: _conv_same_s1(x, ww, p), w)
    dw, = vjp_w(ct)
    # dx: SAME conv of the cotangent with the flipped/transposed kernel,
    # s2d-packed (w[k-1-kh, k-1-kw, :, :]ᵀ has shape (k, k, f, cin))
    wft = jnp.transpose(jnp.flip(w, (0, 1)), (0, 1, 3, 2))
    dx = s2d_same_conv_s1(ct, wft, p, block)
    return dx, dw


conv_same_dx_s2d.defvjp(_conv_dx_s2d_fwd, _conv_dx_s2d_bwd)


def reflect_conv2d(x: jax.Array, w: jax.Array,
                   dx_s2d: int = 0) -> jax.Array:
    """SAME-shaped stride-1 reflect-padded conv at zero-pad fusion cost.

    Math identity: conv(reflect_pad(x)) differs from conv with implicit zero
    padding ONLY on the p-wide output border ring (p = k//2) — interior
    outputs never touch the pad. So:

      1. run the conv with IMPLICIT zero padding — padding lives inside the
         convolution HLO, so XLA's pad-into-conv fusion applies (an explicit
         pad op materializes the activation and costs ~20% of the whole 256²
         train step, BASELINE.md round-2 pad ablation);
      2. ADD the ring correction conv(reflect_strip − zero_strip) — the
         real-content parts of the two strips cancel, leaving exactly
         (reflect result − what the zero-pad conv already produced) on the
         ring — via tiny strip convs (strip height p+k-1; top+bottom and
         left+right each batched into one conv).

    The ADDITIVE form (vs overwriting the ring) is what keeps the backward
    fast: the `.at[].add` cotangent is an identity passthrough for the main
    conv (stays one fused implicit-pad conv, same as padding=zeros) plus
    ring slices for the strips — no full-plane masks anywhere (an earlier
    overwrite formulation cost ~4 ms/G-apply in masked cotangents,
    BASELINE.md round 3).

    Gradients come from plain autodiff of this graph and are exact.
    Requires odd k and H, W > 2p (callers fall back to the explicit pad for
    tiny planes).
    """
    k = w.shape[0]
    p = k // 2
    if (dx_s2d and dx_s2d > 1 and x.shape[1] % dx_s2d == 0
            and x.shape[2] % dx_s2d == 0):
        y = conv_same_dx_s2d(x, w, p, dx_s2d)
    else:
        y = _conv_same_s1(x, w, p)
    return add_reflect_ring_delta(y, x, w)


def add_reflect_ring_delta(y: jax.Array, x: jax.Array,
                           w: jax.Array) -> jax.Array:
    """Add conv(reflect_pad(x)) − conv(zero_pad(x)) — nonzero only on the
    p-wide output ring — onto ``y``, which must be the SAME-shaped stride-1
    zero-padded conv of x by w (however it was executed: plain implicit-pad
    conv, or the space-to-depth formulation — the delta only depends on the
    linear map, not the execution).

    Formulation ("sparse pad-frame strips", round-3 A/B winner at
    54.1 vs 52.1 img/s on the 256² step — scripts/ring_delta_v2.py,
    BASELINE.md): the reflect−zero strip SUBTRACTION is algebraically
    unnecessary — real-content rows cancel exactly, leaving the "pad
    frame": reflect values at pad cells, zeros elsewhere. Building that
    frame directly needs one assembly instead of two and no subtract
    (~5 fewer HLO ops per conv; the reflect tax is op-count-bound).
    Difference-strip contents (p = k//2), top strip as the example:
      rows 0..p-1   = reflected interior rows (flip of x[1..p]),
                      reflect-padded columns;
      rows p..p+k-2 = ZERO except the p-wide column-pad edges, which hold
                      the reflect column values of the k-1 real rows the
                      ring outputs read.
    (A third variant packing both strip convs into ONE conv with a
    block-diagonal [w 0; 0 wT] kernel crashes the TPU backend's fusion
    emitter — ReverseInput::TransformWindow check — recorded as a negative
    result in BASELINE.md.)"""
    k = w.shape[0]
    p = k // 2
    b, h, wd, c = x.shape
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_valid(t):
        return jax.lax.conv_general_dilated(
            t, w, window_strides=(1, 1), padding="VALID",
            dimension_numbers=dn)

    def colpad_reflect(t):  # reflect pad along the width axis
        return jnp.pad(t, ((0, 0), (0, 0), (p, p), (0, 0)), mode="reflect")

    def edge_cols(rows):  # (B, k-1, W, C) -> (B, k-1, W+2p, C), zero interior
        z = jnp.zeros(rows.shape[:2] + (wd, c), rows.dtype)
        return jnp.concatenate(
            [jnp.flip(rows[:, :, 1:p + 1], 2), z,
             jnp.flip(rows[:, :, wd - p - 1:wd - 1], 2)], 2)

    # top/bottom: pad rows are reflected interior rows; the k-1 real rows
    # the ring outputs read contribute only their column-pad edges
    top = jnp.concatenate(
        [colpad_reflect(jnp.flip(x[:, 1:p + 1], 1)), edge_cols(x[:, :k - 1])], 1)
    bot = jnp.concatenate(
        [edge_cols(x[:, h - k + 1:]),
         colpad_reflect(jnp.flip(x[:, h - p - 1:h - 1], 1))], 1)
    tb = conv_valid(jnp.concatenate([top, bot], 0))  # (2B, p, W, f)
    y = y.at[:, :p].add(tb[:b])
    y = y.at[:, h - p:].add(tb[b:])

    # left/right: rows [p, H-p) read no row pad; only the column-pad cells
    # differ — frame = [reflect col-pad values | zeros over k-1 real cols]
    lft = jnp.concatenate(
        [jnp.flip(x[:, :, 1:p + 1], 2),
         jnp.zeros((b, h, k - 1, c), x.dtype)], 2)
    rgt = jnp.concatenate(
        [jnp.zeros((b, h, k - 1, c), x.dtype),
         jnp.flip(x[:, :, wd - p - 1:wd - 1], 2)], 2)
    lr = conv_valid(jnp.concatenate([lft, rgt], 0))  # (2B, H-2p, p, f)
    y = y.at[:, p:h - p, :p].add(lr[:b])
    y = y.at[:, p:h - p, wd - p:].add(lr[b:])
    return y


def nearest_up2(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2× spatial upsample as broadcast+reshape (NHWC).

    Identical output to jax.image.resize(..., "nearest") at exact factor
    2 — but that lowering goes through gathers that XLA:TPU serializes
    into per-row `while` loops (measured 76 ms/step of while time in the
    starganv2_256 step, round-5 audit, BASELINE.md). This form is pure
    vectorized data movement; its VJP is a 2×2 window sum."""
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, 2 * h, 2 * w, c)


def pad2d(x: jax.Array, p: int, mode: str) -> jax.Array:
    """Spatial padding for NHWC. mode: reflect | zeros.

    TPU perf note (BASELINE.md round 2): reflect padding costs ~20% of the
    whole 256² train step IN-GRAPH — not because of the pad op itself
    (selector-matmul and concat lowerings measured equivalent in-graph) but
    because any EXPLICIT pad materializes the activation and breaks XLA's
    pad-into-conv fusion, which zero padding rides for free.
    ``model.padding=zeros`` is therefore the documented throughput knob
    (+24% step rate, 0.50 vs 0.41 roofline) when canonical CycleGAN
    boundary handling is not required.
    """
    if p == 0:
        return x
    widths = ((0, 0), (p, p), (p, p), (0, 0))
    if mode == "reflect":
        return jnp.pad(x, widths, mode="reflect")
    if mode == "zeros":
        return jnp.pad(x, widths)
    raise ValueError(f"unknown padding mode {mode!r}")


class PadConv(nn.Module):
    """Explicitly padded conv: pad (reflect/zeros) then VALID conv.

    Matches the canonical generator's ReflectionPad2d+Conv2d pairing while
    keeping a single lax.conv for XLA to tile onto the MXU.

    ``s2d_block``: space-to-depth execution of a stride-1 conv with FEW
    output channels (the c7s1-3 generator head is 3/128 MXU-lane-efficient
    and profiling shows it eats ~25% of the 256² train step). The same
    linear map is recomputed as ONE stride-b conv whose kernel embeds the
    original weights at the b² subpixel offsets, producing b²·features
    channels at 1/b² spatial resolution, then depth-to-space restores the
    layout. Lane utilization improves b²×; FLOPs grow (k+b-1)²/k²
    (zero-padding of the kernel). Mathematically identical map — weights
    and checkpoint layout are unchanged.
    """

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    pad_mode: str = "reflect"
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    s2d_block: int = 0  # 0/1 = off; b>1 = space-to-depth factor
    # >1: the BACKWARD-DATA conv runs s2d-packed (conv_same_dx_s2d) — for
    # stride-1 fused-reflect convs with few INPUT channels (the stem),
    # whose dx writes a lane-starved plane. Forward lowering unchanged.
    dx_s2d: int = 0
    # "fused": reflect SAME convs run as an implicit-zero-pad conv (keeps
    # XLA's pad-into-conv fusion) + exact additive border-ring delta —
    # reflect semantics at zero-pad cost (reflect_conv2d; the overwrite
    # formulation was measured and rejected, see add_reflect_ring_delta).
    # "explicit": materialize the reflect pad then VALID conv (the
    # canonical-but-slow lowering).
    pad_impl: str = "fused"
    # "pallas": route the two movement-bound shapes (7x7 s1 p3 and
    # 3x3 s2 p1) to uig.kernels.conv_pallas (s2d coarse-domain im2col
    # matmul, fwd+bwd in Pallas). Anything else falls back to lax.conv.
    impl: str = "xla"
    # weight init: the house default is the DCGAN/CycleGAN normal(0.02);
    # scale-preserving families (StarGAN v2's deep /√2-residual trunks,
    # which canonically rely on torch's fan-in default) pass he_uniform —
    # normal(0.02) attenuates activations ~0.5× per conv there, pinning D
    # and the style encoder at zero output for thousands of steps.
    kernel_init: object = nn.initializers.normal(0.02)
    # True: declare (kernel, bias) and return them WITHOUT convolving —
    # the fused conv+IN kernel path consumes the params directly while
    # the param tree stays identical to the unfused composition.
    emit_params_only: bool = False

    def _pallas_route(self, x) -> str:
        if self.impl != "pallas" or (self.s2d_block and self.s2d_block > 1):
            return ""
        from uig.kernels.conv_pallas import pallas_conv_viable

        _, h, w, cin = x.shape
        k, f = self.kernel, self.features
        # 7x7 s1 p3 with lane-aligned coarse channels (4*cin % 128 == 0):
        # the head (64->3). The stem's cin=3 measured FASTER on XLA once
        # channel padding inflated its K 10x (BASELINE.md round 2), and the
        # stride-2 downsample measured on-par-or-slower — both stay on XLA.
        if (k == 7 and self.stride == 1 and self.pad == 3
                and h % 4 == 0 and w % 4 == 0 and (4 * cin) % 128 == 0
                and pallas_conv_viable(h, w, cin, f, 3, 4)):
            return "conv7"
        return ""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, f = self.kernel, self.features
        cin = x.shape[-1]
        # all execution paths share one parameterization (same checkpoints)
        w = self.param("kernel", self.kernel_init, (k, k, cin, f))
        bias = (self.param("bias", nn.initializers.zeros, (f,))
                if self.use_bias else None)
        if self.emit_params_only:
            return w, bias
        route = self._pallas_route(x)
        if route == "conv7":
            from uig.kernels.conv_pallas import conv7_s2d

            xdt = x.astype(self.dtype)
            wdt = w.astype(self.dtype)
            bdt = None if bias is None else bias.astype(self.dtype)
            return conv7_s2d(xdt, wdt, bdt, pad_mode=self.pad_mode)
        b = self.s2d_block
        out_h = (x.shape[1] + 2 * self.pad - k) // self.stride + 1
        out_w = (x.shape[2] + 2 * self.pad - k) // self.stride + 1
        s2d_on = bool(b and b > 1 and out_h % b == 0 and out_w % b == 0)
        fused_ok = (self.pad_impl == "fused" and self.pad_mode == "reflect"
                    and self.stride == 1
                    and k % 2 == 1 and self.pad == k // 2 and self.pad > 0
                    and x.shape[1] > 2 * self.pad
                    and x.shape[2] > 2 * self.pad)
        if fused_ok:
            xdt = x.astype(self.dtype)
            wdt = w.astype(self.dtype)
            if s2d_on:
                # space-to-depth execution with IMPLICIT zero padding, then
                # the same ring delta — both levers compose (the delta only
                # depends on the linear map, not on how y was executed)
                y = self._s2d_conv(xdt, wdt, b, pad=self.pad)
                y = add_reflect_ring_delta(y, xdt, wdt)
            else:
                y = reflect_conv2d(xdt, wdt, dx_s2d=self.dx_s2d)
        else:
            x = pad2d(x, self.pad, self.pad_mode)
            if s2d_on:
                y = self._s2d_conv(x, w, b)
            else:
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype), w.astype(self.dtype),
                    window_strides=(self.stride, self.stride), padding="VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y.astype(self.dtype)

    def _s2d_conv(self, x: jax.Array, w: jax.Array, b: int,
                  pad: int = 0) -> jax.Array:
        """``pad`` > 0: x is UNpadded and the zero padding is implicit in
        the conv (the fusable form); pad == 0: x arrives pre-padded.

        Works for any stride s: output block (di, dj) of a stride-s conv
        starts s·di rows into the receptive field of the coarse position, so
        the big kernel embeds W at offsets (s·di, s·dj) and the coarse conv
        strides by s·b."""
        k, f = self.kernel, self.features
        s = self.stride
        cin = x.shape[-1]
        h_out = (x.shape[1] + 2 * pad - k) // s + 1
        w_out = (x.shape[2] + 2 * pad - k) // s + 1
        if h_out % b or w_out % b:
            raise ValueError(
                f"s2d_block={b} needs output spatial divisible by {b}, "
                f"got {h_out}x{w_out}")
        # big kernel: W'[s·di:s·di+k, s·dj:s·dj+k, :, slot(di,dj)·f:+f] = W
        kb = k + (b - 1) * s
        wb = jnp.zeros((kb, kb, cin, b * b * f), w.dtype)
        for di in range(b):
            for dj in range(b):
                o = (di * b + dj) * f
                wb = wb.at[s * di:s * di + k, s * dj:s * dj + k,
                           :, o:o + f].set(w)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), wb.astype(self.dtype),
            window_strides=(s * b, s * b), padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, h_out/b, w_out/b, b*b*f)
        # depth-to-space: slot (di, dj) -> output subpixel (di, dj)
        bsz = y.shape[0]
        y = y.reshape(bsz, h_out // b, w_out // b, b, b, f)
        return jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            bsz, h_out, w_out, f)


def _binomial_filter(n: int) -> jnp.ndarray:
    """Row n-1 of Pascal's triangle: [1], [1,1], [1,2,1], [1,3,3,1], ..."""
    a = jnp.ones((1,), jnp.float32)
    for _ in range(n - 1):
        a = jnp.convolve(a, jnp.ones((2,), jnp.float32))
    return a


class BlurPool(nn.Module):
    """Antialiased downsampling (Zhang 2019 blur-pool): fixed normalized
    binomial filter, depthwise, stride 2 — the downsampler the official CUT
    generator uses by default (its `Downsample` module). Parameter-free;
    pad (filt-1)//2 / ceil((filt-1)/2) in `pad_mode`, then a per-channel
    VALID conv. Oracle-tested against torch F.conv2d semantics in
    tests/unit/test_cut_torch_import.py."""

    filt_size: int = 3
    stride: int = 2
    pad_mode: str = "reflect"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        a = _binomial_filter(self.filt_size)
        filt = jnp.outer(a, a)
        filt = (filt / filt.sum()).astype(self.dtype)
        kern = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))  # HWIO, groups=C
        lo = (self.filt_size - 1) // 2
        hi = self.filt_size - 1 - lo
        mode = {"reflect": "reflect", "zeros": "constant",
                "repl": "edge"}[self.pad_mode]
        xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)), mode=mode)
        return jax.lax.conv_general_dilated(
            xp.astype(self.dtype), kern,
            window_strides=(self.stride, self.stride), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)


class BlurUpsample(nn.Module):
    """Antialiased 2x upsampling — the official CUT generator's `Upsample`
    module: replication-pad 1, then a depthwise TRANSPOSED conv with the
    normalized binomial filter scaled by stride² (so constants are
    preserved), cropped to exactly 2x spatial. Parameter-free. Matches
    torch `F.conv_transpose2d(pad(x), filt, stride=2, padding=1+pad_size,
    groups=C)[:, :, 1:-1, 1:-1]` for even filt sizes (oracle-tested)."""

    filt_size: int = 4
    stride: int = 2
    pad_mode: str = "repl"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.stride != 2:
            raise NotImplementedError("BlurUpsample supports stride 2")
        c = x.shape[-1]
        a = _binomial_filter(self.filt_size)
        filt = jnp.outer(a, a)
        filt = (filt / filt.sum() * self.stride ** 2).astype(self.dtype)
        # torch conv_transpose2d scatters the UNflipped kernel; as a direct
        # conv over the lhs-dilated input that is a correlation with the
        # 180°-rotated kernel (symmetric binomial ⇒ identical, but keep the
        # flip so any filt stays faithful).
        filt = filt[::-1, ::-1]
        kern = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))
        mode = {"repl": "edge", "reflect": "reflect"}[self.pad_mode]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode=mode)
        k = self.filt_size
        tpad = 1 + (k - 1) // 2  # torch's padding arg
        p = k - 1 - tpad  # transpose-as-direct-conv edge padding
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), kern, window_strides=(1, 1),
            padding=((p, p), (p, p)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        # torch crops [1:] then (even filt) [:-1] on each spatial axis
        if k % 2 == 1:
            return y[:, 1:, 1:, :]
        return y[:, 1:-1, 1:-1, :]


class UpsampleConv(nn.Module):
    """2x upsampling: conv_transpose (canonical), conv_transpose_torch
    (bit-matches torch ConvTranspose2d(k3,s2,p1,output_padding=1) boundary
    semantics — the checkpoint-import path), or resize+conv (no
    checkerboard artifacts)."""

    features: int
    method: str = "conv_transpose"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.method == "conv_transpose_torch":
            # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) equals
            # a VALID lax conv_transpose with the 180°-flipped kernel,
            # cropped by 1 on the low edges (verified vs torch oracle in
            # tests/unit/test_torch_import.py). Same param names/shapes as
            # "conv_transpose", so the two differ only in execution; the
            # torch importer stores pre-flipped kernels.
            y = nn.ConvTranspose(
                self.features, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.02),
            )(x)
            return y[:, 1:, 1:, :]
        if self.method == "conv_transpose":
            # 3x3 stride-2 transposed conv, output = 2x input spatial
            # (torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) shape).
            return nn.ConvTranspose(
                self.features,
                (3, 3),
                strides=(2, 2),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.02),
            )(x)
        if self.method == "resize_conv":
            x = nearest_up2(x)
            return PadConv(self.features, 3, pad=1, pad_mode="zeros",
                           dtype=self.dtype)(x)
        raise ValueError(f"unknown upsample method {self.method!r}")


class ResnetBlock(nn.Module):
    """CycleGAN residual block: [pad1 conv3 IN ReLU pad1 conv3 IN] + skip.

    ``convin``: route each conv+IN(+ReLU) pair through the fused Pallas
    kernel (uig.kernels.convin_pallas) — one VMEM residency computes the
    conv, the fp32 channel moments AND the normalization, cutting two
    full-plane HBM reads per pair vs the XLA lowering. Param tree is
    IDENTICAL to the unfused composition (same module order, names and
    shapes), so checkpoints interchange. Falls back automatically when
    the plane doesn't fit VMEM or the norm isn't instance."""

    features: int
    norm: str = "instance"
    pad_mode: str = "reflect"
    pad_impl: str = "fused"
    convin: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        use_fused = False
        if self.convin and self.norm == "instance" \
                and self.pad_mode in ("reflect", "zeros"):
            from uig.kernels.convin_pallas import convin_viable

            use_fused = convin_viable(
                x.shape, jnp.dtype(self.dtype).itemsize)
        if use_fused:
            from uig.kernels.convin_pallas import conv3_in_act

            f = self.features
            xd = x.astype(self.dtype)
            conv = partial(
                PadConv, f, 3, pad=1, pad_mode=self.pad_mode,
                pad_impl=self.pad_impl, dtype=self.dtype,
                emit_params_only=True)
            w1, b1 = conv()(xd)
            g1, be1 = InstanceNorm(dtype=self.dtype, emit_params_only=f)(xd)
            h = conv3_in_act(xd, w1, b1, g1, be1, relu=True,
                             pad_mode=self.pad_mode)
            w2, b2 = conv()(h)
            g2, be2 = InstanceNorm(dtype=self.dtype, emit_params_only=f)(h)
            h = conv3_in_act(h, w2, b2, g2, be2, relu=False,
                             pad_mode=self.pad_mode)
            return x + h
        norm = _norm(self.norm, self.dtype)
        h = PadConv(self.features, 3, pad=1, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, dtype=self.dtype)(x)
        h = norm()(h)
        h = nn.relu(h)
        h = PadConv(self.features, 3, pad=1, pad_mode=self.pad_mode,
                    pad_impl=self.pad_impl, dtype=self.dtype)(h)
        h = norm()(h)
        return x + h
