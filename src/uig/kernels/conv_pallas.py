"""Pallas conv kernels for the generator's MOVEMENT-BOUND convolutions.

Scope (chosen from the honest on-chip component breakdown, BASELINE.md
round 2): XLA:TPU already runs the C=256 trunk resblocks at ~0.64–0.79 of
the bf16 roofline — a fused Pallas resblock measured SLOWER (negative
result, recorded in BASELINE.md). What XLA handles badly is the 7×7
tiny-channel head/stem pair (head: 0.018 of roofline, 35% of G forward),
whose cost is im2col data movement, not FLOPs.

TPU-native formulation (iterated against on-chip A/Bs; the failed
intermediate attempts are recorded in BASELINE.md):

  * Coarse domain via FREE VIEWS, no transposes anywhere: row subpixels
    are an explicit array dim, column subpixels pack into lanes —
        (B, Hp, Wp, C)  →  (B, Hp/b, b, Wp/b, b·C)
    is offset-identical in row-major order, and the kernel likewise WRITES
    its output as (B, Ho, b, Wo, b·Cout), whose row-major merge back to
    fine (B, H, W, Cout) is again free. A 7×7 stride-1 pad-3 conv becomes
    a coarse 3×3 VALID conv with K = 3·b·3·(b·C) and N = b²·Cout.
  * The kernel (grid (B, row-strips), padded plane VMEM-resident) builds an
    im2col patch matrix per strip (kc·b·kc aligned slices of the 5-D view)
    and issues ONE fat `dot_general`; the MXU pass count drops ~5× vs the
    fine-domain shape because s2d shrinks M by b² while growing K only ~3×.
  * Backward is Pallas and transpose-free too: grad-x is the SAME kernel on
    the (coarse-)padded upstream gradient with flipped/regrouped weights —
    the 5-D output layout of the forward is exactly the 5-D input layout
    the dgrad conv wants; grad-w accumulates patchᵀ·dy per output subpixel
    into a VMEM-resident (K, N) block across the grid.

Parity: tests/unit/test_conv_pallas.py (interpret mode, fwd + grads, vs
jax.lax.conv references) and scripts/tpu_kernel_parity.py (compiled).
The reference repo has no kernels to mirror (empty stub,
/root/reference/README.md:1); shapes/constants follow SURVEY.md §2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _pick_strip(ho: int, wo: int, k: int, itemsize: int = 2,
                budget: int = 24 << 20) -> int:
    """Largest divisor of ho (<=16) whose im2col strip scratch fits the
    byte budget."""
    target = max(1, min(16, budget // max(wo * k * itemsize, 1), ho))
    for s in range(target, 0, -1):
        if ho % s == 0:
            return s
    return 1


def pallas_conv_viable(h: int, w: int, cin: int, cout: int, kc: int,
                       block: int) -> bool:
    """Whether the coarse free-view formulation fits comfortably in VMEM
    (padded plane + double-buffered blocks + strip scratch)."""
    hc, wc = h // block + kc - 1, w // block + kc - 1
    cc = block * cin
    lane_pad = -(-cc // 128) * 128
    plane = hc * block * wc * lane_pad * 2
    k = kc * block * kc * cc
    out_lanes = -(-block * cout // 128) * 128
    out = (h // block) * block * (w // block) * out_lanes * 2
    scratch = _pick_strip(h // block, wc, k) * wc * k * 2
    wbytes = k * block * block * cout * 2
    return 2 * plane + out + scratch + wbytes < (60 << 20)


# ---------------------------------------------------------------------------
# 5-D free-view core: coarse kc×kc VALID conv
#   input  (B, HC, bi, WC, cc)   weights (kc·bi·kc·cc, bo·nn)
#   output (B, HO, bo, WO, nn)   [all free views of fine row-major planes]
# ---------------------------------------------------------------------------


def _im2col_5d(x_ref, p3_ref, *, kc, bi, wo, cc, r0, strip, lead=True):
    """Fill p3 (strip, wo, kc·bi·kc·cc) from the 5-D view: K-order
    (ciu, fu, civ, [fv·ci packed in cc])."""
    for ciu in range(kc):
        for fu in range(bi):
            for civ in range(kc):
                o = ((ciu * bi + fu) * kc + civ) * cc
                src = (x_ref[0, pl.ds(r0 + ciu, strip), fu, civ:civ + wo, :]
                       if lead else
                       x_ref[pl.ds(r0 + ciu, strip), fu, civ:civ + wo, :])
                p3_ref[:, :, o:o + cc] = src


def _mirror_maps(hc: int, b: int):
    """Reflect-pad source cells for a zero-padded plane with pad = b = one
    coarse cell per side (PyTorch ReflectionPad2d semantics). Returns
    [(dst_cell, dst_sub, src_cell, src_sub), ...] for the low and high
    border cells; identical for rows and columns."""
    maps = []
    hfine = (hc - 2) * b
    for f in range(b):
        srcp = 2 * b - f
        maps.append((0, f, srcp // b, srcp % b))
        srcp = hfine - 2 - f + b
        maps.append((hc - 1, f, srcp // b, srcp % b))
    return maps


def _assemble_mirror(x_ref, xs_ref, *, hc, bi, wc, cc):
    """Copy the zero-padded plane into scratch and overwrite its border
    cells with reflected content (rows as whole-row copies, columns as
    per-subpixel lane-block copies)."""
    xs_ref[...] = x_ref[0]
    c = cc // bi
    for dst, f, src, sf in _mirror_maps(hc, bi):
        xs_ref[dst, f, :, :] = xs_ref[src, sf, :, :]
    for dst, f, src, sf in _mirror_maps(wc, bi):
        xs_ref[:, :, dst, f * c:(f + 1) * c] = \
            xs_ref[:, :, src, sf * c:(sf + 1) * c]


def _conv5_kernel(x_ref, w_ref, o_ref, p3_ref, *, kc, bi, bo, wo, cc, nn,
                  strip, mirror, fold=False, xs_ref=None, b_ref=None):
    s = pl.program_id(1)
    if mirror:
        @pl.when(s == 0)
        def _():
            _assemble_mirror(x_ref, xs_ref, hc=x_ref.shape[1], bi=bi,
                             wc=x_ref.shape[3], cc=cc)
        _im2col_5d(xs_ref, p3_ref, kc=kc, bi=bi, wo=wo, cc=cc,
                   r0=s * strip, strip=strip, lead=False)
    else:
        _im2col_5d(x_ref, p3_ref, kc=kc, bi=bi, wo=wo, cc=cc,
                   r0=s * strip, strip=strip)
    acc = jax.lax.dot_general(
        p3_ref[...], w_ref[...], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (strip, wo, bo·nn)
    if b_ref is not None:
        acc = acc + b_ref[0]
    for su in range(bo):
        o_ref[0, :, su, :, :] = acc[:, :, su * nn:(su + 1) * nn].astype(
            o_ref.dtype)
    if fold:
        _fold_block(o_ref, s=s, bo=bo, wo=wo, nn=nn, strip=strip)


def _fold_block(o_ref, *, s, bo, wo, nn, strip):
    """Transpose of the forward's in-kernel reflect mirror, applied to the
    dgrad output (= dx5) per strip block IN VMEM. Columns first (the
    forward mirrored columns last, and its column sources include the
    row-mirrored border rows), then rows in the first/last strip."""
    ho = pl.num_programs(1) * strip
    n_strips = pl.num_programs(1)
    ci = nn // bo  # fine channels per column subpixel
    # column fold: every strip block
    for dst, f, src, sf in _mirror_maps(wo, bo):
        o_ref[0, :, :, src, sf * ci:(sf + 1) * ci] += \
            o_ref[0, :, :, dst, f * ci:(f + 1) * ci]
        o_ref[0, :, :, dst, f * ci:(f + 1) * ci] = jnp.zeros_like(
            o_ref[0, :, :, dst, f * ci:(f + 1) * ci])
    # row fold: border cells live in the first and last strips (strip >= 3)
    for dst, f, src, sf in _mirror_maps(ho, bo):
        in_first = dst < strip
        local_dst = dst if in_first else dst - (n_strips - 1) * strip
        local_src = src if in_first else src - (n_strips - 1) * strip
        cond = (s == 0) if in_first else (s == n_strips - 1)

        @pl.when(cond)
        def _(local_dst=local_dst, local_src=local_src, f=f, sf=sf):
            o_ref[0, local_src, sf, :, :] += o_ref[0, local_dst, f, :, :]
            o_ref[0, local_dst, f, :, :] = jnp.zeros_like(
                o_ref[0, local_dst, f, :, :])


def _conv5_impl(x5: jax.Array, w: jax.Array, bias: jax.Array | None = None,
                *, kc: int, bo: int, mirror: bool = False,
                fold: bool = False, out_dtype=None) -> jax.Array:
    nb, hc, bi, wc, cc = x5.shape
    k, ncols = w.shape
    assert k == kc * bi * kc * cc, (k, kc, bi, cc)
    assert ncols % bo == 0
    nn = ncols // bo
    ho, wo = hc - kc + 1, wc - kc + 1
    strip = _pick_strip(ho, wo, k, x5.dtype.itemsize)
    if fold:
        assert strip >= 3, "fold needs border cells within one strip"
    out_dtype = out_dtype or x5.dtype
    has_bias = bias is not None

    def kern(*refs):
        if mirror and has_bias:
            x_ref, w_ref, b_ref, o_ref, p3_ref, xs_ref = refs
        elif mirror:
            x_ref, w_ref, o_ref, p3_ref, xs_ref = refs
            b_ref = None
        elif has_bias:
            x_ref, w_ref, b_ref, o_ref, p3_ref = refs
            xs_ref = None
        else:
            x_ref, w_ref, o_ref, p3_ref = refs
            b_ref = xs_ref = None
        _conv5_kernel(x_ref, w_ref, o_ref, p3_ref, kc=kc, bi=bi, bo=bo,
                      wo=wo, cc=cc, nn=nn, strip=strip, mirror=mirror,
                      fold=fold, xs_ref=xs_ref, b_ref=b_ref)
    return pl.pallas_call(
        kern,
        grid=(nb, ho // strip),
        in_specs=(
            [pl.BlockSpec((1, hc, bi, wc, cc), lambda i, s: (i, 0, 0, 0, 0),
                          memory_space=pltpu.VMEM),
             pl.BlockSpec((k, ncols), lambda i, s: (0, 0),
                          memory_space=pltpu.VMEM)]
            + ([pl.BlockSpec((1, ncols), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM)] if has_bias else [])),
        out_specs=pl.BlockSpec((1, strip, bo, wo, nn),
                               lambda i, s: (i, s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, ho, bo, wo, nn), out_dtype),
        scratch_shapes=(
            [pltpu.VMEM((strip, wo, k), x5.dtype)]
            + ([pltpu.VMEM((hc, bi, wc, cc), x5.dtype)] if mirror else [])),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_is_cpu(),
    )(*((x5, w, bias.reshape(1, ncols).astype(jnp.float32))
        if has_bias else (x5, w)))


def _wgrad5_kernel(x_ref, dy_ref, dw_ref, p3_ref, *, kc, bi, bo, wo, cc,
                   nn, strip, mirror, xs_ref=None):
    i = pl.program_id(0)
    s = pl.program_id(1)
    if mirror:
        @pl.when(s == 0)
        def _():
            _assemble_mirror(x_ref, xs_ref, hc=x_ref.shape[1], bi=bi,
                             wc=x_ref.shape[3], cc=cc)
        _im2col_5d(xs_ref, p3_ref, kc=kc, bi=bi, wo=wo, cc=cc,
                   r0=s * strip, strip=strip, lead=False)
    else:
        _im2col_5d(x_ref, p3_ref, kc=kc, bi=bi, wo=wo, cc=cc,
                   r0=s * strip, strip=strip)

    @pl.when(jnp.logical_and(i == 0, s == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref[...])

    for su in range(bo):
        dw_ref[:, su * nn:(su + 1) * nn] += jax.lax.dot_general(
            p3_ref[...], dy_ref[0, :, su, :, :],
            (((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32)


def _wgrad5_impl(x5: jax.Array, dy5: jax.Array, *, kc: int,
                 mirror: bool = False) -> jax.Array:
    nb, hc, bi, wc, cc = x5.shape
    _, ho, bo, wo, nn = dy5.shape
    k = kc * bi * kc * cc
    strip = _pick_strip(ho, wo, k, x5.dtype.itemsize)
    if mirror:
        def kern(x_ref, dy_ref, dw_ref, p3_ref, xs_ref):
            _wgrad5_kernel(x_ref, dy_ref, dw_ref, p3_ref, kc=kc, bi=bi,
                           bo=bo, wo=wo, cc=cc, nn=nn, strip=strip,
                           mirror=True, xs_ref=xs_ref)
    else:
        kern = functools.partial(_wgrad5_kernel, kc=kc, bi=bi, bo=bo, wo=wo,
                                 cc=cc, nn=nn, strip=strip, mirror=False)
    return pl.pallas_call(
        kern,
        grid=(nb, ho // strip),
        in_specs=[
            pl.BlockSpec((1, hc, bi, wc, cc), lambda i, s: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, strip, bo, wo, nn), lambda i, s: (i, s, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, bo * nn), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, bo * nn), jnp.float32),
        scratch_shapes=(
            [pltpu.VMEM((strip, wo, k), x5.dtype)]
            + ([pltpu.VMEM((hc, bi, wc, cc), x5.dtype)] if mirror else [])),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_is_cpu(),
    )(x5, dy5)


def _dgrad_weights(w: jax.Array, kc: int, bi: int, cc: int, bo: int
                   ) -> jax.Array:
    """Regroup W (rows (ciu, fu, civ, cc), cols (su, nn)) into the
    full-correlation weights Wt (rows (ciu', su, civ', nn), cols (fu, cc))
    so grad-x is the same coarse conv applied to the padded dy5."""
    ncols = w.shape[1]
    nn = ncols // bo
    w6 = w.reshape(kc, bi, kc, cc, bo, nn)
    w6 = w6[::-1, :, ::-1]  # flip coarse offsets
    wt = jnp.transpose(w6, (0, 4, 2, 5, 1, 3))  # (kc, bo, kc, nn, bi, cc)
    return wt.reshape(kc * bo * kc * nn, bi * cc)


@functools.lru_cache(maxsize=None)
def _make_conv5(kc: int, bo: int, mirror: bool):
    @jax.custom_vjp
    def conv5(x5, w, bias):
        return _conv5_impl(x5, w, bias, kc=kc, bo=bo, mirror=mirror)

    def fwd(x5, w, bias):
        return conv5(x5, w, bias), (x5, w)

    def bwd(res, dy5):
        x5, w = res
        bi, cc = x5.shape[2], x5.shape[4]
        # grad-x: coarse full correlation of dy5 — the forward's 5-D output
        # layout is exactly the input layout this conv wants; its 5-D
        # output layout is exactly dx5. No transposes.
        dyp5 = jnp.pad(dy5.astype(x5.dtype),
                       ((0, 0), (kc - 1, kc - 1), (0, 0),
                        (kc - 1, kc - 1), (0, 0)))
        wt = _dgrad_weights(w, kc, bi, cc, bo).astype(w.dtype)
        # the reflect transpose (fold) runs inside the dgrad kernel on the
        # VMEM-resident output block — an XLA-side scatter fold measured 32
        # unfused full-plane RMWs (BASELINE.md)
        dx5 = _conv5_impl(dyp5, wt, kc=kc, bo=bi, out_dtype=x5.dtype,
                          fold=mirror)
        # grad-w contracts patches of the (mirrored) plane the forward saw
        dw = _wgrad5_impl(x5, dy5.astype(x5.dtype), kc=kc, mirror=mirror)
        db = jnp.sum(dy5.astype(jnp.float32), axis=(0, 1, 3))
        return dx5, dw.astype(w.dtype), db.reshape(-1)

    conv5.defvjp(fwd, bwd)
    return conv5


def conv_core5(x5: jax.Array, w: jax.Array, kc: int, bo: int,
               mirror: bool = False,
               bias: jax.Array | None = None) -> jax.Array:
    """Differentiable Pallas coarse VALID conv on the 5-D free view.
    ``mirror``: treat the one-coarse-cell border as reflect padding
    (assembled in VMEM; the input itself carries zero pads).
    ``bias``: (bo·nn,) added to the conv output inside the kernel."""
    if bias is None:
        bias = jnp.zeros((w.shape[1],), jnp.float32)
    return _make_conv5(kc, bo, mirror)(x5, w, bias)


def conv_core(xp: jax.Array, w: jax.Array, kh: int, kw: int) -> jax.Array:
    """Differentiable Pallas VALID KhxKw conv on a pre-padded 4-D plane
    (thin shim over the 5-D core with bi=bo=1; kh must equal kw)."""
    assert kh == kw, "square windows only"
    y5 = conv_core5(xp[:, :, None, :, :], w, kh, 1)
    return y5[:, :, 0, :, :]


# ---------------------------------------------------------------------------
# XLA glue: pad + FREE-view reshapes (differentiable, so the custom_vjp
# boundary stays at conv_core5 and JAX chains through these for free)
# ---------------------------------------------------------------------------


def _free_view(xp: jax.Array, b: int) -> jax.Array:
    """(B, Hp, Wp, C) → (B, Hp/b, b, Wp/b, b·C). Offset-identical in
    row-major layout: a pure reshape, no transpose."""
    n, hp, wp, c = xp.shape
    return xp.reshape(n, hp // b, b, wp // b, b * c)


def _pad_reflect(x: jax.Array, lo: int, hi: int) -> jax.Array:
    """Spatial pad: PyTorch ReflectionPad2d semantics (mirror without edge
    repeat). lo/hi may exceed the 7×7 support only where the coarse weight
    slots are zero."""
    h = x.shape[1]
    assert max(lo, hi) <= h
    x = jnp.concatenate(
        [x[:, 1:lo + 1][:, ::-1], x, x[:, h - hi - 1:h - 1][:, ::-1]],
        axis=1)
    w = x.shape[2]
    return jnp.concatenate(
        [x[:, :, 1:lo + 1][:, :, ::-1], x,
         x[:, :, w - hi - 1:w - 1][:, :, ::-1]], axis=2)


def coarse_weights_7x7(w: jax.Array, b: int = 4) -> jax.Array:
    """Rearrange a (7,7,Cin,Cout) kernel into the free-view coarse matrix
    (3·b·3·(b·Cin), b·(b·Cout)).

    Fine output row t = b·X + su reads unpadded fine rows t + du − 3
    (du ∈ 0..6). With the padded plane starting at fine coord −b, that is
    coarse cell X + ciu at row-subpixel fu where b·ciu + fu = su + du − 3
    + b (same for columns). Built as ONE einsum against a constant 0/1
    selection tensor so the transform is differentiable (grads flow back
    to the original 7×7 params) without tracing 784 scatter ops.
    """
    k, _, cin, cout = w.shape
    pad = (k - 1) // 2
    kc = 3
    sel = np.zeros((kc, b, k, b), np.float32)  # [ci, f, d, s]
    for s_ in range(b):
        for d in range(k):
            ci, f = divmod(s_ + d - pad + b, b)
            sel[ci, f, d, s_] = 1.0
    sel = jnp.asarray(sel)
    # K order (ciu, fu, civ, fv, ci); N order (su, sv, co)
    wc = jnp.einsum("aeus,bfvt,uvcd->aebfcstd", sel, sel,
                    w.astype(jnp.float32))
    return wc.reshape(kc * b * kc * b * cin, b * b * cout).astype(w.dtype)


def conv7_s2d(x: jax.Array, w: jax.Array, bias: jax.Array | None,
              pad_mode: str = "reflect", block: int = 4) -> jax.Array:
    """pad-3 7×7 stride-1 conv via the free-view coarse 3×3 conv_core5.

    x: (B, H, W, Cin) with H, W divisible by block; w: (7,7,Cin,Cout).
    Same map as PadConv(kernel=7, pad=3) — parity-tested against the
    lax.conv reference (tests/unit/test_conv_pallas.py).
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    b = block
    # zero-pad one coarse cell per side (cheap — XLA reflect pads measured
    # ~7x the zero-pad cost, BASELINE.md); reflect content is assembled
    # in-kernel from the VMEM-resident plane when pad_mode="reflect".
    xp = jnp.pad(x, ((0, 0), (b, b), (b, b), (0, 0)))
    x5 = _free_view(xp, b)                 # (B, h/b+2, b, w/b+2, b·Cin)
    wc = coarse_weights_7x7(w, b=b).astype(x.dtype)
    cb = None if bias is None else jnp.tile(bias.astype(jnp.float32), b * b)
    y5 = conv_core5(x5, wc, 3, b, mirror=pad_mode == "reflect", bias=cb)
    return y5.reshape(n, h, wd, cout).astype(x.dtype)


def coarse_weights_3x3s2(w: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) stride-2 pad-1 kernel → free-view coarse 2×2 matrix
    (2·2·2·(2·Cin), Cout). Output I reads padded rows 2I+1+d (pad lo=2):
    coarse cell I + ciu, row-subpixel fu with 2·ciu + fu = d + 1."""
    k, _, cin, cout = w.shape
    sel = np.zeros((2, 2, 3), np.float32)  # [ci, f, d]
    for d in range(3):
        ci, f = divmod(1 + d, 2)
        sel[ci, f, d] = 1.0
    sel = jnp.asarray(sel)
    wc = jnp.einsum("aeu,bfv,uvcd->aebfcd", sel, sel, w.astype(jnp.float32))
    return wc.reshape(2 * 2 * 2 * 2 * cin, cout).astype(w.dtype)


def conv3s2_s2d(x: jax.Array, w: jax.Array, bias: jax.Array | None
                ) -> jax.Array:
    """pad-1 3×3 stride-2 conv (the d128/d256 downsample) via the
    free-view coarse 2×2 conv_core5. x: (B, H, W, Cin); w: (3,3,Cin,Cout);
    zero padding; output (B, H/2, W/2, Cout). Pads (2, 0) so the coarse
    output is exactly H/2 (no ragged strips).

    NOTE: measured ~on-par-or-slower than XLA's stride-2 lowering on chip
    (BASELINE.md round 2) — kept for completeness and tests, but the
    model's "pallas" routing does NOT select it."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (2, 0), (2, 0), (0, 0)))
    x5 = _free_view(xp, 2)                 # (B, h/2+1, 2, w/2+1, 2·Cin)
    wc = coarse_weights_3x3s2(w).astype(x.dtype)
    y5 = conv_core5(x5, wc, 2, 1)          # (B, h/2, 1, w/2, Cout)
    y = y5[:, :, 0]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(x.dtype)
