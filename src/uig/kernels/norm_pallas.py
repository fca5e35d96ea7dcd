"""Pallas instance norm for FULL-RESOLUTION activations.

The honest on-chip breakdown (BASELINE.md round 2) measured XLA's
InstanceNorm at 256²×64 at 0.88 ms for B=16 — ~21× worse than its
bandwidth bound (reduction sweeps re-reading the plane through HBM with
fp32 materialization). Inside the trunk resblocks XLA fuses IN into the
surrounding convs well; it is the stem/downsample/upsample INs on
256²/128² planes that pay this cost.

This kernel does it in one VMEM residency per example: read the bf16 plane
once, fp32 moments on-chip, normalize + affine (+ optional relu), write
once. TPU detail: a C=64 plane wastes half of every 128-lane vreg, so for
C < 128 the plane is viewed (free reshape) as (H·W·C/128, 128) — P=128/C
pixels packed per lane row — and the per-channel moments fold the P lane
groups; params are lane-tiled to match. Backward is a second kernel using
the standard IN gradient
    dx = r·γ·(dŷ − mean(dŷ) − x̂·mean(dŷ·x̂))
with dγ/dβ accumulated across the batch grid in VMEM-resident outputs.

Numerics match uig.models.layers.InstanceNorm (fp32 stats from the
compute-dtype tensor, eps inside rsqrt). Parity:
tests/unit/test_conv_pallas.py; compiled via scripts/tpu_kernel_parity.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


def _fold(v, p, c):
    """(P*C,) lane vector -> (C,) sum over the P packed pixel slots."""
    out = v[:c]
    for i in range(1, p):
        out = out + v[i * c:(i + 1) * c]
    return out


def _tile(v, p):
    return jnp.concatenate([v] * p) if p > 1 else v


def _in_fwd_kernel(x_ref, g_ref, b_ref, o_ref, *, eps, relu, p, c, n):
    x32 = x_ref[0].astype(jnp.float32)            # (R, P*C)
    s1 = _fold(jnp.sum(x32, axis=0), p, c)        # (C,)
    s2 = _fold(jnp.sum(jnp.square(x32), axis=0), p, c)
    m = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(m), 0.0)
    r = jax.lax.rsqrt(var + eps)
    scale = _tile(r * g_ref[0, :c], p)
    shift = _tile(b_ref[0, :c] - m * r * g_ref[0, :c], p)
    y = x32 * scale + shift
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _in_bwd_kernel(x_ref, g_ref, b_ref, dy_ref, dx_ref, dg_ref, db_ref,
                   *, eps, relu, p, c, n):
    i = pl.program_id(0)
    x32 = x_ref[0].astype(jnp.float32)
    dy = dy_ref[0].astype(jnp.float32)
    s1 = _fold(jnp.sum(x32, axis=0), p, c)
    s2 = _fold(jnp.sum(jnp.square(x32), axis=0), p, c)
    m = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(m), 0.0)
    r = jax.lax.rsqrt(var + eps)
    g = g_ref[0, :c]
    xhat = (x32 - _tile(m, p)) * _tile(r, p)
    if relu:
        y = xhat * _tile(g, p) + _tile(b_ref[0, :c], p)
        dy = jnp.where(y > 0, dy, 0.0)
    dyh = dy * _tile(g, p)
    mean_dyh = _fold(jnp.sum(dyh, axis=0), p, c) / n
    mean_dyh_x = _fold(jnp.sum(dyh * xhat, axis=0), p, c) / n
    dx = _tile(r, p) * (dyh - _tile(mean_dyh, p) - xhat * _tile(mean_dyh_x, p))
    dx_ref[0] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref[...])
        db_ref[...] = jnp.zeros_like(db_ref[...])

    dg_ref[0, :c] += _fold(jnp.sum(dy * xhat, axis=0), p, c)
    db_ref[0, :c] += _fold(jnp.sum(dy, axis=0), p, c)


def _packing(shape):
    """(B, H, W, C) -> (pack P, rows R) for the lane-packed (B, R, P*C)
    free view; P=1 means plain (B, H*W, C)."""
    _, h, w, c = shape
    if c < 128 and 128 % c == 0 and (h * w) % (128 // c) == 0:
        p = 128 // c
    else:
        p = 1
    return p, (h * w) // p


def _in_call(kernel, x, gamma, beta, eps, relu, extra_in=(), extra_out=None):
    b, h, w, c = x.shape
    p, rows = _packing(x.shape)
    n = float(h * w)
    x2 = x.reshape(b, rows, p * c)
    g2 = gamma.reshape(1, c).astype(jnp.float32)
    b2 = beta.reshape(1, c).astype(jnp.float32)
    vspec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    pspec = pl.BlockSpec((1, rows, p * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kern = functools.partial(kernel, eps=eps, relu=relu, p=p, c=c, n=n)
    in_specs = [pspec, vspec, vspec] + [pspec] * len(extra_in)
    if extra_out is None:
        out_specs = pspec
        out_shape = jax.ShapeDtypeStruct((b, rows, p * c), x.dtype)
    else:
        out_specs = [pspec, vspec, vspec]
        out_shape = [jax.ShapeDtypeStruct((b, rows, p * c), x.dtype),
                     jax.ShapeDtypeStruct((1, c), jnp.float32),
                     jax.ShapeDtypeStruct((1, c), jnp.float32)]
    res = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_is_cpu(),
    )(x2, g2, b2, *extra_in)
    return res, (b, h, w, c)


def _fwd_impl(x, gamma, beta, *, eps, relu):
    y, (b, h, w, c) = _in_call(_in_fwd_kernel, x, gamma, beta, eps, relu)
    return y.reshape(b, h, w, c)


def _bwd_impl(x, gamma, beta, dy, *, eps, relu):
    b, h, w, c = x.shape
    p, rows = _packing(x.shape)
    dy2 = dy.reshape(b, rows, p * c)
    (dx, dg, db), _ = _in_call(_in_bwd_kernel, x, gamma, beta, eps, relu,
                               extra_in=(dy2,), extra_out=True)
    return dx.reshape(b, h, w, c), dg.reshape(c), db.reshape(c)


@functools.lru_cache(maxsize=None)
def _make_instance_norm(eps: float, relu: bool):
    @jax.custom_vjp
    def inorm(x, gamma, beta):
        return _fwd_impl(x, gamma, beta, eps=eps, relu=relu)

    def fwd(x, gamma, beta):
        return inorm(x, gamma, beta), (x, gamma, beta)

    def bwd(res, dy):
        x, gamma, beta = res
        dx, dg, db = _bwd_impl(x, gamma, beta, dy, eps=eps, relu=relu)
        return dx, dg.astype(gamma.dtype), db.astype(beta.dtype)

    inorm.defvjp(fwd, bwd)
    return inorm


def instance_norm_pallas(x: jax.Array, gamma: jax.Array, beta: jax.Array,
                         eps: float = 1e-5, relu: bool = False) -> jax.Array:
    """Per-example-per-channel normalization over (H, W), affine, optional
    fused relu. Matches uig.models.layers.InstanceNorm numerics."""
    return _make_instance_norm(float(eps), bool(relu))(x, gamma, beta)
