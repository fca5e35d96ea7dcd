"""Pallas/Mosaic fused augmentation kernel — the TPU path of
uig.kernels.augment (SURVEY.md §2 "Fused augmentation kernel"; M3 of §7).

Grid = (B,): each instance stages one image in its NATIVE NHWC byte layout,
viewed as an (H, W·C) plane — lanes hold the interleaved W·C axis, so no
transpose is ever materialized (a uint8 NHWC→NCHW transpose alone costs more
than the whole augmentation). Random crop AND horizontal flip are two exact
0/1 *selector matmuls* on the MXU:

    out = R @ X @ S,  R[i,h] = [h == oy+i],
                      S = kron([w == ox+j'], I_C),  j' = j or crop-1-j (flip)

This is deliberate TPU-native design: this Mosaic backend cannot lower
dynamic ref slices or lane reversals (verified by bisection on hardware),
but 0/1 selector matmuls are exact in fp32, fuse crop+flip+channel-
preservation into one op, and cost ~3.7 GFLOP per 256² batch-8 step — noise
next to the HBM traffic the kernel saves. Crop offsets / flip flags derive
from the same functional PRNG draw as the XLA path and enter through scalar
prefetch (SMEM), so both implementations produce identical pixels for the
same key.

Parity: tests/unit/test_augment_pallas.py (interpret mode, CPU) and
scripts/tpu_kernel_parity.py (compiled, real chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_supported() -> bool:
    """Pallas TPU path is used on TPU backends; elsewhere augment falls back
    to the XLA-fused implementation (identical numerics)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _augment_kernel(meta_ref, in_ref, out_ref, *, crop: int, height: int,
                    width: int, channels: int, out_dtype):
    b = pl.program_id(0)
    oy = meta_ref[b, 0]
    ox = meta_ref[b, 1]
    flip = meta_ref[b, 2]
    c = channels

    # native NHWC lane layout: the plane is (H, W·C) — no transpose anywhere
    x = in_ref[0].astype(jnp.int32).astype(jnp.float32)  # (H, W*C)

    # row selector R (crop, H): picks rows oy..oy+crop-1
    i_ids = jax.lax.broadcasted_iota(jnp.int32, (crop, height), 0)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (crop, height), 1)
    r_sel = (h_ids == i_ids + oy).astype(jnp.float32)

    # interleaved column selector S (W·C, crop·C) = kron([w == ox+j'], I_C):
    # picks column-groups ox..ox+crop-1 channel-preservingly, reversed when
    # flipping (flip folds into the same matmul)
    wc_ids = jax.lax.broadcasted_iota(jnp.int32, (width * c, crop * c), 0)
    jc_ids = jax.lax.broadcasted_iota(jnp.int32, (width * c, crop * c), 1)
    w_ids = wc_ids // c
    j_ids = jc_ids // c
    same_ch = (wc_ids % c) == (jc_ids % c)
    j_eff = jnp.where(flip > 0, crop - 1 - j_ids, j_ids)
    s_sel = ((w_ids == j_eff + ox) & same_ch).astype(jnp.float32)

    y = jnp.dot(r_sel, x, preferred_element_type=jnp.float32)  # (crop, W*C)
    z = jnp.dot(y, s_sel, preferred_element_type=jnp.float32)  # (crop, crop*C)
    out_ref[0] = (z * (2.0 / 255.0) - 1.0).astype(out_dtype)


def augment_batch_pallas(images: jax.Array, key: jax.Array, crop: int,
                         out_dtype=jnp.float32, flip: bool = True) -> jax.Array:
    """uint8 NHWC (B, H, W, C) -> out_dtype NHWC (B, crop, crop, C) in [-1,1].

    Numerics match uig.kernels.augment.augment_batch (same key -> same
    offsets/flips -> same pixels, up to 1 ulp of fma ordering).
    """
    b, h, w, c = images.shape
    if h < crop or w < crop:
        raise ValueError(f"crop {crop} exceeds input {h}x{w}")

    # identical offset/flip derivation as the XLA path (parity requirement)
    k_off, k_flip = jax.random.split(key)
    oy = jax.random.randint(k_off, (b,), 0, h - crop + 1)
    ox = jax.random.fold_in(k_off, 1)
    ox = jax.random.randint(ox, (b,), 0, w - crop + 1)
    if flip:
        do_flip = jax.random.bernoulli(k_flip, 0.5, (b,)).astype(jnp.int32)
    else:
        do_flip = jnp.zeros((b,), jnp.int32)
    meta = jnp.stack([oy.astype(jnp.int32), ox.astype(jnp.int32), do_flip], 1)

    # (B, H, W, C) -> (B, H, W*C) is a free view of the same NHWC bytes:
    # lanes hold the interleaved W*C axis, so no transpose ever materializes
    flat = images.reshape(b, h, w * c)
    kernel = functools.partial(
        _augment_kernel, crop=crop, height=h, width=w, channels=c,
        out_dtype=jnp.dtype(out_dtype),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * c), lambda i, meta: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, crop, crop * c),
                               lambda i, meta: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, crop, crop * c),
                                       jnp.dtype(out_dtype)),
        interpret=jax.default_backend() == "cpu",
    )(meta, flat)
    return out.reshape(b, crop, crop, c)
