"""Pallas/Mosaic fused augmentation kernel — the TPU path of
uig.kernels.augment (SURVEY.md §2 "Fused augmentation kernel"; M3 of §7).

One kernel instance per batch element (grid = (B,)): the (C, H, W) uint8
plane is staged into VMEM, the per-example random crop window is taken with
dynamic slices, the horizontal flip is a lane reversal selected by a
prefetched flag, and normalization to [-1, 1] happens on the same VMEM-
resident values — one HBM read of the source plane, one HBM write of the
crop, zero intermediate round-trips.

Layout note: the kernel runs in CHW so W (the crop/flip axis) sits on the
lane dimension; the cheap NHWC↔NCHW transposes happen in XLA outside. Crop
offsets/flip flags are computed with the functional jax PRNG outside and
enter through scalar prefetch (SMEM) so the index math is ready before the
kernel body runs.

Parity: tests/unit/test_augment_pallas.py checks bit-identical output vs the
XLA implementation (interpret mode on CPU; compiled on the real chip via
scripts/tpu_kernel_parity.py).
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


def _augment_kernel(meta_ref, in_ref, out_ref, *, crop: int, width: int,
                    out_dtype):
    b = pl.program_id(0)
    oy = meta_ref[b, 0]
    ox = meta_ref[b, 1]
    flip = meta_ref[b, 2]

    del width
    # (C, crop, crop) window via 2-D dynamic ref slice (Mosaic supports
    # pl.ds on refs, not lax.dynamic_slice/rev on register values).
    straight = in_ref[0, :, pl.ds(oy, crop), pl.ds(ox, crop)]
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    val = straight.astype(jnp.int32).astype(jnp.float32) * (2.0 / 255.0) - 1.0
    # Horizontal flip as an MXU matmul with the antidiagonal permutation
    # matrix (lane reversal has no Mosaic primitive; a crop×crop 0/1 matmul
    # is exact in fp32 and ~100 MFLOPs at 256² — noise next to the DMA).
    # Matches the XLA path's patch[:, ::-1] within the window.
    c = val.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (crop, crop), 1)
    rev = (row + col == crop - 1).astype(jnp.float32)
    flipped = jnp.dot(
        val.reshape(c * crop, crop), rev, preferred_element_type=jnp.float32
    ).reshape(val.shape)
    out_ref[0] = jnp.where(flip > 0, flipped, val).astype(out_dtype)


def augment_batch_pallas(images: jax.Array, key: jax.Array, crop: int,
                         out_dtype=jnp.float32, flip: bool = True) -> jax.Array:
    """uint8 NHWC (B, H, W, C) -> out_dtype NHWC (B, crop, crop, C) in [-1,1].

    Numerics match uig.kernels.augment.augment_batch exactly (same key ->
    same offsets/flips -> same pixels).
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

    nchw = jnp.transpose(images, (0, 3, 1, 2))  # W onto lanes
    kernel = functools.partial(
        _augment_kernel, crop=crop, width=w, out_dtype=jnp.dtype(out_dtype)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, meta: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, crop, crop),
                               lambda i, meta: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, crop, crop), jnp.dtype(out_dtype)),
        interpret=jax.default_backend() == "cpu",
    )(meta, nchw)
    return jnp.transpose(out, (0, 2, 3, 1))
