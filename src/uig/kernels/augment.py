"""On-device fused image augmentation — L0 kernels (SURVEY.md §2 "Fused
augmentation kernel"; BASELINE.json north star: "the image input pipeline
(… resize, random-crop/flip, normalize to [-1,1]) moves on-device as fused
Pallas/XLA kernels so the TPU never stalls on host preprocessing").

Boundary (SURVEY.md §7 "Hard parts"): JPEG entropy decoding is hostile to TPU
vector units, so the host decodes + resizes to ``load_size``; *everything
after decode* — random crop, horizontal flip, normalize to [-1,1], dtype cast
— runs on device, fused into the training step's XLA program.

Two implementations, parity-tested against each other:
  * this module — pure XLA: per-example dynamic_slice (vmap) + select + fma.
    XLA fuses the whole thing into a single elementwise/gather kernel.
  * uig.kernels.augment_pallas — a Pallas/Mosaic kernel with scalar-prefetched
    crop offsets; crop+flip run as exact 0/1 selector matmuls on the MXU in
    the native NHWC lane layout (used on TPU).

The deterministic path (``center_crop_normalize``) is shared by training-time
eval and the translate CLI so inference preprocessing is pixel-identical to
training (north-star clause).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x: jax.Array, out_dtype) -> jax.Array:
    """uint8 [0,255] → out_dtype [-1, 1]."""
    return (x.astype(jnp.float32) * (2.0 / 255.0) - 1.0).astype(out_dtype)


def denormalize_to_u8(x: jax.Array) -> jax.Array:
    """float [-1,1] → uint8 [0,255] (inference output path)."""
    y = (x.astype(jnp.float32) + 1.0) * (255.0 / 2.0)
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)


def augment_batch(
    images: jax.Array,
    key: jax.Array,
    crop: int,
    out_dtype=jnp.float32,
    flip: bool = True,
) -> jax.Array:
    """Random crop + random horizontal flip + normalize, fused under jit.

    images: (B, H, W, C) uint8 with H, W >= crop.
    Returns (B, crop, crop, C) in [-1, 1] as ``out_dtype``.
    """
    b, h, w, c = images.shape
    k_off, k_flip = jax.random.split(key)
    oy = jax.random.randint(k_off, (b,), 0, h - crop + 1)
    ox = jax.random.fold_in(k_off, 1)
    ox = jax.random.randint(ox, (b,), 0, w - crop + 1)
    do_flip = jax.random.bernoulli(k_flip, 0.5, (b,)) if flip else jnp.zeros(
        (b,), bool
    )

    def one(img, y0, x0, f):
        patch = jax.lax.dynamic_slice(img, (y0, x0, 0), (crop, crop, c))
        patch = jnp.where(f, patch[:, ::-1, :], patch)
        return patch

    patches = jax.vmap(one)(images, oy, ox, do_flip)
    return _normalize(patches, out_dtype)


def center_crop_normalize(images: jax.Array, crop: int,
                          out_dtype=jnp.float32) -> jax.Array:
    """Deterministic eval/inference preprocessing: center crop + normalize."""
    b, h, w, c = images.shape
    y0 = (h - crop) // 2
    x0 = (w - crop) // 2
    patch = jax.lax.slice(
        images, (0, y0, x0, 0), (b, y0 + crop, x0 + crop, c)
    )
    return _normalize(patch, out_dtype)


def augment(images: jax.Array, key: jax.Array, crop: int, out_dtype=jnp.float32,
            impl: str = "xla") -> jax.Array:
    """Dispatch to the requested augmentation implementation.

    impl: "pallas" (TPU Mosaic kernel; falls back to XLA off-TPU),
          "xla" (fused gather/select), "none" (deterministic center crop).
    """
    if impl == "none":
        return center_crop_normalize(images, crop, out_dtype)
    if impl == "pallas":
        from uig.kernels.augment_pallas import augment_batch_pallas, pallas_supported

        if pallas_supported():
            return augment_batch_pallas(images, key, crop, out_dtype)
        impl = "xla"
    if impl == "xla":
        return augment_batch(images, key, crop, out_dtype)
    raise ValueError(f"unknown augment impl {impl!r}")


def resize_bilinear(images: jax.Array, size: int) -> jax.Array:
    """On-device bilinear resize to (size, size); accepts uint8 or float.

    Used when inputs arrive pre-decoded at a different fixed resolution
    (e.g. ArrayRecord shards at native size) — keeps the resize on the VPU
    instead of the host.
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    y = jax.image.resize(x, (b, size, size, c), method="bilinear")
    if jnp.issubdtype(images.dtype, jnp.integer):
        y = jnp.clip(jnp.round(y), 0, 255).astype(images.dtype)
    return y
