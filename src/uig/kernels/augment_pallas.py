"""Pallas/Mosaic fused augmentation kernel (TPU path of uig.kernels.augment).

Implemented in a later milestone commit (M3 per SURVEY.md §7); until then
``pallas_supported()`` gates callers back to the XLA-fused implementation,
which is already a single fused kernel under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pallas_supported() -> bool:
    return False


def augment_batch_pallas(images, key, crop, out_dtype=jnp.float32):
    raise NotImplementedError("pallas augment lands in M3; use impl='xla'")
