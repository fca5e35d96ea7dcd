"""Pallas fused-augment kernel vs the XLA reference implementation —
same pixels (same key -> same offsets/flips; fp32 fma ordering may differ by 1 ulp). Runs in
interpreter mode on CPU (SURVEY.md §4 "Kernel tests"); compiled-mode parity
on the real chip is scripts/tpu_kernel_parity.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.kernels.augment import augment_batch
from uig.kernels.augment_pallas import augment_batch_pallas


def _imgs(b=4, h=36, w=36, c=3, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 256, (b, h, w, c), dtype=np.uint8)
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("crop", [24, 32, 36])
def test_parity_with_xla(seed, crop):
    x = _imgs(seed=seed)
    key = jax.random.PRNGKey(seed)
    ref = augment_batch(x, key, crop)
    got = augment_batch_pallas(x, key, crop)
    # same offsets/flips/pixels; fp32 fma contraction may differ by 1 ulp
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-7)


def test_parity_bf16():
    x = _imgs()
    key = jax.random.PRNGKey(3)
    ref = augment_batch(x, key, 24, out_dtype=jnp.bfloat16)
    got = augment_batch_pallas(x, key, 24, out_dtype=jnp.bfloat16)
    # one bf16 ulp at |x|<=1 is 2^-8
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2**-8
    )


def test_no_flip_mode():
    x = _imgs()
    key = jax.random.PRNGKey(4)
    ref = augment_batch(x, key, 24, flip=False)
    got = augment_batch_pallas(x, key, 24, flip=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-7)


def test_crop_too_large_raises():
    with pytest.raises(ValueError):
        augment_batch_pallas(_imgs(), jax.random.PRNGKey(0), crop=64)
