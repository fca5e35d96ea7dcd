import jax
import jax.numpy as jnp
import numpy as np

from uig.kernels.augment import (
    augment_batch,
    center_crop_normalize,
    denormalize_to_u8,
    resize_bilinear,
)


def _imgs(b=4, h=12, w=12, c=3, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).integers(0, 256, (b, h, w, c), dtype=np.uint8)
    )


def test_output_shape_dtype_range():
    x = _imgs()
    y = augment_batch(x, jax.random.PRNGKey(0), crop=8)
    assert y.shape == (4, 8, 8, 3) and y.dtype == jnp.float32
    assert float(y.min()) >= -1.0 and float(y.max()) <= 1.0


def test_crops_are_windows_of_input():
    """Every output must equal SOME crop window (possibly flipped) of input."""
    x = _imgs(b=2, h=10, w=10)
    y = augment_batch(x, jax.random.PRNGKey(1), crop=6)
    xf = np.asarray(x).astype(np.float32) * (2.0 / 255.0) - 1.0
    for i in range(2):
        found = False
        for oy in range(5):
            for ox in range(5):
                win = xf[i, oy : oy + 6, ox : ox + 6]
                out = np.asarray(y[i])
                if np.allclose(win, out, atol=1e-6) or np.allclose(
                    win[:, ::-1], out, atol=1e-6
                ):
                    found = True
        assert found, f"example {i} is not a crop/flip window of its input"


def test_flip_happens_sometimes():
    x = _imgs(b=32, h=8, w=8)
    y = augment_batch(x, jax.random.PRNGKey(2), crop=8)  # crop == size: offset 0
    xf = np.asarray(x).astype(np.float32) * (2.0 / 255.0) - 1.0
    flips = sum(
        np.allclose(np.asarray(y[i]), xf[i, :, ::-1], atol=1e-6) for i in range(32)
    )
    assert 4 < flips < 28  # ~Binomial(32, .5)


def test_center_crop_deterministic():
    x = _imgs(b=1, h=10, w=10)
    y1 = center_crop_normalize(x, 6)
    y2 = center_crop_normalize(x, 6)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    xf = np.asarray(x).astype(np.float32) * (2.0 / 255.0) - 1.0
    np.testing.assert_allclose(np.asarray(y1[0]), xf[0, 2:8, 2:8], atol=1e-6)


def test_denormalize_roundtrip():
    x = _imgs(b=1, h=4, w=4)
    y = center_crop_normalize(x, 4)
    back = denormalize_to_u8(y)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_resize_bilinear_shapes():
    x = _imgs(b=2, h=9, w=9)
    y = resize_bilinear(x, 16)
    assert y.shape == (2, 16, 16, 3) and y.dtype == jnp.uint8
