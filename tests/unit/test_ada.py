"""Unit tests for train/ada.py — differentiable D-input augmentation + the
ADA controller (DiffAugment / StyleGAN2-ADA recipes; see module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.train import ada

ALL_OPS = ("color", "translation", "cutout", "xflip")


def _imgs(b=4, s=16, c=3, seed=0):
    # distinctive values (all unique) so translation/flip provenance is checkable
    x = jnp.arange(b * s * s * c, dtype=jnp.float32).reshape(b, s, s, c)
    return x / x.size * 2.0 - 1.0


def test_p0_is_bit_exact_identity():
    x = _imgs()
    for ops in (ALL_OPS, ("color",), ("translation",), ("cutout",), ("xflip",)):
        y = ada.diff_augment(x, jax.random.PRNGKey(1), 0.0, ops)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_p1_changes_every_image():
    x = _imgs()
    for op in ALL_OPS:
        y = ada.diff_augment(x, jax.random.PRNGKey(2), 1.0, (op,))
        diff = np.abs(np.asarray(y) - np.asarray(x)).reshape(x.shape[0], -1)
        # each op at p=1 draws per-image params; all images should change
        # (prob of an exact-identity draw is ~0 for color, and the int draws
        # can be 0 for translation — allow one unchanged image there)
        changed = (diff.max(axis=1) > 0).sum()
        assert changed >= x.shape[0] - 1, (op, changed)


def test_translation_pixels_come_from_input_or_zero():
    x = _imgs(b=8, s=12)
    y = ada.diff_augment(x, jax.random.PRNGKey(3), 1.0, ("translation",))
    xin = set(np.asarray(x).ravel().tolist())
    for img in np.asarray(y):
        vals = set(img.ravel().tolist())
        assert vals <= (xin | {0.0})


def test_cutout_zeroes_a_clipped_square():
    s = 16
    x = jnp.ones((4, s, s, 3), jnp.float32)
    y = np.asarray(ada.diff_augment(x, jax.random.PRNGKey(4), 1.0, ("cutout",)))
    hole = int(0.5 * s + 0.5)
    for img in y:
        zeros = int((img == 0).sum()) // 3  # per-channel identical mask
        # center is uniform over the image => at least the in-bounds quarter
        assert (hole - hole // 2) ** 2 <= zeros <= hole * hole


def test_xflip_is_a_mirror():
    x = _imgs(b=2, s=8)
    y = ada.diff_augment(x, jax.random.PRNGKey(5), 1.0, ("xflip",))
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x[:, :, ::-1, :]))


def test_deterministic_in_key_and_traced_p():
    x = _imgs()
    p = jnp.asarray(0.7, jnp.float32)  # traced scalar, as in the train step

    @jax.jit
    def f(x, p):
        return ada.diff_augment(x, jax.random.PRNGKey(6), p, ALL_OPS)

    np.testing.assert_array_equal(np.asarray(f(x, p)), np.asarray(f(x, p)))


def test_differentiable_in_x():
    x = _imgs(b=2, s=8)

    def loss(x):
        return jnp.sum(ada.diff_augment(x, jax.random.PRNGKey(7), 1.0, ALL_OPS) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0


def test_bf16_dtype_preserved():
    x = _imgs().astype(jnp.bfloat16)
    y = ada.diff_augment(x, jax.random.PRNGKey(8), 0.5, ALL_OPS)
    assert y.dtype == jnp.bfloat16


def test_parse_ops_validation():
    assert ada.parse_ada_ops("color, cutout") == ("color", "cutout")
    with pytest.raises(ValueError, match="unknown ops"):
        ada.parse_ada_ops("color,rot90")
    with pytest.raises(ValueError, match="empty"):
        ada.parse_ada_ops("")


def test_heuristic_sign_and_centers():
    # lsgan center 0.5: logits at 0.9 -> +1, at 0.1 -> -1
    hi = jnp.full((2, 4, 4, 1), 0.9)
    lo = jnp.full((2, 4, 4, 1), 0.1)
    assert float(ada.ada_heuristic(hi, "lsgan")) == pytest.approx(1.0)
    assert float(ada.ada_heuristic(lo, "lsgan")) == pytest.approx(-1.0)
    # hinge/vanilla center 0: 0.1 is confident-real
    assert float(ada.ada_heuristic(lo, "hinge")) == pytest.approx(1.0)
    # tuple of multi-scale maps averages
    assert float(ada.ada_heuristic((hi, lo), "lsgan")) == pytest.approx(0.0)
    with pytest.raises(ValueError, match="wgan"):
        ada.ada_heuristic(hi, "wgan")


def test_update_p_direction_and_clip():
    p = jnp.asarray(0.5, jnp.float32)
    up = ada.ada_update_p(p, jnp.asarray(0.9), 0.6, speed_kimg=1.0,
                          images_per_step=100)
    dn = ada.ada_update_p(p, jnp.asarray(0.1), 0.6, speed_kimg=1.0,
                          images_per_step=100)
    assert float(up) == pytest.approx(0.6)  # +100/1000
    assert float(dn) == pytest.approx(0.4)
    # clips to [0, 1]
    hi = ada.ada_update_p(jnp.asarray(0.99), jnp.asarray(1.0), 0.6, 0.01, 100)
    lo = ada.ada_update_p(jnp.asarray(0.01), jnp.asarray(-1.0), 0.6, 0.01, 100)
    assert float(hi) == 1.0 and float(lo) == 0.0
