import jax.numpy as jnp
import numpy as np
import pytest

from uig.train.losses import (
    cycle_loss,
    gan_loss_d,
    gan_loss_g,
    identity_loss,
    patch_nce_loss,
)


def test_lsgan_hand_values():
    fake = jnp.array([0.0, 1.0])
    # G: mean((y-1)^2) = (1 + 0)/2
    assert np.isclose(gan_loss_g(fake, "lsgan"), 0.5)
    real = jnp.array([1.0, 0.0])
    # D: 0.5*(mean((r-1)^2) + mean(f^2)) = 0.5*(0.5 + 0.5)
    assert np.isclose(gan_loss_d(real, fake, "lsgan"), 0.5)


def test_vanilla_matches_bce():
    logits = jnp.array([0.3, -1.2, 2.0])
    g = gan_loss_g(logits, "vanilla")
    expect = -np.mean(np.log(1 / (1 + np.exp(-np.asarray(logits)))))
    assert np.isclose(g, expect, rtol=1e-6)


def test_hinge():
    real = jnp.array([2.0, 0.5])
    fake = jnp.array([-2.0, 0.5])
    # D: 0.5*(mean(relu(1-r)) + mean(relu(1+f))) = 0.5*(0.25 + 0.75)
    assert np.isclose(gan_loss_d(real, fake, "hinge"), 0.5)
    assert np.isclose(gan_loss_g(fake, "hinge"), 0.75)


def test_cycle_identity_l1():
    a = jnp.zeros((2, 4, 4, 3))
    b = jnp.ones((2, 4, 4, 3)) * 0.5
    assert np.isclose(cycle_loss(a, b), 0.5)
    assert np.isclose(identity_loss(a, b), 0.5)


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        gan_loss_g(jnp.zeros(3), "wgan")


def test_patch_nce_perfect_alignment_low_loss():
    import jax

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (2, 16, 8))
    # identical features: positives have max similarity -> loss near 0 at low T
    loss_aligned = patch_nce_loss(q, q, temperature=0.01)
    k2 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    loss_random = patch_nce_loss(q, k2, temperature=0.01)
    assert loss_aligned < 0.01
    assert loss_random > loss_aligned
