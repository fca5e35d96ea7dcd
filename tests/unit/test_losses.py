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
    # "wgan" became a real mode in round 3 (StarGAN); use a true unknown
    with pytest.raises(ValueError):
        gan_loss_g(jnp.zeros(3), "wgan_gp_typo")


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


def test_r1_penalty_linear_discriminator():
    """For D(x) = <w, x> per-example, grad_x D = w, so R1 = 0.5*||w||^2
    regardless of the inputs."""
    import jax
    import jax.numpy as jnp

    from uig.train.losses import r1_penalty

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 4, 3)), jnp.float32)

    def d_apply(params, x):
        return jnp.sum(x * params, axis=(1, 2, 3))

    x = jnp.asarray(rng.standard_normal((5, 4, 4, 3)), jnp.float32)
    got = float(r1_penalty(d_apply, w, x))
    want = 0.5 * float(jnp.sum(jnp.square(w)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_d_lr_ratio_scales_schedule():
    from uig.config import get_preset
    from uig.train.state import lr_schedule

    opt = get_preset("smoke64").opt
    base = lr_schedule(opt)(0)
    half = lr_schedule(opt, 0.5)(0)
    np.testing.assert_allclose(float(half), float(base) * 0.5, rtol=1e-6)


def test_lr_decay_shapes_and_warmup():
    import dataclasses

    from uig.config.config import OptConfig
    from uig.train.state import lr_schedule

    opt = OptConfig(lr=1e-3, total_steps=100, decay_start_step=50)
    lin = lr_schedule(opt)
    # linear: flat, then linear to 0
    np.testing.assert_allclose(float(lin(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lin(50)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(lin(75)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(lin(100)), 0.0, atol=1e-12)

    cos = lr_schedule(dataclasses.replace(opt, lr_decay="cosine"))
    np.testing.assert_allclose(float(cos(50)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(cos(75)), 5e-4, rtol=1e-6)  # half-cosine midpoint
    np.testing.assert_allclose(float(cos(100)), 0.0, atol=1e-12)
    # cosine decays slower than linear early, faster late
    assert float(cos(60)) > float(lin(60))
    assert float(cos(95)) < float(lin(95))

    const = lr_schedule(dataclasses.replace(opt, lr_decay="constant"))
    np.testing.assert_allclose(float(const(99)), 1e-3, rtol=1e-6)

    warm = lr_schedule(dataclasses.replace(opt, warmup_steps=10))
    np.testing.assert_allclose(float(warm(0)), 1e-4, rtol=1e-6)  # (0+1)/10
    np.testing.assert_allclose(float(warm(4)), 5e-4, rtol=1e-6)
    np.testing.assert_allclose(float(warm(9)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(warm(20)), 1e-3, rtol=1e-6)
    # warmup composes with decay
    np.testing.assert_allclose(float(warm(75)), 5e-4, rtol=1e-6)

    with pytest.raises(ValueError, match="lr_decay"):
        lr_schedule(dataclasses.replace(opt, lr_decay="step"))
    with pytest.raises(ValueError, match="warmup_steps"):
        lr_schedule(dataclasses.replace(opt, warmup_steps=-1))


def test_cut_patch_ids_without_replacement_lower_floor():
    """VERDICT round-2 item 9: sampling NCE patch locations WITHOUT
    replacement (sample_patch_ids) gives distinct ids and a measurably
    lower loss floor than with-replacement draws (duplicates put the
    positive key into the negative set with identical logits)."""
    import jax

    from uig.train.cut import _sample_patches, sample_patch_ids
    from uig.train.losses import patch_nce_loss

    key = jax.random.PRNGKey(0)
    idx = sample_patch_ids(key, 4, 64 * 64, 256)
    for row in np.asarray(idx):
        assert len(set(row.tolist())) == 256  # no duplicates

    # perfectly-aligned q == k: the floor is set purely by logit ties
    feat = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 8))
    n = 64
    idx_u = sample_patch_ids(key, 4, 256, n)
    idx_r = jax.random.randint(key, (4, n), 0, 256)  # old behavior
    q_u = _sample_patches(feat, idx_u)
    q_r = _sample_patches(feat, idx_r)
    loss_u = float(patch_nce_loss(q_u, q_u))
    loss_r = float(patch_nce_loss(q_r, q_r))
    assert loss_u < loss_r, (loss_u, loss_r)
