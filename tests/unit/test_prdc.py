"""PRDC (precision/recall/density/coverage) — analytic and interface tests.

Kynkäänniemi et al. 2019 (improved P&R) + Naeem et al. 2020 (D&C)
semantics, checked on constructions where the right answer is known.
"""

import jax
import numpy as np
import pytest

from uig.eval.prdc import _knn_radii, compute_prdc, prdc_from_features


def test_identical_sets_are_perfect():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 8))
    out = prdc_from_features(x, x.copy(), k=3)
    assert out["precision"] == 1.0
    assert out["recall"] == 1.0
    assert out["coverage"] == 1.0
    # Every fake sits AT a real point, so its ball membership count is at
    # least its own k neighbors → density >= 1.
    assert out["density"] >= 1.0


def test_disjoint_far_sets_are_zero():
    rng = np.random.default_rng(1)
    real = rng.normal(size=(48, 8))
    fake = rng.normal(size=(48, 8)) + 1000.0
    out = prdc_from_features(real, fake, k=3)
    assert out == {"precision": 0.0, "recall": 0.0,
                   "density": 0.0, "coverage": 0.0}


def test_mode_drop_hits_recall_not_precision():
    """Fakes covering one of two real modes: precision stays ~1 (every fake
    lies on the real manifold) while recall/coverage drop toward the
    covered mode's share — the decomposition FID cannot show."""
    rng = np.random.default_rng(2)
    mode_a = rng.normal(size=(100, 4)) * 0.1
    mode_b = rng.normal(size=(100, 4)) * 0.1 + 50.0
    real = np.concatenate([mode_a, mode_b])
    fake = rng.normal(size=(200, 4)) * 0.1  # mode A only
    out = prdc_from_features(real, fake, k=5)
    assert out["precision"] > 0.95
    assert 0.3 < out["recall"] < 0.7
    assert 0.3 < out["coverage"] < 0.7


def test_knn_radii_analytic():
    # Points on a line at 0, 1, 3: 1-NN radii are [1, 1, 2].
    x = np.array([[0.0], [1.0], [3.0]])
    np.testing.assert_allclose(_knn_radii(x, 1), [1.0, 1.0, 2.0])
    # 2-NN radii: [3, 2, 3].
    np.testing.assert_allclose(_knn_radii(x, 2), [3.0, 2.0, 3.0])


def test_too_few_samples_is_loud():
    x = np.zeros((4, 3))
    with pytest.raises(ValueError, match="more than k=5"):
        prdc_from_features(x, np.zeros((32, 3)), k=5)
    with pytest.raises(ValueError, match="fake"):
        prdc_from_features(np.zeros((32, 3)), x, k=5)


def test_compute_prdc_stream_interface():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    feature_fn = jax.jit(lambda x: jnp.mean(x, axis=(1, 2)))

    def batches(loc):
        for _ in range(4):
            yield jnp.asarray(rng.normal(loc, 1.0, (8, 6, 6, 12)),
                              jnp.float32)

    same = compute_prdc(batches(0.0), batches(0.0), feature_fn, k=3)
    far = compute_prdc(batches(0.0), batches(30.0), feature_fn, k=3)
    assert same["precision"] > far["precision"]
    assert same["coverage"] > far["coverage"]
    assert far["precision"] == far["recall"] == 0.0


def test_compute_prdc_empty_stream_is_loud():
    feature_fn = jax.jit(lambda x: x.mean(axis=(1, 2)))
    with pytest.raises(ValueError, match="empty image stream"):
        compute_prdc(iter(()), iter(()), feature_fn)
