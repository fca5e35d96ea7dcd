import jax
import jax.numpy as jnp
import numpy as np

from uig.eval.fid import FIDStats, RandomFeatureNet, frechet_distance


def test_frechet_zero_for_identical():
    mu = np.array([1.0, -2.0, 3.0])
    cov = np.array([[2.0, 0.3, 0.0], [0.3, 1.0, 0.1], [0.0, 0.1, 0.5]])
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-6


def test_frechet_mean_shift_analytic():
    # identity covariances: d^2 = |mu1-mu2|^2
    d = 4
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    eye = np.eye(d)
    got = frechet_distance(mu1, eye, mu2, eye)
    assert abs(got - 16.0) < 1e-4


def test_frechet_cov_analytic():
    # mu equal; cov1 = a*I, cov2 = b*I: d^2 = d*(a + b - 2*sqrt(ab))
    d = 3
    a, b = 4.0, 1.0
    got = frechet_distance(np.zeros(d), a * np.eye(d), np.zeros(d), b * np.eye(d))
    assert abs(got - d * (a + b - 2 * np.sqrt(a * b))) < 1e-4


def test_streaming_stats_match_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 5))
    st = FIDStats(5)
    for i in range(0, 100, 7):
        st.update(x[i : i + 7])
    np.testing.assert_allclose(st.mean, x.mean(0), atol=1e-10)
    np.testing.assert_allclose(st.cov, np.cov(x, rowvar=False), atol=1e-10)


def test_random_feature_net_deterministic():
    net = RandomFeatureNet()
    p1 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    p2 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = jnp.ones((2, 32, 32, 3)) * 0.3
    f1 = net.apply(p1, x)
    f2 = net.apply(p2, x)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    assert f1.shape == (2, 768)


def test_fid_discriminates_distributions():
    """FID(real, real-like) << FID(real, different) with random features."""
    from uig.eval.fid import compute_fid

    net = RandomFeatureNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    feat = jax.jit(lambda x: net.apply(params, x))
    rng = np.random.default_rng(1)

    def batches(mean, n=4):
        for _ in range(n):
            yield jnp.asarray(
                np.clip(rng.normal(mean, 0.2, (8, 16, 16, 3)), -1, 1),
                jnp.float32)

    near = compute_fid(batches(0.0), batches(0.0), feat)
    far = compute_fid(batches(0.0), batches(0.8), feat)
    assert far > near


def test_lpips_basic():
    from uig.eval.lpips import make_lpips

    lp = make_lpips()
    x = jnp.zeros((1, 32, 32, 3))
    y = jnp.ones((1, 32, 32, 3)) * 0.5
    assert float(lp(x, x)) < 1e-10
    assert float(lp(x, y)) > 0


def test_kid_properties():
    """KID: ~0 for same-distribution samples, positive and larger for
    different distributions, unbiased estimator sanity."""
    from uig.eval.fid import kid_from_features

    rng = np.random.default_rng(0)
    a1 = rng.normal(size=(400, 16))
    a2 = rng.normal(size=(400, 16))
    b = rng.normal(loc=1.0, size=(400, 16))

    same_mean, same_std = kid_from_features(a1, a2, n_subsets=50,
                                            subset_size=100)
    diff_mean, _ = kid_from_features(a1, b, n_subsets=50, subset_size=100)
    # unbiased MMD² fluctuates around 0 for identical distributions
    assert abs(same_mean) < 5 * max(same_std, 1e-6)
    assert diff_mean > 10 * abs(same_mean)
    assert diff_mean > 0


def test_compute_kid_stream_interface():
    import jax.numpy as jnp

    from uig.eval.fid import compute_kid

    rng = np.random.default_rng(1)
    feature_fn = jax.jit(lambda x: jnp.mean(x, axis=(1, 2)))

    def batches(loc):
        for _ in range(4):
            yield jnp.asarray(rng.normal(loc, 1.0, (8, 6, 6, 12)),
                              jnp.float32)

    mean, std = compute_kid(batches(0.0), batches(0.0), feature_fn,
                            n_subsets=20, subset_size=16)
    assert np.isfinite(mean) and np.isfinite(std)
    mean2, _ = compute_kid(batches(0.0), batches(3.0), feature_fn,
                           n_subsets=20, subset_size=16)
    assert mean2 > mean


def test_compute_kid_empty_stream_is_loud():
    """A globally-empty (or single-image) stream must raise, not return the
    silent 0/0 NaN of the unbiased MMD estimator."""
    import jax.numpy as jnp
    import pytest

    from uig.eval.fid import compute_kid

    feature_fn = jax.jit(lambda x: jnp.mean(x, axis=(1, 2)))
    with pytest.raises(ValueError, match="empty image stream"):
        compute_kid(iter([]), iter([]), feature_fn)
    with pytest.raises(ValueError, match=">=2 real images"):
        compute_kid(iter([]), iter([]), feature_fn, feature_dim=12)
    one = jnp.zeros((1, 4, 4, 12))
    with pytest.raises(ValueError, match=">=2"):
        compute_kid(iter([one]), iter([one]), feature_fn, feature_dim=12)


def test_ref_stats_roundtrip_exact(tmp_path):
    """FID vs saved+reloaded real stats == FID vs the streamed reals,
    bit-for-bit (the npz stores the raw float64 sums, not derived moments)."""
    import jax.numpy as jnp

    from uig.eval.fid import compute_fid, stream_stats

    rng = np.random.default_rng(7)
    feature_fn = jax.jit(lambda x: jnp.mean(x, axis=(1, 2)))

    def batches(loc, seed):
        r = np.random.default_rng(seed)
        for _ in range(3):
            yield jnp.asarray(r.normal(loc, 1.0, (5, 4, 4, 12)), jnp.float32)

    st = stream_stats(batches(0.0, 1), feature_fn)
    path = str(tmp_path / "ref.npz")
    st.save(path, extractor="mean_pool", image_size=4)
    loaded, name, size = FIDStats.load(path)
    assert (name, size, loaded.n) == ("mean_pool", 4, st.n)
    np.testing.assert_array_equal(loaded.s, st.s)
    np.testing.assert_array_equal(loaded.ss, st.ss)

    direct = compute_fid(batches(0.0, 1), batches(2.0, 2), feature_fn)
    via_stats = compute_fid(None, batches(2.0, 2), feature_fn,
                            real_stats=loaded)
    assert via_stats == direct
    del rng


def test_ref_stats_bad_inputs_are_loud(tmp_path):
    import jax.numpy as jnp
    import pytest

    from uig.eval.fid import compute_fid

    bad = str(tmp_path / "bad.npz")
    np.savez(bad, foo=np.zeros(3))
    with pytest.raises(ValueError, match="not a uig fid-stats file"):
        FIDStats.load(bad)

    feature_fn = jax.jit(lambda x: jnp.mean(x, axis=(1, 2)))
    with pytest.raises(ValueError, match="real_batches or real_stats"):
        compute_fid(None, iter([jnp.zeros((2, 4, 4, 8))]), feature_fn)
