"""InceptionV3-FID extractor: shape contract + weight-file round-trip
(the zero-egress path: weights come from an .npz with flattened keys)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def inception():
    from uig.eval.inception import init_inception

    return init_inception()


def test_pool3_feature_shape(inception):
    apply_fn, params = inception
    x = jnp.zeros((2, 299, 299, 3))
    f = apply_fn(params, x)
    assert f.shape == (2, 2048)


def test_resizes_other_inputs(inception):
    apply_fn, params = inception
    f = apply_fn(params, jnp.zeros((1, 64, 64, 3)))
    assert f.shape == (1, 2048)


def test_weights_npz_roundtrip(inception, tmp_path):
    from uig.eval.inception import _flatten, init_inception

    _, params = inception
    flat = {"/".join(map(str, path)): np.asarray(leaf)
            for path, leaf in _flatten(params)}
    # perturb one param so we can verify the file actually loads
    key = sorted(flat)[0]
    flat[key] = flat[key] + 1.0
    path = os.path.join(tmp_path, "inception.npz")
    np.savez(path, **flat)

    apply2, params2 = init_inception(str(path))
    flat2 = {"/".join(map(str, p)): np.asarray(l)
             for p, l in _flatten(params2)}
    np.testing.assert_allclose(flat2[key], flat[key])
    out = apply2(params2, jnp.zeros((1, 299, 299, 3)))
    assert out.shape == (1, 2048)


def test_missing_param_in_weights_raises(inception, tmp_path):
    from uig.eval.inception import init_inception

    path = os.path.join(tmp_path, "bad.npz")
    np.savez(path, not_a_param=np.zeros(3))
    with pytest.raises(KeyError):
        init_inception(str(path))
