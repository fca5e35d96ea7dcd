"""NICE-GAN modules (models/nicegan.py): encoder/decoder/classifier
contracts — shapes, spectral-norm state advancement, tanh range, CAM
head, loud empty-logit-map failure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.models.nicegan import NICEClassifier, NICEDecoder, NICEEncoder


def test_encoder_shape_and_sn_state():
    enc = NICEEncoder(base_features=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    v = enc.init(jax.random.PRNGKey(0), x)
    z = enc.apply(v, x, False)
    assert z.shape == (2, 8, 8, 32)  # H/4, 4f
    # update_stats=True advances the power-iteration vectors
    z2, upd = enc.apply(v, x, True, mutable=["sn"])
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        v["sn"], upd["sn"])
    assert all(jax.tree_util.tree_leaves(changed))


def test_decoder_shape_range_and_rho_params():
    dec = NICEDecoder(base_features=8, n_res_blocks=2)
    z = jnp.asarray(np.random.default_rng(1).standard_normal((2, 8, 8, 32)),
                    jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), z)
    y = dec.apply(params, z)
    assert y.shape == (2, 32, 32, 3)
    assert float(jnp.max(jnp.abs(y))) <= 1.0  # tanh head
    # AdaLIN/ILN blend params exist for the RhoClipper
    names = [p[-1].key for p, _ in
             jax.tree_util.tree_flatten_with_path(params)[0]]
    assert names.count("rho") == 2 * 2 + 2  # 2/res block + 2 ILN upsamples


def test_classifier_logits_and_empty_map_error():
    cls = NICEClassifier(base_features=8)
    z = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 8, 32)),
                    jnp.float32)
    v = cls.init(jax.random.PRNGKey(0), z)
    logit, cam = cls.apply(v, z, False)
    assert logit.shape[0] == 2 and logit.shape[-1] == 1
    assert logit.shape[1] > 0 and logit.shape[2] > 0
    assert cam.shape == (2, 2)  # gap + gmp logits
    tiny = jnp.zeros((1, 2, 2, 32), jnp.float32)
    with pytest.raises(ValueError, match="too small"):
        cls.init(jax.random.PRNGKey(0), tiny)
