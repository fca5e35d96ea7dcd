import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.models import PatchDiscriminator, ResNetGenerator


@pytest.mark.parametrize("size,n_blocks", [(64, 6), (32, 2)])
def test_generator_shape_and_range(size, n_blocks):
    g = ResNetGenerator(n_res_blocks=n_blocks)
    x = jnp.zeros((2, size, size, 3))
    params = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(params, x)
    assert y.shape == (2, size, size, 3)
    assert np.abs(np.asarray(y)).max() <= 1.0  # tanh head


def test_generator_upsample_variants_same_shape():
    x = jnp.zeros((1, 32, 32, 3))
    for up in ("conv_transpose", "resize_conv"):
        g = ResNetGenerator(n_res_blocks=2, upsample=up)
        y = g.apply(g.init(jax.random.PRNGKey(0), x), x)
        assert y.shape == x.shape


def test_generator_feature_taps():
    g = ResNetGenerator(n_res_blocks=2)
    x = jnp.zeros((1, 32, 32, 3))
    params = g.init(jax.random.PRNGKey(0), x)
    taps = (0, 4, 8)
    y, feats = g.apply(params, x, taps, method=ResNetGenerator.with_features)
    assert y.shape == x.shape
    assert len(feats) == 3
    # stem tap at full res, downsampled taps smaller
    assert feats[0].shape[1] == 32
    assert feats[1].shape[1] < 32


def test_discriminator_patch_logits():
    d = PatchDiscriminator(n_layers=3)
    x = jnp.zeros((2, 70, 70, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    y = d.apply(params, x)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    assert 1 < y.shape[1] < 70  # a patch logit map, not a scalar


def test_discriminator_too_small_input_raises():
    d = PatchDiscriminator(n_layers=2)
    x = jnp.zeros((1, 8, 8, 3))
    with pytest.raises(ValueError, match="EMPTY logit map"):
        d.init(jax.random.PRNGKey(0), x)


def test_bf16_compute_fp32_params():
    g = ResNetGenerator(n_res_blocks=1, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 16, 16, 3))
    params = g.init(jax.random.PRNGKey(0), x)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(p.dtype == jnp.float32 for p in leaves)
    y = g.apply(params, x)
    assert y.dtype == jnp.bfloat16
