"""Numerics of the NHWC building blocks vs hand-written torch-CPU oracles
(SURVEY.md §4: torch 2.13-cpu is the golden reference for module semantics;
tolerance <=1e-5 in fp32)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from uig.models.layers import InstanceNorm, PadConv, pad2d


def _nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 5, 4)).astype(np.float32)
    mod = InstanceNorm()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(params, jnp.asarray(x))

    xt = torch.from_numpy(_nhwc_to_nchw(x))
    yt = F.instance_norm(xt, eps=1e-5)  # affine init is identity
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(yt.numpy(), (0, 2, 3, 1)), atol=1e-5
    )


def test_instance_norm_affine_params_used():
    x = jnp.ones((1, 4, 4, 2)) * 3.0
    mod = InstanceNorm()
    params = mod.init(jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda p: p + 1.0, params)  # scale=2, bias=1
    y = mod.apply(params, x)
    # constant input -> normalized to 0 -> y = bias = 1
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-4)


def test_reflection_pad_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 6, 6, 3)).astype(np.float32)
    y = pad2d(jnp.asarray(x), 2, "reflect")
    yt = F.pad(torch.from_numpy(_nhwc_to_nchw(x)), (2, 2, 2, 2), mode="reflect")
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(yt.numpy(), (0, 2, 3, 1)), atol=0
    )


def test_padconv_matches_torch_conv():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    mod = PadConv(features=5, kernel=3, stride=2, pad=1, pad_mode="zeros")
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(params, jnp.asarray(x))

    # same weights in torch: flax kernel (kh, kw, cin, cout) -> torch (cout, cin, kh, kw)
    k = np.asarray(params["params"]["kernel"])
    b = np.asarray(params["params"]["bias"])
    wt = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)))
    yt = F.conv2d(
        torch.from_numpy(_nhwc_to_nchw(x)), wt, torch.from_numpy(b),
        stride=2, padding=1,
    )
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(yt.numpy(), (0, 2, 3, 1)), atol=2e-5
    )


def test_s2d_conv_matches_plain_conv():
    """Space-to-depth execution is the SAME linear map: identical params,
    outputs equal up to fp reassociation (docs/DESIGN.md §5b)."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    plain = PadConv(features=3, kernel=7, pad=3, pad_mode="reflect")
    s2d = PadConv(features=3, kernel=7, pad=3, pad_mode="reflect", s2d_block=4)
    params = plain.init(jax.random.PRNGKey(0), x)
    y0 = plain.apply(params, x)
    y1 = s2d.apply(params, x)  # same param tree by construction
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=2e-6)


def test_s2d_strided_conv_matches_plain_conv():
    """The s2d execution generalizes to strided convs (the d128/d256
    downsample shape: k3 s2 p1 zeros): the big kernel embeds W at offsets
    (s·di, s·dj) and strides by s·b — same linear map, same params."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
    plain = PadConv(features=12, kernel=3, stride=2, pad=1, pad_mode="zeros")
    s2d = PadConv(features=12, kernel=3, stride=2, pad=1, pad_mode="zeros",
                  s2d_block=2)
    params = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(s2d.apply(params, x)),
                               np.asarray(plain.apply(params, x)), atol=2e-6)


def test_s2d_non_divisible_falls_back_to_plain_conv():
    """Round-3 behavior change: a spatial size not divisible by s2d_block
    silently routes to the plain conv (s2d is a pure execution strategy,
    so translate on arbitrary image sizes must still work) — and the
    result matches s2d_block=0 exactly."""
    x = jnp.asarray(np.random.default_rng(11).normal(size=(1, 15, 15, 4)),
                    jnp.float32)
    mod = PadConv(features=3, kernel=7, pad=3, s2d_block=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = PadConv(features=3, kernel=7, pad=3, s2d_block=0)
    np.testing.assert_allclose(np.asarray(mod.apply(params, x)),
                               np.asarray(ref.apply(params, x)),
                               rtol=0, atol=1e-6)


def test_generator_stem_s2d_matches_plain():
    """model.stem_s2d is a pure execution strategy on the c7s1-64 stem:
    the same param tree run with stem_s2d=4 must match stem_s2d=0 up to fp
    reassociation (grads included — it sits under value_and_grad in every
    trainer)."""
    from uig.models.resnet_gen import ResNetGenerator

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    plain = ResNetGenerator(n_res_blocks=1)
    s2d = ResNetGenerator(n_res_blocks=1, stem_s2d=4, head_s2d=4)
    params = plain.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(s2d.apply(params, x)),
                               np.asarray(plain.apply(params, x)), atol=2e-5)

    def loss(mod, p):
        return jnp.sum(jnp.square(mod.apply(p, x)))

    g0 = jax.grad(lambda p: loss(plain, p))(params)
    g1 = jax.grad(lambda p: loss(s2d, p))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4), g0, g1)


def test_resnet_block_identity_at_zero_weights():
    from uig.models.layers import ResnetBlock

    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 4)),
                    jnp.float32)
    mod = ResnetBlock(4)
    params = mod.init(jax.random.PRNGKey(0), x)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    y = mod.apply(zeroed, x)
    # zero conv weights + zero IN scale -> block output == input (pure skip)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_nearest_up2_matches_resize():
    """nearest_up2 (broadcast+reshape, gather-free on TPU) must be
    bit-identical to jax.image.resize nearest at factor 2."""
    import jax
    import jax.numpy as jnp

    from uig.models.layers import nearest_up2

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 3))
    want = jax.image.resize(x, (2, 10, 14, 3), method="nearest")
    got = nearest_up2(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # VJP: 2x2 window sum
    ct = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 14, 3))
    _, vjp = jax.vjp(nearest_up2, x)
    _, vjp_ref = jax.vjp(
        lambda t: jax.image.resize(t, (2, 10, 14, 3), method="nearest"), x)
    np.testing.assert_allclose(np.asarray(vjp(ct)[0]),
                               np.asarray(vjp_ref(ct)[0]), rtol=1e-5,
                               atol=1e-6)
