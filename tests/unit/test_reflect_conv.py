"""Parity tests for the border-corrected reflect conv (layers.reflect_conv2d).

The fused lowering (implicit-zero-pad conv + exact border-ring overwrite)
must match the explicit reflect-pad + VALID conv bit-for-bit up to fp
reassociation — forward AND gradients — for every kernel size the generator
uses (k=3 trunk, k=7 stem/head).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.models.layers import PadConv, pad2d, reflect_conv2d


def _explicit(x, w):
    p = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        pad2d(x, p, "reflect"), w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("k", [3, 7])
@pytest.mark.parametrize("shape", [(2, 16, 16, 5), (1, 9, 13, 4)])
def test_forward_parity(k, shape):
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(kx, shape, jnp.float32)
    w = jax.random.normal(kw, (k, k, shape[-1], 6), jnp.float32)
    got = reflect_conv2d(x, w)
    want = _explicit(x, w)
    assert got.shape == want.shape
    # the additive delta form recomputes the zero-strip contribution with a
    # different accumulation order than the main conv -> ~1e-5 cancellation
    # noise on the ring at k=7 (values O(10))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("k", [3, 7])
def test_grad_parity(k):
    kx, kw = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (2, 12, 10, 3), jnp.float32)
    w = jax.random.normal(kw, (k, k, 3, 4), jnp.float32)

    def loss_fused(x, w):
        return jnp.sum(jnp.sin(reflect_conv2d(x, w)))

    def loss_explicit(x, w):
        return jnp.sum(jnp.sin(_explicit(x, w)))

    gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_explicit, argnums=(0, 1))(x, w)
    # gradient sums amplify the delta-form's reassociation noise a bit
    # beyond the forward's ~1e-5; real ring bugs are O(1) errors
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=3e-4, atol=3e-4)


def test_bf16_forward_parity():
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (1, 16, 16, 8), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, 8, 8), jnp.bfloat16)
    got = np.asarray(reflect_conv2d(x, w), np.float32)
    want = np.asarray(_explicit(x, w), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("impl", ["fused", "explicit"])
def test_padconv_impls_agree(impl):
    """PadConv(pad_impl=fused) == PadConv(pad_impl=explicit), params shared."""
    conv_f = PadConv(4, 3, pad=1, pad_mode="reflect", pad_impl="fused")
    conv_e = PadConv(4, 3, pad=1, pad_mode="reflect", pad_impl="explicit")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 10, 3))
    params = conv_e.init(jax.random.PRNGKey(4), x)
    ye = conv_e.apply(params, x)
    yf = conv_f.apply(params, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(ye),
                               rtol=1e-6, atol=1e-5)


def test_padconv_s2d_fused_parity():
    """s2d execution + fused reflect ring compose: PadConv(s2d_block=4,
    pad_impl=fused) == explicit reflect conv, same params."""
    conv_s = PadConv(3, 7, pad=3, pad_mode="reflect", pad_impl="fused",
                     s2d_block=4)
    conv_e = PadConv(3, 7, pad=3, pad_mode="reflect", pad_impl="explicit")
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 16, 8))
    params = conv_e.init(jax.random.PRNGKey(8), x)
    ye = conv_e.apply(params, x)
    ys = conv_s.apply(params, x)
    assert ys.shape == ye.shape
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ye),
                               rtol=2e-5, atol=1e-4)


def test_padconv_s2d_indivisible_falls_back():
    """Non-divisible spatial extents silently run the plain conv (same
    linear map) instead of raising — serving arbitrary sizes stays valid."""
    conv = PadConv(3, 7, pad=3, pad_mode="reflect", pad_impl="fused",
                   s2d_block=4)
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 18, 18, 4))
    params = conv.init(jax.random.PRNGKey(10), x)
    y = conv.apply(params, x)
    assert y.shape == (1, 18, 18, 3)


def test_padconv_tiny_plane_falls_back():
    """Planes with H or W <= 2p must still work (explicit-pad fallback)."""
    conv = PadConv(4, 7, pad=3, pad_mode="reflect", pad_impl="fused")
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 6, 6, 3))
    params = conv.init(jax.random.PRNGKey(6), x)
    y = conv.apply(params, x)
    assert y.shape == (1, 6, 6, 4)


def test_dx_s2d_backward_matches_default():
    """conv_same_dx_s2d: forward and d/dw are BIT-identical to the plain
    implicit-pad conv (same HLO); d/dx differs only by fp reassociation of
    the s2d-packed schedule (round-4 per-op budget lever: the stem's
    backward-data conv writes a 3-lane plane at 0.023 of MXU peak)."""
    from uig.models.layers import reflect_conv2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(7, 7, 3, 8)) * 0.1, jnp.float32)

    def grads(fn):
        def loss(x, w):
            return jnp.sum(fn(x, w) ** 2)
        return jax.grad(loss, argnums=(0, 1))(x, w), fn(x, w)

    (gx0, gw0), y0 = grads(lambda x, w: reflect_conv2d(x, w))
    (gx1, gw1), y1 = grads(lambda x, w: reflect_conv2d(x, w, dx_s2d=4))
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_array_equal(np.asarray(gw0), np.asarray(gw1))
    np.testing.assert_allclose(np.asarray(gx0), np.asarray(gx1),
                               rtol=1e-5, atol=1e-5)


def test_dx_s2d_indivisible_falls_back():
    """H/W not divisible by the block: the custom-vjp path is skipped and
    plain autodiff applies (serving arbitrary sizes stays valid)."""
    from uig.models.layers import reflect_conv2d

    x = jax.random.normal(jax.random.PRNGKey(3), (1, 18, 18, 3))
    w = jax.random.normal(jax.random.PRNGKey(4), (7, 7, 3, 4)) * 0.1
    y0 = reflect_conv2d(x, w)
    y1 = reflect_conv2d(x, w, dx_s2d=4)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    g = jax.grad(lambda x: jnp.sum(reflect_conv2d(x, w, dx_s2d=4) ** 2))(x)
    assert g.shape == x.shape
