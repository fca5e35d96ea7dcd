"""Parity for the movement-bound Pallas convs + instance norm
(uig.kernels.conv_pallas / norm_pallas) vs jax.lax references — interpret
mode on CPU; compiled-mode parity runs in scripts/tpu_kernel_parity.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.kernels.conv_pallas import conv3s2_s2d, conv7_s2d, conv_core
from uig.kernels.norm_pallas import instance_norm_pallas


def _conv_ref(x, w, stride=1, pad=0, pad_mode="zeros"):
    if pad:
        widths = ((0, 0), (pad, pad), (pad, pad), (0, 0))
        x = jnp.pad(x, widths, mode=("reflect" if pad_mode == "reflect"
                                     else "constant"))
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# ---------------------------------------------------------------------------
# conv_core (pre-padded VALID conv)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kh,kw,cin,cout,h", [(3, 3, 8, 16, 10),
                                              (2, 2, 8, 8, 10)])
def test_conv_core_forward(kh, kw, cin, cout, h):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, h, h, cin)), jnp.float32)
    w4 = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * 0.1,
                     jnp.float32)
    got = conv_core(x, w4.reshape(kh * kw * cin, cout), kh, kw)
    ref = _conv_ref(x, w4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv_core_grads():
    rng = np.random.default_rng(1)
    kh = kw = 3
    cin, cout = 8, 16
    x = jnp.asarray(rng.standard_normal((2, 10, 10, cin)), jnp.float32)
    w4 = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)) * 0.1,
                     jnp.float32)
    wf = w4.reshape(kh * kw * cin, cout)

    def loss_p(x, wf):
        return jnp.sum(jnp.square(conv_core(x, wf, kh, kw)))

    def loss_r(x, wf):
        return jnp.sum(jnp.square(
            _conv_ref(x, wf.reshape(kh, kw, cin, cout))))

    gp = jax.grad(loss_p, argnums=(0, 1))(x, wf)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, wf)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=2e-3, err_msg="dx")
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=2e-3, err_msg="dw")


# ---------------------------------------------------------------------------
# the s2d wrappers = the real generator stem/head/downsample shapes (tiny)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cin,cout,mode", [(3, 8, "reflect"),
                                           (8, 3, "reflect"),
                                           (8, 3, "zeros")])
def test_conv7_s2d_matches_padconv(cin, cout, mode):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, cin, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    got = conv7_s2d(x, w, b, pad_mode=mode)
    ref = _conv_ref(x, w, pad=3, pad_mode=mode) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv7_s2d_grads_flow_to_original_params():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 4, 3)) * 0.1, jnp.float32)
    b = jnp.zeros((3,), jnp.float32)

    def loss_p(x, w):
        return jnp.sum(jnp.square(conv7_s2d(x, w, b)))

    def loss_r(x, w):
        return jnp.sum(jnp.square(_conv_ref(x, w, pad=3,
                                            pad_mode="reflect")))

    gp = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=2e-3, err_msg="dx")
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=2e-3, err_msg="dw (through the einsum "
                               "weight rearrangement)")


def test_conv3s2_s2d_matches_strided_conv():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    got = conv3s2_s2d(x, w, b)
    ref = _conv_ref(x, w, stride=2, pad=1, pad_mode="zeros") + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_conv3s2_s2d_grads():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)) * 0.1, jnp.float32)

    def loss_p(x, w):
        return jnp.sum(jnp.square(conv3s2_s2d(x, w, None)))

    def loss_r(x, w):
        return jnp.sum(jnp.square(_conv_ref(x, w, stride=2, pad=1)))

    gp = jax.grad(loss_p, argnums=(0, 1))(x, w)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=2e-3)


# ---------------------------------------------------------------------------
# instance norm
# ---------------------------------------------------------------------------


def _in_ref(x, g, b, eps=1e-5, relu=False):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=(1, 2), keepdims=True)
    ms = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(ms - jnp.square(m), 0.0)
    y = (x32 - m) * jax.lax.rsqrt(var + eps) * g + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@pytest.mark.parametrize("relu", [False, True])
def test_instance_norm_forward(relu):
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((8,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)) * 0.2, jnp.float32)
    got = instance_norm_pallas(x, g, b, relu=relu)
    ref = _in_ref(x, g, b, relu=relu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_instance_norm_grads(relu):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((8,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)) * 0.2, jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)

    def loss_p(x, g, b):
        return jnp.sum(instance_norm_pallas(x, g, b, relu=relu) * t)

    def loss_r(x, g, b):
        return jnp.sum(_in_ref(x, g, b, relu=relu) * t)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(x, g, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, g, b)
    for a, r, name in zip(gp, gr, ("dx", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-4,
                                   err_msg=name)


# ---------------------------------------------------------------------------
# end-to-end: the generator with conv_impl="pallas" matches conv_impl="xla"
# ---------------------------------------------------------------------------


def test_generator_conv_impl_parity():
    from uig.models import ResNetGenerator

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 3)), jnp.float32)
    gens = {impl: ResNetGenerator(n_res_blocks=1, conv_impl=impl,
                                  dtype=jnp.float32)
            for impl in ("xla", "pallas")}
    params = gens["xla"].init(jax.random.PRNGKey(0), x)
    # identical param tree works for both impls (same checkpoints)
    y_x = gens["xla"].apply(params, x)
    y_p = gens["pallas"].apply(params, x)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), atol=5e-5)

    def loss(impl, p):
        return jnp.sum(jnp.square(gens[impl].apply(p, x)))

    g_x = jax.grad(lambda p: loss("xla", p))(params)
    g_p = jax.grad(lambda p: loss("pallas", p))(params)
    for a, b, path in zip(jax.tree_util.tree_leaves(g_p),
                          jax.tree_util.tree_leaves(g_x),
                          jax.tree_util.tree_leaves(
                              jax.tree_util.tree_map(lambda _: 0, g_x))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_instance_norm_wide_channels_unpacked_path():
    # C=128: P=1 (no lane packing) path
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((128,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.standard_normal((128,)) * 0.2, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(instance_norm_pallas(x, g, b)),
        np.asarray(_in_ref(x, g, b)), atol=1e-5)

