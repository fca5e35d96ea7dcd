"""Unit tests for models/ugatit.py — AdaLIN/ILN math, spectral norm,
CAM wiring, generator/discriminator contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from uig.models.ugatit import (
    AdaLIN,
    ILN,
    SNConv,
    UGATITDiscriminator,
    UGATITGenerator,
    spectral_normalize,
)


def _x(b=2, s=8, c=4, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, s, s, c))


# ---------------------------------------------------------------------------
# AdaLIN / ILN math
# ---------------------------------------------------------------------------


def _manual_in(x, eps=1e-5):
    # ddof=1: AdaLIN/ILN reproduce the canonical implementation's
    # torch.var (unbiased) quirk
    m = x.mean(axis=(1, 2), keepdims=True)
    v = x.var(axis=(1, 2), keepdims=True, ddof=1)
    return (x - m) / np.sqrt(v + eps)


def _manual_ln(x, eps=1e-5):
    m = x.mean(axis=(1, 2, 3), keepdims=True)
    v = x.var(axis=(1, 2, 3), keepdims=True, ddof=1)
    return (x - m) / np.sqrt(v + eps)


@pytest.mark.parametrize("rho", [0.0, 1.0, 0.3])
def test_adalin_blends_in_and_ln(rho):
    x = _x()
    b, c = x.shape[0], x.shape[-1]
    gamma = jnp.full((b, c), 2.0)
    beta = jnp.full((b, c), 0.5)
    mod = AdaLIN(rho_init=rho)
    y = mod.apply(mod.init(jax.random.PRNGKey(0), x, gamma, beta),
                  x, gamma, beta)
    xn = np.asarray(x, np.float64)
    want = rho * _manual_in(xn) + (1 - rho) * _manual_ln(xn)
    np.testing.assert_allclose(np.asarray(y), want * 2.0 + 0.5,
                               rtol=1e-4, atol=1e-4)


def test_adalin_gamma_beta_are_per_example():
    x = _x(b=2)
    c = x.shape[-1]
    gamma = jnp.stack([jnp.ones((c,)), 3.0 * jnp.ones((c,))])
    beta = jnp.zeros((2, c))
    mod = AdaLIN(rho_init=1.0)
    y = mod.apply(mod.init(jax.random.PRNGKey(0), x, gamma, beta),
                  x, gamma, beta)
    n0 = _manual_in(np.asarray(x, np.float64))
    np.testing.assert_allclose(np.asarray(y)[0], n0[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y)[1], 3 * n0[1], rtol=1e-4,
                               atol=1e-4)


def test_iln_defaults_to_pure_ln_with_affine():
    x = _x()
    mod = ILN()  # rho_init = 0.0
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(y),
                               _manual_ln(np.asarray(x, np.float64)),
                               rtol=1e-4, atol=1e-4)
    assert params["params"]["rho"].shape == (x.shape[-1],)


# ---------------------------------------------------------------------------
# spectral norm
# ---------------------------------------------------------------------------


class _SNProbe(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self, w, update):
        return spectral_normalize(self, "u", w, update)


def test_spectral_norm_converges_to_top_singular_value():
    w = jax.random.normal(jax.random.PRNGKey(1), (24, 6))
    probe = _SNProbe(w.shape)
    variables = probe.init(jax.random.PRNGKey(0), w, False)
    sn = variables["sn"]
    # iterate the power method to convergence via repeated updated applies
    for _ in range(50):
        _, upd = probe.apply({"sn": sn}, w, True, mutable=["sn"])
        sn = upd["sn"]
    w_n = probe.apply({"sn": sn}, w, False)
    sigma = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
    np.testing.assert_allclose(np.asarray(w / w_n).ravel()[0], sigma,
                               rtol=1e-4)
    # the normalized weight has unit top singular value
    top = np.linalg.svd(np.asarray(w_n), compute_uv=False)[0]
    np.testing.assert_allclose(top, 1.0, rtol=1e-4)


def test_spectral_norm_update_gating():
    w = jax.random.normal(jax.random.PRNGKey(2), (10, 3))
    probe = _SNProbe(w.shape)
    variables = probe.init(jax.random.PRNGKey(0), w, False)
    # frozen apply never needs (or mutates) the collection
    y1 = probe.apply({"sn": variables["sn"]}, w, False)
    y2 = probe.apply({"sn": variables["sn"]}, w, False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_spectral_norm_gradient_flows_through_weight_only():
    w = jax.random.normal(jax.random.PRNGKey(3), (12, 4))
    probe = _SNProbe(w.shape)
    variables = probe.init(jax.random.PRNGKey(0), w, False)

    def loss(w):
        return jnp.sum(probe.apply({"sn": variables["sn"]}, w, False) ** 2)

    g = jax.grad(loss)(w)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_snconv_shapes_and_stride():
    x = _x(b=2, s=16, c=3)
    conv = SNConv(8, 4, stride=2, pad=1)
    variables = conv.init(jax.random.PRNGKey(0), x, False)
    y, upd = conv.apply(variables, x, True, mutable=["sn"])
    assert y.shape == (2, 8, 8, 8)
    assert not np.array_equal(np.asarray(upd["sn"]["u"]),
                              np.asarray(variables["sn"]["u"]))


# ---------------------------------------------------------------------------
# generator / discriminator contracts
# ---------------------------------------------------------------------------


def _tiny_gen(**kw):
    return UGATITGenerator(base_features=8, n_res_blocks=1, **kw)


def test_generator_output_contract():
    g = _tiny_gen()
    x = _x(b=2, s=16, c=3)
    params = g.init(jax.random.PRNGKey(0), x)
    img, cam, heat = g.apply(params, x)
    assert img.shape == x.shape
    assert cam.shape == (2, 2)
    assert heat.shape == (2, 4, 4, 1)
    assert float(jnp.abs(img).max()) <= 1.0
    # translate method returns the image only
    np.testing.assert_array_equal(
        np.asarray(g.apply(params, x, method=UGATITGenerator.translate)),
        np.asarray(img))


def test_generator_rho_params_exist_with_init_values():
    g = _tiny_gen()
    params = g.init(jax.random.PRNGKey(0), _x(b=1, s=16, c=3))

    rhos = []

    def collect(path, leaf):
        if path and getattr(path[-1], "key", None) == "rho":
            rhos.append((jax.tree_util.keystr(path), np.asarray(leaf)))
        return leaf

    jax.tree_util.tree_map_with_path(collect, params)
    assert rhos, "no rho parameters found"
    dec = [v for k, v in rhos if "DecBlock" in k]
    iln = [v for k, v in rhos if "ILN" in k]
    assert dec and iln
    assert all((v == 0.9).all() for v in dec)  # AdaLIN starts near IN
    assert all((v == 0.0).all() for v in iln)  # upsample ILN starts at LN


def test_generator_cam_logit_carries_gradient():
    g = _tiny_gen()
    x = _x(b=2, s=16, c=3)
    params = g.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.sum(g.apply(p, x)[1] ** 2)

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum())
                for l in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


# local D (n=5): 64 -> 8 via 3 stride-2 convs, stride-1 conv4p1 -> 7,
# final conv4p1 -> 6; global D (n=7): 128 -> 4 via 5 stride-2, -> 3 -> 2
@pytest.mark.parametrize("n_layers,size,expect_hw", [(5, 64, 6), (7, 128, 2)])
def test_discriminator_contract(n_layers, size, expect_hw):
    d = UGATITDiscriminator(base_features=4, n_layers=n_layers)
    x = _x(b=2, s=size, c=3)
    variables = d.init(jax.random.PRNGKey(0), x, False)
    (logit, cam, heat), upd = d.apply(variables, x, True, mutable=["sn"])
    assert logit.shape[0] == 2 and logit.shape[-1] == 1
    assert logit.shape[1] == expect_hw
    assert cam.shape == (2, 2)
    assert heat.shape[-1] == 1
    # power-iteration vectors advanced
    u0 = jax.tree_util.tree_leaves(variables["sn"])
    u1 = jax.tree_util.tree_leaves(upd["sn"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(u0, u1))


def test_clip_rho_only_touches_rho():
    from uig.train.ugatit_trainer import clip_rho

    tree = {"layer": {"rho": jnp.asarray([-0.5, 0.5, 1.5]),
                      "kernel": jnp.asarray([-2.0, 3.0])}}
    out = clip_rho(tree)
    np.testing.assert_array_equal(np.asarray(out["layer"]["rho"]),
                                  [0.0, 0.5, 1.0])
    np.testing.assert_array_equal(np.asarray(out["layer"]["kernel"]),
                                  [-2.0, 3.0])
