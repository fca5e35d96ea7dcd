"""Parity for the fused conv3+IN(+ReLU) Pallas kernel (interpret mode on
CPU) against the exact unfused composition the model runs today:
PadConv(3, pad=1, reflect|zeros) -> InstanceNorm(fp32 stats) -> relu."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.kernels.convin_pallas import conv3_in_act, convin_viable
from uig.models.layers import _conv_same_s1, add_reflect_ring_delta


def _reference(x, w, b, g, be, relu, pad_mode, eps=1e-5):
    y = _conv_same_s1(x, w.astype(x.dtype), 1)
    if pad_mode == "reflect":
        y = add_reflect_ring_delta(y, x, w.astype(x.dtype))
    y = (y.astype(jnp.float32) + b).astype(x.dtype)
    y32 = y.astype(jnp.float32)
    mean = jnp.mean(y32, axis=(1, 2), keepdims=True)
    msq = jnp.mean(jnp.square(y32), axis=(1, 2), keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    out = (y32 - mean) * jax.lax.rsqrt(var + eps) * g + be
    if relu:
        out = jnp.maximum(out, 0.0)
    return out.astype(x.dtype)


def _mats(key, h, w_, cin, f, dtype):
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (2, h, w_, cin), dtype)
    w = jax.random.normal(ks[1], (3, 3, cin, f), jnp.float32) * 0.1
    b = jax.random.normal(ks[2], (f,), jnp.float32) * 0.1
    g = 1.0 + 0.1 * jax.random.normal(ks[3], (f,), jnp.float32)
    be = 0.1 * jax.random.normal(ks[4], (f,), jnp.float32)
    return x, w, b, g, be


@pytest.mark.parametrize("pad_mode", ["reflect", "zeros"])
@pytest.mark.parametrize("relu", [True, False])
def test_convin_forward_parity(pad_mode, relu):
    x, w, b, g, be = _mats(jax.random.PRNGKey(0), 8, 8, 16, 16, jnp.float32)
    got = conv3_in_act(x, w, b, g, be, relu=relu, pad_mode=pad_mode)
    want = _reference(x, w, b, g, be, relu, pad_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad_mode", ["reflect", "zeros"])
def test_convin_grad_parity(pad_mode):
    x, w, b, g, be = _mats(jax.random.PRNGKey(1), 8, 8, 8, 8, jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8), jnp.float32)

    def loss_fused(x, w, b, g, be):
        return jnp.sum(conv3_in_act(x, w, b, g, be, relu=True,
                                    pad_mode=pad_mode) * cot)

    def loss_ref(x, w, b, g, be):
        return jnp.sum(_reference(x, w, b, g, be, True, pad_mode) * cot)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, b, g, be)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, b, g, be)
    for gf, gr, name in zip(got, want, ("dx", "dw", "db", "dg", "dbe")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_convin_bf16_runs_and_tracks_fp32():
    x, w, b, g, be = _mats(jax.random.PRNGKey(3), 8, 8, 16, 16, jnp.float32)
    ref = _reference(x, w, b, g, be, True, "reflect")
    got = conv3_in_act(x.astype(jnp.bfloat16), w, b, g, be, relu=True,
                       pad_mode="reflect")
    assert got.dtype == jnp.bfloat16
    # bf16 tolerance: IN divides by std so values are O(1); 2e-2 abs
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)


def test_convin_viable_bounds():
    assert convin_viable((16, 64, 64, 256))
    assert not convin_viable((1, 2, 2, 8))        # too small
    assert not convin_viable((1, 512, 512, 512))  # too big for VMEM
