"""Pallas attention vs XLA reference (interpret mode on CPU; compiled-mode
parity on hardware via scripts/tpu_kernel_parity.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.kernels.attention_pallas import attention_pallas, attention_xla


def _qkv(b=2, n=64, d=32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (b, n, d), jnp.float32) for k in ks)


@pytest.mark.parametrize("n,d", [(64, 32), (128, 64), (96, 32)])
def test_forward_parity(n, d):
    q, k, v = _qkv(n=n, d=d)
    ref = attention_xla(q, k, v)
    got = attention_pallas(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_softmax_rows_sum_via_ones_value():
    # v = ones -> output must be exactly ones (softmax rows sum to 1)
    q, k, _ = _qkv(n=64, d=32)
    v = jnp.ones((2, 64, 32), jnp.float32)
    out = attention_pallas(q, k, v)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_gradients_match_reference():
    q, k, v = _qkv(n=64, d=32, seed=1)

    def loss_p(q, k, v):
        return jnp.sum(jnp.square(attention_pallas(q, k, v)))

    def loss_x(q, k, v):
        return jnp.sum(jnp.square(attention_xla(q, k, v)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_bf16_inputs():
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(n=64, d=32))
    out = attention_pallas(q, k, v)
    ref = attention_xla(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=0.05)


def test_gradients_match_with_multiple_q_blocks():
    """n=512 > block_q=256 -> the bwd kernel's dk/dv accumulation across q
    blocks (zero-init at j==0, += after) is actually exercised."""
    q, k, v = _qkv(b=2, n=512, d=32, seed=2)

    def loss_p(q, k, v):
        return jnp.sum(jnp.square(attention_pallas(q, k, v)))

    def loss_x(q, k, v):
        return jnp.sum(jnp.square(attention_xla(q, k, v)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   err_msg=f"d{name}")


def test_gradients_bf16():
    q, k, v = (x.astype(jnp.bfloat16) for x in _qkv(n=128, d=32, seed=3))

    def loss_p(q, k, v):
        return jnp.sum(jnp.square(attention_pallas(q, k, v).astype(jnp.float32)))

    def loss_x(q, k, v):
        return jnp.sum(jnp.square(attention_xla(q, k, v).astype(jnp.float32)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        assert a.dtype == b.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.15, rtol=0.05)
