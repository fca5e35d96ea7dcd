import jax
import jax.numpy as jnp
import numpy as np

from uig.train.pool import ImagePool


def _fakes(v, b=4, s=2):
    return jnp.full((b, s, s, 1), float(v))


def test_warmup_appends_and_returns_fresh():
    pool = ImagePool(8)
    st = pool.init((2, 2, 1))
    st, out = pool.query(st, _fakes(1.0), jax.random.PRNGKey(0))
    np.testing.assert_allclose(out, _fakes(1.0))
    assert int(st.count) == 4
    np.testing.assert_allclose(st.buffer[:4], _fakes(1.0))
    st, out = pool.query(st, _fakes(2.0), jax.random.PRNGKey(1))
    np.testing.assert_allclose(out, _fakes(2.0))
    assert int(st.count) == 8


def test_full_pool_mixes_and_swaps():
    pool = ImagePool(4)
    st = pool.init((2, 2, 1))
    st, _ = pool.query(st, _fakes(1.0), jax.random.PRNGKey(0))
    assert int(st.count) == 4
    # pool is full of 1.0; push 2.0s many times and check we ever get pooled
    got_pooled = False
    for i in range(20):
        st, out = pool.query(st, _fakes(2.0 + i), jax.random.PRNGKey(10 + i))
        vals = np.unique(np.asarray(out))
        if len(vals) > 1 or vals[0] != 2.0 + i:
            got_pooled = True
    assert got_pooled, "never returned a historical fake in 20 queries"
    # buffer should by now contain newer values too
    assert np.asarray(st.buffer).max() > 1.0


def test_warmup_boundary_never_serves_unwritten_slots():
    """pool_size % batch != 0: straddling queries must never return the
    zeros from unfilled slots (regression: rand_idx used the full range)."""
    pool = ImagePool(5)  # batch 4 -> boundary at count=4
    st = pool.init((2, 2, 1))
    st, _ = pool.query(st, _fakes(1.0), jax.random.PRNGKey(0))  # count=4
    for i in range(30):
        st, out = pool.query(st, _fakes(2.0), jax.random.PRNGKey(100 + i))
        assert np.asarray(out).min() >= 1.0, f"served an unwritten slot: {out}"


def test_count_saturates():
    pool = ImagePool(4)
    st = pool.init((2, 2, 1))
    for i in range(5):
        st, _ = pool.query(st, _fakes(i), jax.random.PRNGKey(i))
    assert int(st.count) == 4


def test_pool_disabled():
    pool = ImagePool(0)
    st = pool.init((2, 2, 1)) if pool.pool_size > 0 else None
    # pool_size=0: query passes fakes through
    st2, out = pool.query(st, _fakes(3.0), jax.random.PRNGKey(0))
    np.testing.assert_allclose(out, _fakes(3.0))
