"""JAX-level sanitizer equivalents (SURVEY.md §5 "Race detection/sanitizers"):
the step runs clean under disable_jit (tracer-leak/impurity check) and under
jax_debug_nans; explicit PRNG threading means no hidden RNG state to race."""

import dataclasses
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "helpers"))


def _setup(tmpdir):
    from train_small import tiny_cfg

    from uig.runtime.mesh import make_mesh
    from uig.train.loop import build_trainer

    cfg = tiny_cfg(str(tmpdir), "sanit")
    mesh = make_mesh(1)
    tr = build_trainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    return tr, state, (a, b)


def test_step_under_debug_nans(tmp_path):
    jax.config.update("jax_debug_nans", True)
    try:
        tr, state, batch = _setup(tmp_path)
        state, m = tr.train_step(state, batch)
        assert np.isfinite(float(m["g_loss"]))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_checkpointed_state_has_no_weak_types(tmp_path):
    """All state leaves are concrete arrays with explicit dtypes (a common
    source of resume drift is weakly-typed python scalars in the pytree)."""
    tr, state, _ = _setup(tmp_path)
    for leaf in jax.tree_util.tree_leaves(state):
        assert hasattr(leaf, "dtype"), f"non-array leaf {type(leaf)}"
        assert not getattr(leaf, "weak_type", False), leaf
