"""Rung-1 learning sanity (SURVEY.md §4 integration tests): CycleGAN losses
decrease with no NaNs when overfitting a fixed batch; also the disable-jit
tracer-leak sweep on a single step (SURVEY.md §5 sanitizer equivalents)."""

import dataclasses

import jax
import numpy as np

from uig.config import get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.cyclegan import CycleGANTrainer
import pytest


def _cfg():
    cfg = get_preset("smoke64")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=16, n_res_blocks=1,
                                  d_layers=2),
        data=dataclasses.replace(cfg.data, batch_size=2, load_size=20),
        opt=dataclasses.replace(cfg.opt, pool_size=4, lr=5e-4),
    )


def _batch(mesh):
    from uig.data.datasets import SyntheticUnpairedDataset

    syn = SyntheticUnpairedDataset(4, 20, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    return shard_batch(mesh, (a, b))


@pytest.mark.smoke
def test_cyclegan_losses_decrease_no_nans():
    mesh = make_mesh(1)
    tr = CycleGANTrainer(_cfg(), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh)
    cycles = []
    for _ in range(12):
        state, m = tr.train_step(state, batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        cycles.append(vals["g_cycle"])
    # the reconstruction term must fall when overfitting one batch
    assert min(cycles[6:]) < cycles[0], cycles


def test_single_step_under_disable_jit():
    """Runs the whole device step eagerly — catches tracer leaks and
    impure-function bugs that jit can mask. One tiny step only (eager mode
    executes thousands of individual ops)."""
    # NOTE: 16² is the smallest valid size for d_layers=2 — smaller inputs
    # produce an empty PatchGAN logit map (guarded with a loud ValueError,
    # tests/unit/test_models.py::test_discriminator_too_small_input_raises)
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg,
        # pad_impl=explicit: the fused-ring reflect conv is bit-equivalent
        # (its own parity tests) but lowers to many small strip ops that
        # are each a dispatch under disable_jit — eager mode took 21 min
        # with it, ~3 min without. The tracer-leak/impurity sweep this
        # test exists for is lowering-independent.
        model=dataclasses.replace(cfg.model, pad_impl="explicit"),
        data=dataclasses.replace(cfg.data, batch_size=1, load_size=18),
        opt=dataclasses.replace(cfg.opt, pool_size=2),
    )
    mesh = make_mesh(1)
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, (
        rng.integers(0, 255, (1, 18, 18, 3), dtype=np.uint8),
        rng.integers(0, 255, (1, 18, 18, 3), dtype=np.uint8),
    ))
    with jax.disable_jit():
        new_state, m = tr.train_step(state, batch)
    assert np.isfinite(float(m["g_loss"]))
    assert int(new_state.step) == 1
