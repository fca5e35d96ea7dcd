"""DP-8 step == single-device step on the same global batch (SURVEY.md §4
"Distributed tests without a cluster"): instance norm is per-example and
grads pmean over the data axis, so the math must match exactly up to fp32
reduction order."""

import dataclasses

import jax
import numpy as np

from uig.config import get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.cyclegan import CycleGANTrainer
import pytest


def _cfg(batch):
    cfg = get_preset("smoke64")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=16, n_res_blocks=1,
                                  d_layers=2),
        data=dataclasses.replace(cfg.data, batch_size=batch, load_size=16),
        # SGD: Adam's sign-normalizing early steps amplify fp32 reduction
        # noise ~1e-7 into ~lr-sized param diffs, which would make this test
        # measure conditioning, not sharding correctness.
        opt=dataclasses.replace(cfg.opt, optimizer="sgd"),
    )
    return cfg


@pytest.mark.smoke
def test_dp8_matches_single_device():
    rng = np.random.default_rng(0)
    # pre-augmented float batches so per-shard augment RNG is out of the picture
    a = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)

    results = {}
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        tr = CycleGANTrainer(_cfg(8), mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        batch = shard_batch(mesh, (a, b))
        state, m = tr.train_step(state, batch)
        state, m = tr.train_step(state, batch)
        results[ndev] = (
            {k: float(v) for k, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)),
        )

    m1, p1 = results[1]
    m8, p8 = results[8]
    # fp32 reduction order differs between pmean-of-shard-means and a global
    # mean; two optimizer steps compound it — tolerances reflect that.
    for k in m1:
        np.testing.assert_allclose(m1[k], m8[k], rtol=2e-3, err_msg=k)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for x, y in zip(flat1, flat8):
        np.testing.assert_allclose(x, y, atol=1e-4)
