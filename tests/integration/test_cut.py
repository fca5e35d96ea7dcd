"""CUT trainer: one-step sanity + loss decrease on tiny shapes (rung 4
minus multi-host; multi-host wiring is exercised by the mesh8 DP test)."""

import dataclasses

import jax
import numpy as np
import pytest

from uig.config import get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.cut import CUTTrainer


def _cfg(batch=2):
    cfg = get_preset("cut256_multihost")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=16, n_res_blocks=1, d_layers=2,
            compute_dtype="float32", nce_layers=(0, 4, 8), nce_patches=16,
            nce_proj_dim=32),
        data=dataclasses.replace(cfg.data, batch_size=batch, load_size=20),
        opt=dataclasses.replace(cfg.opt, pool_size=4),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )
    return cfg


def test_cut_steps_and_translate():
    mesh = make_mesh(2)
    tr = CUTTrainer(_cfg(2), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    batch = shard_batch(mesh, (a, b))
    losses = []
    for _ in range(8):
        state, m = tr.train_step(state, batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        losses.append(vals)
    assert losses[-1]["nce"] > 0
    # repeated steps on one batch must reduce G's loss
    assert losses[-1]["g_loss"] < losses[0]["g_loss"]

    import jax.numpy as jnp

    y = tr.translate(state.ema, jnp.zeros((1, 16, 16, 3)))
    assert y.shape == (1, 16, 16, 3) and y.dtype == jnp.float32
    with pytest.raises(ValueError):
        tr.translate(state.ema, jnp.zeros((1, 16, 16, 3)), "b2a")


def test_cut_via_loop(tmp_path):
    from uig.train.loop import fit

    cfg = _cfg(2)
    cfg = dataclasses.replace(
        cfg,
        run=dataclasses.replace(cfg.run, workdir=str(tmp_path), name="cutrun",
                                ckpt_every=2, log_every=2),
        data=dataclasses.replace(cfg.data, synthetic_len=8, num_workers=1),
        parallel=dataclasses.replace(cfg.parallel, num_devices=2,
                                     multihost=False),
        eval=dataclasses.replace(cfg.eval, sample_grid_every=0),
    )
    metrics = fit(cfg, max_steps=3)
    assert np.isfinite(metrics["g_loss"])


def test_cut_rejects_out_of_range_nce_layers():
    cfg = _cfg()
    bad = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, nce_layers=(0, 4, 99)))
    with pytest.raises(ValueError, match="out-of-range taps"):
        CUTTrainer(bad, make_mesh(1))
    all_bad = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, nce_layers=(90, 99)))
    with pytest.raises(ValueError, match="out of range"):
        CUTTrainer(all_bad, make_mesh(1))
