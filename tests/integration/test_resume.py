"""Checkpoint → restore → resume reproduces the uninterrupted run bit-exactly
(SURVEY.md §4 "integration tests" / §5 failure detection; fp32 compute on one
CPU device is deterministic, so equality is exact)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from uig.config import get_preset


def _tiny_cfg(tmp, name, ckpt_every=3):
    cfg = get_preset("smoke64")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=16, n_res_blocks=1,
                                  d_layers=2),
        data=dataclasses.replace(cfg.data, batch_size=2, load_size=20,
                                 synthetic_len=12, num_workers=1),
        opt=dataclasses.replace(cfg.opt, pool_size=4, total_steps=100),
        parallel=dataclasses.replace(cfg.parallel, num_devices=2),
        run=dataclasses.replace(cfg.run, name=name, workdir=str(tmp),
                                log_every=2, ckpt_every=ckpt_every),
        eval=dataclasses.replace(cfg.eval, sample_grid_every=0),
    )
    return cfg


def _final_state(workdir, cfg):
    from uig.checkpoint import CheckpointManager
    from uig.runtime.mesh import make_mesh
    from uig.train.loop import build_trainer

    mesh = make_mesh(cfg.parallel.num_devices)
    tr = build_trainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(cfg.run.seed))
    ckpt = CheckpointManager(os.path.join(workdir, "ckpt"))
    state, data_state, _ = ckpt.restore(state)
    ckpt.close()
    return jax.tree_util.tree_map(np.asarray, jax.device_get(state)), data_state


def test_resume_bit_exact(tmp_path):
    from uig.train.loop import fit

    # run A: uninterrupted 6 steps
    cfg_a = _tiny_cfg(tmp_path, "uninterrupted")
    fit(cfg_a, max_steps=6)

    # run B: 3 steps, stop, resume to 6
    cfg_b = _tiny_cfg(tmp_path, "interrupted")
    fit(cfg_b, max_steps=3)
    fit(cfg_b, max_steps=6)

    sa, da = _final_state(os.path.join(tmp_path, "uninterrupted"), cfg_a)
    sb, db = _final_state(os.path.join(tmp_path, "interrupted"), cfg_b)
    assert int(sa.step) == int(sb.step) == 6
    assert da == db, "data iterator cursors diverged"
    la = jax.tree_util.tree_leaves(sa)
    lb = jax.tree_util.tree_leaves(sb)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_metrics_jsonl_written(tmp_path):
    import json

    from uig.train.loop import fit

    cfg = _tiny_cfg(tmp_path, "metrics_run")
    fit(cfg, max_steps=4)
    path = os.path.join(tmp_path, "metrics_run", "metrics.jsonl")
    lines = [json.loads(l) for l in open(path)]
    assert lines and all("g_loss" in l and "input_stall_pct" in l for l in lines)
    assert os.path.exists(os.path.join(tmp_path, "metrics_run", "config.json"))
