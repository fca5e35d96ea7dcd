"""DCLGAN trainer: dual-generator contrastive translation (no cycle loss).

Covers:
  * DP-2 training: every loss term live and finite; BOTH generators, BOTH
    per-direction head sets, and BOTH discriminators update,
  * the dual property: the two directions' parameters are independent
    (distinct leaves, not aliased),
  * serving: deterministic, direction-sensitive, loud bad-direction error,
  * constructor validation (fused_applies, out-of-range taps),
  * full CLI train -> ckpt -> translate roundtrip (both directions).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.config import get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.dclgan_trainer import DCLGANTrainer


def _cfg(batch=4, **loss_kw):
    cfg = get_preset("dclgan256")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, g_base_features=8, d_base_features=8,
            n_res_blocks=1, d_layers=2, nce_layers=(0, 4, 8), nce_patches=16,
            nce_proj_dim=32, compute_dtype="float32"),
        loss=dataclasses.replace(cfg.loss, **loss_kw),
        data=dataclasses.replace(cfg.data, source="synthetic",
                                 batch_size=batch, load_size=36,
                                 synthetic_len=12),
        opt=dataclasses.replace(cfg.opt, lr=1e-3, pool_size=4),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )


def _batch(mesh, rng, n=4):
    a = rng.integers(0, 255, (n, 36, 36, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (n, 36, 36, 3), dtype=np.uint8)
    return shard_batch(mesh, (a, b))


@pytest.mark.smoke
def test_dclgan_trains_dp2_all_terms_live():
    mesh = make_mesh(2)
    tr = DCLGANTrainer(_cfg(), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    g0 = jax.device_get(state.g_params)
    d0 = jax.device_get(state.d_params)
    rng = np.random.default_rng(0)
    for _ in range(8):
        state, m = tr.train_step(state, _batch(mesh, rng))
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
    # every term live
    assert vals["g_adv"] != 0 and vals["g_idt"] > 0
    assert vals["nce_a"] != 0 and vals["nce_b"] != 0
    assert vals["d_a"] != 0 and vals["d_b"] != 0
    # both directions' generators AND head sets moved, plus both Ds
    g1 = jax.device_get(state.g_params)
    for d in ("a2b", "b2a"):
        for group in ("gen", "heads"):
            diffs = jax.tree_util.tree_map(
                lambda a, b: float(np.abs(np.asarray(a)
                                          - np.asarray(b)).max()),
                g0[d][group], g1[d][group])
            assert max(jax.tree_util.tree_leaves(diffs)) > 0, (d, group)
    d_diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        d0, jax.device_get(state.d_params))
    assert min(jax.tree_util.tree_leaves(d_diffs)) >= 0
    assert max(jax.tree_util.tree_leaves(d_diffs)) > 0

    # the two directions are INDEPENDENT parameters (dual, not shared):
    # they were initialized differently and train on different objectives
    flat_a = jax.tree_util.tree_leaves(g1["a2b"]["gen"])
    flat_b = jax.tree_util.tree_leaves(g1["b2a"]["gen"])
    assert any(not np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(flat_a, flat_b))

    # serving: deterministic, direction-sensitive, loud on bad direction
    ema = jax.device_get(state.ema)
    x = jnp.asarray(np.random.default_rng(3).random((2, 32, 32, 3)),
                    jnp.float32)
    y_ab = np.asarray(tr.translate(ema, x, "a2b"))
    np.testing.assert_array_equal(
        y_ab, np.asarray(tr.translate(ema, x, "a2b")))
    assert np.abs(y_ab - np.asarray(tr.translate(ema, x, "b2a"))).max() > 1e-5
    with pytest.raises(ValueError, match="a2b"):
        tr.translate(ema, x, "sideways")


def test_dclgan_constructor_validation():
    mesh = make_mesh(2)
    fused = _cfg()
    fused = dataclasses.replace(
        fused, model=dataclasses.replace(fused.model, fused_applies=True))
    with pytest.raises(ValueError, match="fused_applies"):
        DCLGANTrainer(fused, mesh)

    bad_taps = _cfg()
    bad_taps = dataclasses.replace(
        bad_taps, model=dataclasses.replace(bad_taps.model,
                                            nce_layers=(0, 99)))
    with pytest.raises(ValueError, match="nce_layers"):
        DCLGANTrainer(bad_taps, mesh)


def test_dclgan_cli_train_ckpt_translate_roundtrip(tmp_path):
    from PIL import Image

    from uig.cli.main import main

    run_dir = os.path.join(tmp_path, "dclrun")
    rc = main([
        "train", "--preset", "dclgan256", "--max-steps", "4",
        "--set", "model.image_size=32", "--set", "model.g_base_features=8",
        "--set", "model.d_base_features=8", "--set", "model.n_res_blocks=1",
        "--set", "model.d_layers=2", "--set", "model.nce_layers=0,4,8",
        "--set", "model.nce_patches=16", "--set", "model.nce_proj_dim=32",
        "--set", "model.compute_dtype=float32", "--set", "model.head_s2d=0",
        "--set", "data.batch_size=4", "--set", "data.load_size=36",
        "--set", "data.source=synthetic", "--set", "data.synthetic_len=8",
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=2",
        "--set", "parallel.multihost=False", "--set", "opt.pool_size=4",
        "--set", f"run.workdir={tmp_path}", "--set", "run.name=dclrun",
        "--set", "run.ckpt_every=4", "--set", "run.log_every=2",
        "--set", "eval.sample_grid_every=0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    src = os.path.join(tmp_path, "src")
    os.makedirs(src)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (36, 36, 3), dtype=np.uint8)
                        ).save(os.path.join(src, f"{i}.png"))
    outs = {}
    for direction in ("a2b", "b2a"):
        out_dir = os.path.join(tmp_path, f"out_{direction}")
        rc = main(["translate", "--run-dir", run_dir, "--input-dir", src,
                   "--output-dir", out_dir, "--direction", direction,
                   "--batch-size", "2"])
        assert rc == 0
        files = sorted(os.listdir(out_dir))
        assert len(files) == 3
        outs[direction] = np.asarray(
            Image.open(os.path.join(out_dir, files[0])))
    assert not np.array_equal(outs["a2b"], outs["b2a"])

    # byte-deterministic re-run
    out_dir2 = os.path.join(tmp_path, "out_a2b_again")
    rc = main(["translate", "--run-dir", run_dir, "--input-dir", src,
               "--output-dir", out_dir2, "--direction", "a2b",
               "--batch-size", "2"])
    assert rc == 0
    np.testing.assert_array_equal(
        outs["a2b"],
        np.asarray(Image.open(os.path.join(out_dir2,
                                           sorted(os.listdir(out_dir2))[0]))))
