"""NICE-GAN trainer: encoder reuse + decoupled training.

Covers:
  * DP-2 training: all loss terms live and finite, SN vectors advance,
    decoders/encoders/classifiers all update,
  * the DECOUPLING property: with d_lr_ratio=0 the encoders are bit-frozen
    across steps (the G step sends them no update even though gradients
    flow through them) while the decoders still train,
  * serving: translate = Dec_tgt(E_src(x)) from the self-contained EMA
    dict, deterministic, direction-sensitive,
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
from uig.train.nicegan_trainer import NICEGANTrainer


def _cfg(batch=4, **loss_kw):
    cfg = get_preset("nicegan256")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, g_base_features=8, d_base_features=4,
            n_res_blocks=1, compute_dtype="float32"),
        loss=dataclasses.replace(cfg.loss, **loss_kw),
        data=dataclasses.replace(cfg.data, source="synthetic",
                                 batch_size=batch, load_size=36,
                                 synthetic_len=12),
        opt=dataclasses.replace(cfg.opt, lr=1e-3),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )


def _batch(mesh, rng, n=4):
    a = rng.integers(0, 255, (n, 36, 36, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (n, 36, 36, 3), dtype=np.uint8)
    return shard_batch(mesh, (a, b))


@pytest.mark.smoke
def test_nicegan_trains_dp2_all_terms_live():
    mesh = make_mesh(2)
    tr = NICEGANTrainer(_cfg(), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    e0 = jax.device_get(state.e_params)
    c0 = jax.device_get(state.c_params)
    dec0 = jax.device_get(state.dec_params)
    sn0 = jax.device_get(state.e_sn)
    rng = np.random.default_rng(0)
    recs = []
    for _ in range(10):
        state, m = tr.train_step(state, _batch(mesh, rng))
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        recs.append(vals["g_rec"])
    # every term live
    assert vals["g_adv"] != 0 and vals["g_cycle"] > 0 and vals["d_cam"] != 0
    # the own-encoding reconstruction falls (decoders learn to invert E)
    assert min(recs[5:]) < recs[0], recs
    # all three parameter groups and the SN state actually moved
    for before, after in ((e0, state.e_params), (c0, state.c_params),
                          (dec0, state.dec_params), (sn0, state.e_sn)):
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a)
                                      - np.asarray(b)).max()),
            before, jax.device_get(after))
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    # serving: deterministic, direction-sensitive, EMA-self-contained
    ema = jax.device_get(state.ema)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    y_ab = np.asarray(tr.translate(ema, x, "a2b"))
    np.testing.assert_array_equal(y_ab,
                                  np.asarray(tr.translate(ema, x, "a2b")))
    assert y_ab.shape == (2, 32, 32, 3)
    assert np.abs(y_ab - np.asarray(tr.translate(ema, x, "b2a"))).max() > 1e-5
    with pytest.raises(ValueError, match="a2b"):
        tr.translate(ema, x, "sideways")


def test_nicegan_decoupling_e_frozen_without_d_step():
    # d_lr_ratio=0 zeroes the D optimizer: if the decoder update leaked any
    # gradient into E/C, their params would move — decoupling says they
    # must be BIT-frozen while the decoders still train.
    mesh = make_mesh(2)
    cfg = _cfg()
    cfg = dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, d_lr_ratio=0.0,
                                     weight_decay=0.0))
    tr = NICEGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    e0 = jax.device_get(state.e_params)
    c0 = jax.device_get(state.c_params)
    dec0 = jax.device_get(state.dec_params)
    rng = np.random.default_rng(1)
    for _ in range(3):
        state, _ = tr.train_step(state, _batch(mesh, rng))
    for before, after in ((e0, state.e_params), (c0, state.c_params)):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            before, jax.device_get(after))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        dec0, jax.device_get(state.dec_params))
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_nicegan_constructor_validation():
    mesh = make_mesh(2)
    fused = _cfg()
    fused = dataclasses.replace(
        fused, model=dataclasses.replace(fused.model, fused_applies=True))
    with pytest.raises(NotImplementedError, match="fused_applies"):
        NICEGANTrainer(fused, mesh)


def test_nicegan_cli_train_ckpt_translate_roundtrip(tmp_path):
    from PIL import Image

    from uig.cli.main import main

    run_dir = os.path.join(tmp_path, "nicerun")
    rc = main([
        "train", "--preset", "nicegan256", "--max-steps", "4",
        "--set", "model.image_size=32", "--set", "model.g_base_features=8",
        "--set", "model.d_base_features=4", "--set", "model.n_res_blocks=1",
        "--set", "model.compute_dtype=float32",
        "--set", "data.batch_size=4", "--set", "data.load_size=36",
        "--set", "data.source=synthetic", "--set", "data.synthetic_len=8",
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=2",
        "--set", "parallel.multihost=False",
        "--set", f"run.workdir={tmp_path}", "--set", "run.name=nicerun",
        "--set", "run.ckpt_every=4", "--set", "run.log_every=2",
        "--set", "eval.sample_grid_every=0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    # translate both directions from the checkpoint; deterministic
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
