"""GcGAN trainer: one-sided geometry-consistent translation.

Covers:
  * the transform algebra: f/f⁻¹ round-trip exactly for both transforms,
  * DP-2 training: every loss term live and finite; the single generator
    and BOTH discriminators (plain + transformed stream) update,
  * the defining property: after training, G commutes with f measurably
    better than an untrained G (the gc metric falls),
  * fused_applies (identity folded into the 2B gc apply) matches the
    separate-apply step up to fp reassociation,
  * serving: deterministic, one-sided (b2a is a loud error),
  * constructor validation (bad gc_transform),
  * full CLI train -> ckpt -> translate roundtrip.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.config import get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.gcgan_trainer import GcGANTrainer, gc_apply, gc_inverse


def _cfg(batch=4, transform="rot90", **loss_kw):
    cfg = get_preset("gcgan256")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, g_base_features=8, d_base_features=8,
            n_res_blocks=1, d_layers=2, gc_transform=transform,
            compute_dtype="float32", head_s2d=0),
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


def test_gc_transform_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 6, 6, 3)),
                    jnp.float32)
    for t in ("rot90", "vflip"):
        np.testing.assert_array_equal(
            np.asarray(gc_inverse(gc_apply(x, t), t)), np.asarray(x))
        # f is a real permutation of pixels, not the identity
        assert np.abs(np.asarray(gc_apply(x, t)) - np.asarray(x)).max() > 0
    # rot90 and vflip are distinct transforms
    assert np.abs(np.asarray(gc_apply(x, "rot90"))
                  - np.asarray(gc_apply(x, "vflip"))).max() > 0
    with pytest.raises(ValueError, match="rot90"):
        gc_apply(x, "hflip")


def _gc_metric(tr, ema, x):
    """mean L1 between f(G(x)) and G(f(x)) through the serving path."""
    t = tr.transform
    y = np.asarray(tr.translate(ema, x))
    y_f = np.asarray(tr.translate(ema, gc_apply(x, t)))
    return float(np.abs(np.asarray(gc_apply(jnp.asarray(y), t)) - y_f).mean())


@pytest.mark.smoke
def test_gcgan_trains_dp2_all_terms_live():
    mesh = make_mesh(2)
    tr = GcGANTrainer(_cfg(lambda_identity=1.0), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    g0 = jax.device_get(state.g_params)
    d0 = jax.device_get(state.d_params)
    ema0 = jax.device_get(state.ema)
    x_eval = jnp.asarray(np.random.default_rng(3).random((2, 32, 32, 3)) * 2
                         - 1, jnp.float32)
    gc_before = _gc_metric(tr, ema0, x_eval)
    rng = np.random.default_rng(0)
    for _ in range(8):
        state, m = tr.train_step(state, _batch(mesh, rng))
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
    # every term live
    assert vals["g_adv"] != 0 and vals["g_gc"] > 0 and vals["g_idt"] > 0
    assert vals["d_b"] != 0 and vals["d_bgc"] != 0

    # generator and BOTH discriminators moved
    g1 = jax.device_get(state.g_params)
    g_diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        g0, g1)
    assert max(jax.tree_util.tree_leaves(g_diffs)) > 0
    d1 = jax.device_get(state.d_params)
    for head in ("b", "b_gc"):
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            d0[head], d1[head])
        assert max(jax.tree_util.tree_leaves(diffs)) > 0, head

    # the defining constraint is being enforced: G commutes with f better
    # than at init (the gc weight is doing work through the serving path)
    ema = jax.device_get(state.ema)
    assert _gc_metric(tr, ema, x_eval) < gc_before

    # serving: deterministic and one-sided
    y = np.asarray(tr.translate(ema, x_eval))
    np.testing.assert_array_equal(y, np.asarray(tr.translate(ema, x_eval)))
    with pytest.raises(ValueError, match="single-direction"):
        tr.translate(ema, x_eval, "b2a")


def test_gcgan_vflip_transform_trains():
    mesh = make_mesh(1)
    tr = GcGANTrainer(_cfg(batch=2, transform="vflip"), mesh)
    state = tr.init_state(jax.random.PRNGKey(1))
    state, m = tr.train_step(state, _batch(mesh, np.random.default_rng(1), 2))
    vals = {k: float(v) for k, v in m.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    assert vals["g_gc"] > 0


def test_gcgan_fused_applies_matches_separate():
    """fused_applies folds the identity pass into the single 2B gc apply
    (3B total) — same math (InstanceNorm is per-example), so a full train
    step must match up to conv-batch fp reassociation."""
    syn_rng = np.random.default_rng(5)
    a = syn_rng.integers(0, 255, (2, 36, 36, 3), dtype=np.uint8)
    b = syn_rng.integers(0, 255, (2, 36, 36, 3), dtype=np.uint8)
    outs = {}
    for fused in (False, True):
        c = _cfg(batch=2, lambda_identity=1.0)
        c = dataclasses.replace(
            c,
            model=dataclasses.replace(c.model, fused_applies=fused),
            # sgd: adam's g/sqrt(v) amplifies reassociation-level grad noise
            opt=dataclasses.replace(c.opt, optimizer="sgd"),
        )
        mesh = make_mesh(1)
        tr = GcGANTrainer(c, mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
        outs[fused] = (
            {k: float(v) for k, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)),
        )
    for k in outs[False][0]:
        np.testing.assert_allclose(outs[False][0][k], outs[True][0][k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for x, y in zip(jax.tree_util.tree_leaves(outs[False][1]),
                    jax.tree_util.tree_leaves(outs[True][1])):
        np.testing.assert_allclose(x, y, rtol=1e-4, atol=1e-5)


def test_gcgan_constructor_validation():
    mesh = make_mesh(2)
    bad = _cfg()
    bad = dataclasses.replace(
        bad, model=dataclasses.replace(bad.model, gc_transform="hflip"))
    with pytest.raises(ValueError, match="gc_transform"):
        GcGANTrainer(bad, mesh)


def test_gcgan_cli_train_ckpt_translate_roundtrip(tmp_path):
    from PIL import Image

    from uig.cli.main import main

    run_dir = os.path.join(tmp_path, "gcrun")
    rc = main([
        "train", "--preset", "gcgan256", "--max-steps", "4",
        "--set", "model.image_size=32", "--set", "model.g_base_features=8",
        "--set", "model.d_base_features=8", "--set", "model.n_res_blocks=1",
        "--set", "model.d_layers=2", "--set", "model.compute_dtype=float32",
        "--set", "model.head_s2d=0",
        "--set", "data.batch_size=4", "--set", "data.load_size=36",
        "--set", "data.source=synthetic", "--set", "data.synthetic_len=8",
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=2",
        "--set", "parallel.multihost=False", "--set", "opt.pool_size=4",
        "--set", f"run.workdir={tmp_path}", "--set", "run.name=gcrun",
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
    out_dir = os.path.join(tmp_path, "out")
    rc = main(["translate", "--run-dir", run_dir, "--input-dir", src,
               "--output-dir", out_dir, "--batch-size", "2"])
    assert rc == 0
    files = sorted(os.listdir(out_dir))
    assert len(files) == 3

    # byte-deterministic re-run
    out_dir2 = os.path.join(tmp_path, "out_again")
    rc = main(["translate", "--run-dir", run_dir, "--input-dir", src,
               "--output-dir", out_dir2, "--batch-size", "2"])
    assert rc == 0
    np.testing.assert_array_equal(
        np.asarray(Image.open(os.path.join(out_dir, files[0]))),
        np.asarray(Image.open(os.path.join(out_dir2,
                                           sorted(os.listdir(out_dir2))[0]))))
