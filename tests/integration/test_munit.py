"""MUNIT trainer: content/style decomposition, multimodality, training
dynamics, style-guided + seeded translate, multi-scale discriminator.

Covers the multimodal extension of the SURVEY.md §0 lineage (MUNIT):
  * per-domain content/style encoder + AdaIN decoder param groups,
  * the style encoder carries NO normalization params (IN would erase the
    statistics that carry style),
  * different style codes produce different translations (multimodality);
    a fixed style code is deterministic,
  * image/content/style recon losses fall over a few steps (DP-2 mesh),
  * the multi-scale D returns one logit map per scale and the losses
    accept the tuples,
  * remat modes compile and match (param paths pinned across nn.remat),
  * full CLI train -> ckpt -> translate roundtrip incl. --style-seed.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.config import apply_overrides, get_preset
from uig.models.munit import MUNITGenerator
from uig.models.patch_disc import MultiScaleDiscriminator
from uig.runtime import make_mesh, shard_batch
from uig.train.munit_trainer import MUNITTrainer


def _cfg(batch=2):
    cfg = get_preset("munit256")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, g_base_features=8,
            munit_content_res=1, munit_mlp_dim=16, munit_style_dim=4,
            d_layers=2, d_num_scales=2, compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, source="synthetic",
                                 batch_size=batch, load_size=36),
        opt=dataclasses.replace(cfg.opt, lr=1e-3),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )


def _flat_names(tree):
    return {"/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_munit_param_groups_and_style_encoder_unnormalized():
    g = MUNITGenerator(base_features=8, n_content_res=1, style_dim=4,
                       mlp_dim=16)
    x = jnp.zeros((1, 32, 32, 3))
    params = g.init(jax.random.PRNGKey(0), x, x)
    names = _flat_names(params)
    for grp in ("content_enc_a", "content_enc_b", "style_enc_a",
                "style_enc_b", "dec_a", "dec_b"):
        assert any(n.startswith(f"params/{grp}/") for n in names), grp
    # style encoder: no norm statistics params anywhere (no InstanceNorm/
    # LayerNorm scale-bias — channel moments ARE the style signal)
    assert not any("style_enc" in n and "Norm" in n for n in names)
    # decoder has NO plain InstanceNorm (AdaIN params come from the MLP;
    # upsample blocks use LayerNorm2d)
    assert not any(n.startswith("params/dec_a/") and "InstanceNorm" in n
                   for n in names)

    out = g.apply(params, x, x)
    assert out["x_ab"].shape == (1, 32, 32, 3)
    assert out["c_a"].shape == (1, 8, 8, 32)  # quarter res, 4*base channels
    assert out["s_a"].shape == (1, 4)
    assert out["s_a"].dtype == jnp.float32


def test_munit_style_changes_output_content_does_not_leak():
    """Same content + different styles -> different images; same style ->
    bit-identical (the module is deterministic)."""
    g = MUNITGenerator(base_features=8, n_content_res=1, style_dim=4,
                       mlp_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    params = g.init(jax.random.PRNGKey(0), x, x)
    c = g.apply(params, x, "a", method=MUNITGenerator.encode_content)
    s1 = jax.random.normal(jax.random.PRNGKey(2), (1, 4))
    s2 = jax.random.normal(jax.random.PRNGKey(3), (1, 4))
    y1 = g.apply(params, c, s1, "b", method=MUNITGenerator.decode)
    y1b = g.apply(params, c, s1, "b", method=MUNITGenerator.decode)
    y2 = g.apply(params, c, s2, "b", method=MUNITGenerator.decode)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6


def test_multi_scale_discriminator_and_losses():
    from uig.train import losses as L

    d = MultiScaleDiscriminator(base_features=8, n_layers=2, num_scales=2,
                                norm="none")
    x = jnp.zeros((2, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert isinstance(out, tuple) and len(out) == 2
    # coarser scale -> smaller logit map
    assert out[1].shape[1] < out[0].shape[1]
    # no norm params in the unnormalized variant
    assert not any("InstanceNorm" in n for n in _flat_names(params))
    for mode in ("lsgan", "vanilla", "hinge"):
        g = L.gan_loss_g(out, mode)
        dd = L.gan_loss_d(out, out, mode)
        assert np.isfinite(float(g)) and np.isfinite(float(dd))
    # r1 over the tuple output
    r1 = L.r1_penalty(d.apply, params, x)
    assert np.isfinite(float(r1))


@pytest.mark.smoke
def test_munit_trains_and_translates_multimodal():
    from uig.data.datasets import SyntheticUnpairedDataset

    mesh = make_mesh(2)
    tr = MUNITTrainer(_cfg(2), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    syn = SyntheticUnpairedDataset(4, 36, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    batch = shard_batch(mesh, (a, b))
    recs = []
    for _ in range(15):
        state, m = tr.train_step(state, batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        recs.append(vals["g_rec_x"])
    assert min(recs[8:]) < recs[0], f"image recon did not fall: {recs}"

    ema = jax.device_get(state.ema)
    x = jnp.zeros((1, 32, 32, 3))
    y1 = tr.translate(ema, x, "a2b")
    y2 = tr.translate(ema, x, "a2b")
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # multimodal: two style seeds differ from each other
    ys1 = tr.translate(ema, x, "a2b", style_rng=jax.random.PRNGKey(1))
    ys2 = tr.translate(ema, x, "a2b", style_rng=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(ys1) - np.asarray(ys2)).max() > 1e-6
    # style-guided: extract a style from a reference image
    ref = jnp.asarray(
        (a[:1].astype(np.float32) / 127.5 - 1.0)[:, 2:34, 2:34])
    s = tr.encode_style(ema, ref, "b")
    assert s.shape == (1, 4)
    yg = tr.translate(ema, x, "a2b", style=s)
    assert np.isfinite(np.asarray(yg)).all()


def test_munit_remat_modes_run_and_match():
    """remat=full/blocks must compile and match remat=none math (sgd) —
    the param-path-across-nn.remat regression class."""
    import dataclasses as dc

    from uig.data.datasets import SyntheticUnpairedDataset

    syn = SyntheticUnpairedDataset(4, 36, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    outs = {}
    for mode in ("none", "full", "blocks"):
        c = _cfg(2)
        c = dc.replace(c, model=dc.replace(c.model, remat=mode),
                       opt=dc.replace(c.opt, optimizer="sgd"))
        mesh = make_mesh(1)
        tr = MUNITTrainer(c, mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
        outs[mode] = (
            {k: float(v) for k, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)))
        assert all(np.isfinite(v) for v in outs[mode][0].values()), mode
    for mode in ("full", "blocks"):
        for k_ in outs["none"][0]:
            np.testing.assert_allclose(outs["none"][0][k_], outs[mode][0][k_],
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"{mode}:{k_}")
        for x, y in zip(jax.tree_util.tree_leaves(outs["none"][1]),
                        jax.tree_util.tree_leaves(outs[mode][1])):
            np.testing.assert_allclose(x, y, atol=5e-5)


def test_munit_via_build_trainer_and_knobs():
    from uig.train.loop import build_trainer

    cfg = _cfg(2)
    tr = build_trainer(cfg, make_mesh(1))
    assert type(tr).__name__ == "MUNITTrainer"
    assert tr.directions == ("a2b", "b2a")
    cfg2 = apply_overrides(cfg, ["model.munit_style_dim=16",
                                 "loss.lambda_munit_s=2.0",
                                 "model.d_num_scales=1"])
    assert cfg2.model.munit_style_dim == 16
    assert cfg2.loss.lambda_munit_s == 2.0
    # fused_applies is a loud no (style differs per decoder pass)
    import pytest

    bad = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, fused_applies=True))
    with pytest.raises(NotImplementedError):
        MUNITTrainer(bad, make_mesh(1))


def test_munit_cli_train_ckpt_translate_with_style(tmp_path):
    """Full MUNIT production path: CLI train -> orbax ckpt -> translate CLI
    serving with the default (zero) style, a seeded style, and a
    reference-image style; seeded output differs from the zero-style one."""
    import os

    from uig.cli.main import main
    from uig.data.datasets import SyntheticUnpairedDataset

    syn = SyntheticUnpairedDataset(n=6, load_size=36, seed=0)
    dir_a, dir_b = syn.write_png_dirs(str(tmp_path / "data"))
    run_dir = os.path.join(tmp_path, "munitrun")

    rc = main([
        "train", "--preset", "munit256", "--max-steps", "3",
        "--set", "model.image_size=32", "--set", "model.g_base_features=8",
        "--set", "model.munit_content_res=1",
        "--set", "model.munit_style_dim=4", "--set", "model.munit_mlp_dim=16",
        "--set", "model.d_layers=2", "--set", "model.d_num_scales=2",
        "--set", "data.batch_size=2",
        "--set", "data.load_size=36", "--set", "data.source=folders",
        "--set", f"data.dir_a={dir_a}", "--set", f"data.dir_b={dir_b}",
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=2",
        "--set", "parallel.multihost=False",
        "--set", f"run.workdir={tmp_path}", "--set", "run.name=munitrun",
        "--set", "run.ckpt_every=2", "--set", "run.log_every=2",
        "--set", "eval.sample_grid_every=0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    outs = {}
    for tag, extra in (
        ("zero", []),
        ("seeded", ["--style-seed", "7"]),
        ("ref", ["--style-ref", os.path.join(dir_b, os.listdir(dir_b)[0])]),
    ):
        out_dir = os.path.join(tmp_path, f"translated_{tag}")
        rc = main(["translate", "--run-dir", run_dir, "--input-dir", dir_a,
                   "--output-dir", out_dir, "--direction", "a2b",
                   "--batch-size", "3"] + extra)
        assert rc == 0
        files = sorted(os.listdir(out_dir))
        assert len(files) == 6
        from PIL import Image

        outs[tag] = np.asarray(Image.open(os.path.join(out_dir, files[0])))
    # a non-zero style seed must change the output image
    assert not np.array_equal(outs["zero"], outs["seeded"])

    # diversity metric (mean pairwise LPIPS over style seeds): finite,
    # positive for a style-conditioned model, deterministic across calls
    import pytest

    from uig.cli.eval_fid import run_eval_fid

    d1 = run_eval_fid(run_dir, num_samples=4, batch_size=2, diversity=2)
    d2 = run_eval_fid(run_dir, num_samples=4, batch_size=2, diversity=2)
    assert np.isfinite(d1) and d1 > 0 and d1 == d2
    with pytest.raises(ValueError, match=">=2 style seeds"):
        run_eval_fid(run_dir, num_samples=4, diversity=1)
