"""Serving export (uig.serving / `uig export`): the frozen StableHLO
artifact must reproduce the live translate path byte-for-byte, load
without the run directory, and enforce its static batch contract."""

import json
import os

import numpy as np
import pytest


def _train_tiny(tmp_path, name="exprun", kind_args=()):
    from uig.cli.main import main

    workdir = tmp_path / "runs"
    args = [
        "train", "--preset", "cyclegan128",
        "--set", "model.image_size=16",
        "--set", "model.g_base_features=8",
        "--set", "model.d_base_features=8",
        "--set", "model.n_res_blocks=1",
        "--set", "model.d_layers=2",
        "--set", "model.compute_dtype=float32",
        "--set", "data.source=synthetic", "--set", "data.synthetic_len=8",
        "--set", "data.batch_size=2", "--set", "data.load_size=20",
        "--set", "data.num_workers=1",
        "--set", "opt.total_steps=2", "--set", "opt.pool_size=4",
        "--set", "run.ckpt_every=2", "--set", "run.log_every=1",
        "--set", "parallel.num_devices=1",
        "--set", "parallel.multihost=False",
        "--set", f"run.workdir={workdir}", "--set", f"run.name={name}",
    ] + list(kind_args)
    assert main(args) == 0
    return str(workdir / name)


def test_export_matches_live_translate_and_reloads(tmp_path):
    from uig.cli.main import main
    from uig.serving import load_exported

    run_dir = _train_tiny(tmp_path)
    art = tmp_path / "artifact"
    # CPU-only platform in tests: the fake-device env has no TPU lowering
    assert main(["export", "--run-dir", run_dir,
                 "--output-dir", str(art), "--batch-size", "4",
                 "--platforms", "cpu"]) == 0
    assert sorted(os.listdir(art)) == ["fn.stablehlo", "meta.json"]
    meta = json.loads((art / "meta.json").read_text())
    assert meta["input"] == [4, 20, 20, 3]
    assert meta["output"] == [4, 16, 16, 3]
    assert meta["direction"] == "a2b"

    f = load_exported(str(art))
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (4, 20, 20, 3), dtype=np.uint8)
    out = f(raw)
    assert out.shape == (4, 16, 16, 3) and out.dtype == np.uint8

    # byte-identical to the live framework path on the same input
    import jax.numpy as jnp

    from uig.cli.translate import load_run
    from uig.kernels import center_crop_normalize, denormalize_to_u8

    cfg, trainer, state = load_run(run_dir)
    x = center_crop_normalize(jnp.asarray(raw), cfg.model.image_size)
    live = np.asarray(denormalize_to_u8(
        trainer.translate(state.ema, x, "a2b")))
    np.testing.assert_array_equal(out, live)

    # static-batch contract: shorter batches pad+trim, larger ones fail
    out2 = f(raw[:3])
    np.testing.assert_array_equal(out2, out[:3])
    with pytest.raises(ValueError, match="out of range"):
        f(np.concatenate([raw, raw]))


def test_export_rejects_bad_target_domain(tmp_path):
    from uig.serving import export_translate

    run_dir = _train_tiny(tmp_path, name="exprun2")
    with pytest.raises(ValueError, match="stargan"):
        export_translate(run_dir, str(tmp_path / "a"), target_domain=1)


def test_export_starganv2_bakes_domain_and_style(tmp_path):
    from uig.cli.main import main
    from uig.data.datasets import SyntheticMultiDomainDataset
    from uig.serving import load_exported

    doms = SyntheticMultiDomainDataset(2, n=4, load_size=36, seed=0)
    dirs = doms.write_png_dirs(str(tmp_path / "data"))
    workdir = tmp_path / "runs"
    assert main([
        "train", "--preset", "starganv2_256", "--max-steps", "2",
        "--set", "model.image_size=32", "--set", "model.num_domains=2",
        "--set", "model.g_base_features=8", "--set", "model.d_base_features=8",
        "--set", "model.v2_max_features=32", "--set", "model.v2_style_dim=8",
        "--set", "model.v2_latent_dim=4",
        "--set", "model.compute_dtype=float32",
        "--set", "data.batch_size=2", "--set", "data.load_size=36",
        "--set", "data.source=folders",
        "--set", "data.domain_dirs=" + ",".join(dirs),
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=1",
        "--set", "parallel.multihost=False", "--set", "opt.total_steps=2",
        "--set", "run.ckpt_every=2", "--set", "run.log_every=1",
        "--set", f"run.workdir={workdir}", "--set", "run.name=v2exp",
        "--set", "eval.sample_grid_every=0",
    ]) == 0
    run_dir = str(workdir / "v2exp")

    art = tmp_path / "artifact_v2"
    assert main(["export", "--run-dir", run_dir, "--output-dir", str(art),
                 "--batch-size", "2", "--target-domain", "1",
                 "--style-seed", "7", "--platforms", "cpu"]) == 0
    meta = json.loads((art / "meta.json").read_text())
    assert meta["kind"] == "starganv2"
    assert meta["target_domain"] == 1 and meta["style_seed"] == 7

    import jax.numpy as jnp

    from uig.cli.translate import load_run
    from uig.kernels import center_crop_normalize, denormalize_to_u8

    f = load_exported(str(art))
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (2, 36, 36, 3), dtype=np.uint8)
    out = f(raw)
    cfg, trainer, state = load_run(run_dir)
    x = center_crop_normalize(jnp.asarray(raw), cfg.model.image_size)
    live = np.asarray(denormalize_to_u8(
        trainer.translate(state.ema, x, 1, style_seed=7)))
    np.testing.assert_array_equal(out, live)
