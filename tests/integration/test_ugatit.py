"""UGATIT trainer integration: training step finiteness + dynamics, SN state
advances and checkpoints, rho stays clipped, DP-2 == structure, CLI
roundtrip (train -> ckpt -> translate both directions)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from uig.config import apply_overrides, get_preset
from uig.runtime import make_mesh, shard_batch


def _cfg(extra=()):
    cfg = get_preset("ugatit256")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, g_base_features=8, d_base_features=4,
            n_res_blocks=1, ugatit_d_global_layers=4,
            ugatit_d_local_layers=3, compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, source="synthetic", batch_size=2,
                                 load_size=36),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )
    return apply_overrides(cfg, list(extra))


def _batch(mesh, load=36):
    from uig.data.datasets import SyntheticUnpairedDataset

    syn = SyntheticUnpairedDataset(4, load, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    return shard_batch(mesh, (a, b))


def _rhos(tree):
    out = []

    def f(path, leaf):
        if path and getattr(path[-1], "key", None) == "rho":
            out.append(np.asarray(leaf))
        return leaf

    jax.tree_util.tree_map_with_path(f, tree)
    return out


@pytest.mark.smoke
def test_train_step_runs_and_metrics_finite():
    from uig.train.ugatit_trainer import UGATITTrainer

    mesh = make_mesh(1)
    tr = UGATITTrainer(_cfg(), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh)
    sn0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.d_sn)]
    losses = []
    for _ in range(3):
        state, m = tr.train_step(state, batch)
        m = {k: float(v) for k, v in m.items()}
        assert np.isfinite(list(m.values())).all(), m
        losses.append(m)
    # all loss components present and live
    for k in ("g_adv", "g_cycle", "g_idt", "g_cam", "d_cam"):
        assert losses[-1][k] != 0.0, (k, losses[-1])
    # the SN power iteration advanced
    sn1 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.d_sn)]
    assert any(not np.array_equal(a, b) for a, b in zip(sn0, sn1))
    # every rho stayed inside [0, 1] (RhoClipper inside the step)
    for r in _rhos(state.g_params) + _rhos(state.ema):
        assert (r >= 0.0).all() and (r <= 1.0).all()


def test_dp2_runs_and_params_replicated():
    from uig.train.ugatit_trainer import UGATITTrainer

    mesh = make_mesh(2)
    tr = UGATITTrainer(_cfg(), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, m = tr.train_step(state, _batch(mesh))
    assert np.isfinite(list(map(float, m.values()))).all(), m


def test_translate_is_deterministic_and_direction_sensitive():
    from uig.train.ugatit_trainer import UGATITTrainer

    mesh = make_mesh(1)
    tr = UGATITTrainer(_cfg(), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, _ = tr.train_step(state, _batch(mesh))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3),
                                      jnp_dtype := np.float32) * 2 - 1)
    y1 = np.asarray(tr.translate(state.ema, x, "a2b"))
    y2 = np.asarray(tr.translate(state.ema, x, "a2b"))
    np.testing.assert_array_equal(y1, y2)
    yb = np.asarray(tr.translate(state.ema, x, "b2a"))
    assert np.abs(y1 - yb).max() > 1e-6
    heat = np.asarray(tr.attention_heatmap(state.ema, x, "a2b"))
    assert heat.shape == (2, 8, 8, 1)
    with pytest.raises(ValueError, match="direction"):
        tr.translate(state.ema, x, "sideways")


def test_ada_controller_with_ugatit():
    from uig.train.ugatit_trainer import UGATITTrainer

    mesh = make_mesh(1)
    cfg = _cfg(["loss.ada_target=0.6", "loss.ada_p_init=0.5",
                "loss.ada_speed_kimg=0.01"])
    tr = UGATITTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh)
    ps = []
    for _ in range(3):
        state, m = tr.train_step(state, batch)
        assert np.isfinite(list(map(float, m.values()))).all(), m
        ps.append(float(m["ada_p"]))
    assert any(abs(p - 0.5) > 1e-6 for p in ps), ps


def test_cli_roundtrip(tmp_path):
    """train 3 steps -> checkpoint -> translate both directions through the
    CLI; deterministic byte-equal re-translation."""
    from PIL import Image

    from uig.cli.main import main
    from uig.data.datasets import SyntheticUnpairedDataset

    syn = SyntheticUnpairedDataset(n=4, load_size=36, seed=0)
    for dom, arrs in (("a", syn.domain_a), ("b", syn.domain_b)):
        d = tmp_path / f"train_{dom}"
        d.mkdir()
        for i, arr in enumerate(arrs):
            Image.fromarray(arr).save(d / f"{i}.png")

    workdir = tmp_path / "runs"
    args = [
        "train", "--preset", "ugatit256",
        "--set", "model.image_size=32",
        "--set", "model.g_base_features=8",
        "--set", "model.d_base_features=4",
        "--set", "model.n_res_blocks=1",
        "--set", "model.ugatit_d_global_layers=4",
        "--set", "model.ugatit_d_local_layers=3",
        "--set", "model.compute_dtype=float32",
        "--set", f"data.dir_a={tmp_path / 'train_a'}",
        "--set", f"data.dir_b={tmp_path / 'train_b'}",
        "--set", "data.source=folders",
        "--set", "data.batch_size=2", "--set", "data.load_size=36",
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=2",
        "--set", "opt.total_steps=3", "--set", "run.ckpt_every=3",
        "--set", "run.log_every=1",
        "--set", f"run.workdir={workdir}", "--set", "run.name=ug",
    ]
    assert main(args) == 0
    run_dir = str(workdir / "ug")

    out1 = tmp_path / "out_a2b"
    assert main(["translate", "--run", run_dir,
                 "--input", str(tmp_path / "train_a"),
                 "--output", str(out1), "--direction", "a2b"]) == 0
    files = sorted(os.listdir(out1))
    assert len(files) == 4

    out2 = tmp_path / "out_b2a"
    assert main(["translate", "--run", run_dir,
                 "--input", str(tmp_path / "train_b"),
                 "--output", str(out2), "--direction", "b2a"]) == 0
    assert len(os.listdir(out2)) == 4

    out3 = tmp_path / "out_again"
    att = tmp_path / "attention"
    assert main(["translate", "--run", run_dir,
                 "--input", str(tmp_path / "train_a"),
                 "--output", str(out3), "--direction", "a2b",
                 "--attention-dir", str(att)]) == 0
    for f in files:
        assert (out1 / f).read_bytes() == (out3 / f).read_bytes()
    # CAM heatmaps: one grayscale PNG per input at the output size
    heats = sorted(os.listdir(att))
    assert heats == files
    img = Image.open(att / heats[0])
    assert img.mode == "L" and img.size == (32, 32)
