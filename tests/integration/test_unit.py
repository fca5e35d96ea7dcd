"""UNIT trainer: shared-latent structure, training dynamics, translate.

Covers the SURVEY.md §0 lineage member UNIT (shared-latent VAE pair):
  * the shared residual blocks exist ONCE in the param tree (the
    shared-latent-space assumption is structural, not a copy),
  * both domains' losses reach the shared params (grads flow),
  * recon falls over a few steps on the synthetic set (DP-2 mesh),
  * translate is deterministic and works in both directions,
  * build_trainer dispatch + preset round-trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uig.config import apply_overrides, get_preset
from uig.models.unit import UNITGenerator
from uig.runtime import make_mesh, shard_batch
from uig.train.unit_trainer import UNITTrainer
import pytest


def _cfg(batch=2):
    cfg = get_preset("unit256")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, g_base_features=8,
            unit_private_res=1, unit_shared_res=1, d_layers=2,
            compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, source="synthetic",
                                 batch_size=batch, load_size=36),
        opt=dataclasses.replace(cfg.opt, lr=1e-3),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )


def _flat_names(tree):
    return {"/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_unit_shared_params_are_single():
    g = UNITGenerator(base_features=8, n_private_res=1, n_shared_res=2)
    x = jnp.zeros((1, 32, 32, 3))
    params = g.init(jax.random.PRNGKey(0), x, x)
    names = _flat_names(params)
    # private groups per domain + shared groups exactly once
    assert any(n.startswith("params/enc_a/") for n in names)
    assert any(n.startswith("params/enc_b/") for n in names)
    assert any(n.startswith("params/shared_enc_0/") for n in names)
    assert any(n.startswith("params/shared_enc_1/") for n in names)
    assert any(n.startswith("params/shared_dec_0/") for n in names)
    # no duplicated per-domain copy of the shared blocks
    assert not any("shared_enc_0_a" in n or "shared_enc_a" in n for n in names)

    out = g.apply(params, x, x)
    assert out["x_ab"].shape == (1, 32, 32, 3)
    assert out["mu_a"].shape == (1, 8, 8, 32)  # quarter res, 4*base channels
    assert out["mu_a"].dtype == jnp.float32


def test_unit_shared_params_get_grads_from_both_domains():
    g = UNITGenerator(base_features=8, n_private_res=1, n_shared_res=1)
    xa = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    xb = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    params = g.init(jax.random.PRNGKey(0), xa, xb)

    def loss_a_only(p):
        # domain-a pass only: grads must still reach the SHARED blocks
        return jnp.mean(jnp.square(g.apply(
            p, g.apply(p, xa, "a", method=UNITGenerator.encode), "a",
            method=UNITGenerator.decode)))

    grads = jax.grad(loss_a_only)(params)
    shared = grads["params"]["shared_enc_0"]
    norm = sum(float(jnp.sum(jnp.abs(v)))
               for v in jax.tree_util.tree_leaves(shared))
    assert norm > 0, "domain-a loss did not reach shared encoder params"
    # domain-b private params untouched by a domain-a-only loss
    encb = grads["params"]["enc_b"]
    normb = sum(float(jnp.sum(jnp.abs(v)))
                for v in jax.tree_util.tree_leaves(encb))
    assert normb == 0


@pytest.mark.smoke
def test_unit_trains_and_translates():
    from uig.data.datasets import SyntheticUnpairedDataset

    mesh = make_mesh(2)
    tr = UNITTrainer(_cfg(2), mesh)
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
        recs.append(vals["g_rec"])
    assert min(recs[8:]) < recs[0], f"recon did not fall: {recs}"

    x = jnp.zeros((1, 32, 32, 3))
    y1 = tr.translate(state.ema, x, "a2b")
    y2 = tr.translate(state.ema, x, "a2b")
    z = tr.translate(state.ema, x, "b2a")
    assert y1.shape == z.shape == (1, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    assert np.isfinite(np.asarray(z)).all()
    # the two directions are different functions (private decoders)
    assert not np.allclose(np.asarray(y1), np.asarray(z))


def test_unit_via_build_trainer_and_overrides():
    from uig.train.loop import build_trainer

    cfg = _cfg(2)
    tr = build_trainer(cfg, make_mesh(1))
    assert type(tr).__name__ == "UNITTrainer"
    assert tr.directions == ("a2b", "b2a")
    cfg2 = apply_overrides(cfg, ["model.unit_shared_res=3",
                                 "loss.lambda_unit_kl=0.1"])
    assert cfg2.model.unit_shared_res == 3
    assert cfg2.loss.lambda_unit_kl == 0.1


def test_unit_fused_applies_matches_separate():
    """model.fused_applies batches each private decoder's two latents
    (reconstruction + cross-domain translation) at 2B, and each D's
    real/fake pair — same math (InstanceNorm is per-example), so a full
    train step must match up to conv-batch fp reassociation."""
    import dataclasses as dc

    from uig.data.datasets import SyntheticUnpairedDataset

    def cfg(fused):
        c = _cfg(2)
        return dc.replace(
            c,
            model=dc.replace(c.model, fused_applies=fused),
            # sgd: adam's g/sqrt(v) amplifies reassociation-level grad noise
            opt=dc.replace(c.opt, optimizer="sgd"),
        )

    syn = SyntheticUnpairedDataset(4, 36, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    outs = {}
    for fused in (False, True):
        mesh = make_mesh(1)
        tr = UNITTrainer(cfg(fused), mesh)
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
        np.testing.assert_allclose(x, y, atol=5e-5)


def test_unit_cli_train_ckpt_translate(tmp_path):
    """Full UNIT production path: CLI train (fit -> orbax ckpt with the
    UNITState structure) -> translate CLI restores the run and serves BOTH
    directions from EMA weights."""
    import json
    import os

    from uig.cli.main import main
    from uig.data.datasets import SyntheticUnpairedDataset

    syn = SyntheticUnpairedDataset(n=6, load_size=20, seed=0)
    dir_a, dir_b = syn.write_png_dirs(str(tmp_path / "data"))
    run_dir = os.path.join(tmp_path, "unitrun")

    rc = main([
        "train", "--preset", "unit256", "--max-steps", "3",
        "--set", "model.image_size=16", "--set", "model.g_base_features=8",
        "--set", "model.unit_private_res=1", "--set", "model.unit_shared_res=1",
        "--set", "model.d_layers=2", "--set", "data.batch_size=2",
        "--set", "data.load_size=20", "--set", "data.source=folders",
        "--set", f"data.dir_a={dir_a}", "--set", f"data.dir_b={dir_b}",
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=2",
        "--set", "parallel.multihost=False",
        "--set", f"run.workdir={tmp_path}", "--set", "run.name=unitrun",
        "--set", "run.ckpt_every=2", "--set", "run.log_every=2",
        "--set", "eval.sample_grid_every=0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    for direction in ("a2b", "b2a"):
        out_dir = os.path.join(tmp_path, f"translated_{direction}")
        rc = main(["translate", "--run-dir", run_dir, "--input-dir", dir_a,
                   "--output-dir", out_dir, "--direction", direction,
                   "--batch-size", "3"])
        assert rc == 0
        assert len(os.listdir(out_dir)) == 6


def test_unit_remat_modes_run_and_match():
    """model.remat=full/blocks must compile (jax.checkpoint sees array-only
    args — the code-review regression) and match remat=none math (sgd)."""
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
        tr = UNITTrainer(c, mesh)
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


def test_unit_s2d_knobs_are_wired_and_param_compatible():
    """head/stem/down s2d execute the same linear maps with the same params
    (checkpoint-compatible, fp reassociation only) — and actually apply."""
    kw = dict(base_features=8, n_private_res=1, n_shared_res=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    base = UNITGenerator(**kw)
    params = base.init(jax.random.PRNGKey(0), x, x)
    y0 = base.apply(params, x, "a", "b", method=UNITGenerator.translate)
    s2d = UNITGenerator(stem_s2d=4, down_s2d=2, head_s2d=4, **kw)
    y1 = s2d.apply(params, x, "a", "b", method=UNITGenerator.translate)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)
