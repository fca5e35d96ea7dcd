"""StarGAN v2 trainer: style-based multi-domain multimodal translation.

Covers:
  * the 3-stream multi-domain pipeline (x, x_ref, x_ref2 per step): tuple
    contract, interleave layout, pure-function-of-counter resume,
  * training on a DP-2 mesh: all four networks update, every loss term is
    live and finite, style reconstruction falls, λ_ds decays linearly,
  * serving: deterministic per style seed, multimodal across seeds,
    reference-guided styles, loud errors,
  * full CLI train -> ckpt -> translate (--target-domain, --style-seed,
    --style-ref) roundtrip over folder domains.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.config import get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.starganv2_trainer import StarGANv2Trainer


def _cfg(batch=4, n_dom=2, ds_decay=20):
    cfg = get_preset("starganv2_256")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, num_domains=n_dom, g_base_features=8,
            d_base_features=8, v2_max_features=32, v2_style_dim=8,
            v2_latent_dim=4, compute_dtype="float32"),
        loss=dataclasses.replace(cfg.loss, ds_decay_steps=ds_decay),
        data=dataclasses.replace(cfg.data, source="synthetic",
                                 batch_size=batch, load_size=36,
                                 synthetic_len=12),
        opt=dataclasses.replace(cfg.opt, lr=1e-3),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )


def test_multidomain_pipeline_three_streams_and_resume():
    from uig.data.datasets import SyntheticMultiDomainDataset
    from uig.data.pipeline import MultiDomainPipeline

    doms = SyntheticMultiDomainDataset(2, n=8, load_size=36, seed=0).domains
    pipe = MultiDomainPipeline(doms, 4, mesh=None, seed=0, num_workers=1,
                               streams_per_step=3)
    b0 = pipe._load_batch(0)
    assert isinstance(b0, tuple) and len(b0) == 3
    assert all(a.shape == (4, 36, 36, 3) and a.dtype == np.uint8 for a in b0)
    # the three streams are independent draws but share the round-robin
    # label layout; stream j of batch t reads positions (3t + j)·k
    for j in range(3):
        for i in range(4):
            d = i % 2
            idx = pipe.streams[d].indices_at(j * 2 + i // 2, 1)[0]
            np.testing.assert_array_equal(b0[j][i], doms[d][idx])
    # streams differ from each other (independent samples)
    assert not np.array_equal(b0[0], b0[1])

    # one-integer resume replays the same 3-tuple
    next(pipe)
    next(pipe)
    state = pipe.state_dict()
    assert state == {"t_consumed": 2}
    pipe2 = MultiDomainPipeline(doms, 4, mesh=None, seed=0, num_workers=1,
                                streams_per_step=3)
    pipe2.load_state_dict(state)
    got = next(pipe2)
    want = pipe._load_batch(2)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

    with pytest.raises(ValueError, match="streams_per_step"):
        MultiDomainPipeline(doms, 4, mesh=None, streams_per_step=0)


def _batch(mesh, rng, n=4):
    raw = tuple(rng.integers(0, 255, (n, 36, 36, 3), dtype=np.uint8)
                for _ in range(3))
    return shard_batch(mesh, raw)


@pytest.mark.smoke
def test_starganv2_trains_dp2_all_terms_live():
    mesh = make_mesh(2)
    cfg = _cfg(batch=4, ds_decay=20)
    tr = StarGANv2Trainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    stys, dss, lds = [], [], []
    for _ in range(12):
        state, m = tr.train_step(state, _batch(mesh, rng))
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        stys.append(vals["g_sty"])
        dss.append(vals["g_ds"])
        lds.append(vals["lambda_ds"])
    # every canonical term is live
    assert min(dss) > 0 and float(m["d_r1"]) > 0
    # style reconstruction falls (E learns to read G's style injection)
    assert min(stys[6:]) < stys[0], stys
    # λ_ds decays linearly over ds_decay_steps=20
    want = [2.0 * (1 - t / 20) for t in range(12)]
    np.testing.assert_allclose(lds, want, rtol=1e-5)

    ema = jax.device_get(state.ema)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    # deterministic per seed, multimodal across seeds
    y0 = tr.translate(ema, x, 1, style_seed=0)
    np.testing.assert_array_equal(
        np.asarray(y0), np.asarray(tr.translate(ema, x, 1, style_seed=0)))
    assert np.abs(np.asarray(y0)
                  - np.asarray(tr.translate(ema, x, 1, style_seed=7))
                  ).max() > 1e-5
    # domain conditioning
    assert np.abs(np.asarray(y0)
                  - np.asarray(tr.translate(ema, x, 0, style_seed=0))
                  ).max() > 1e-5
    # reference-guided: explicit style overrides the latent path
    s = tr.encode_style(ema, x, 1)
    y_ref = tr.translate(ema, x, 1, style=s[:1])
    assert y_ref.shape == y0.shape
    assert not np.array_equal(np.asarray(y_ref), np.asarray(y0))
    # mapping-network styles match the translate path (separately-jitted
    # F+G vs fused program: same math, fp reassociation only)
    s_lat = tr.style_from_seed(ema, 0, 1)
    np.testing.assert_allclose(
        np.asarray(tr.translate(ema, x, 1, style=s_lat)), np.asarray(y0),
        atol=1e-4)

    with pytest.raises(ValueError, match="out of range"):
        tr.translate(ema, x, 2)
    with pytest.raises(ValueError, match="3-tuple"):
        tr.train_step(state, jnp.zeros((4, 36, 36, 3), jnp.uint8))


def test_starganv2_constructor_validation():
    mesh = make_mesh(2)
    bad = _cfg(batch=6, n_dom=4)  # 3 per device, not divisible by 4
    with pytest.raises(ValueError, match="multiple of"):
        StarGANv2Trainer(bad, mesh)
    fused = _cfg()
    fused = dataclasses.replace(
        fused, model=dataclasses.replace(fused.model, fused_applies=True))
    with pytest.raises(NotImplementedError, match="fused_applies"):
        StarGANv2Trainer(fused, mesh)


def test_starganv2_cli_train_ckpt_translate_roundtrip(tmp_path):
    from PIL import Image

    from uig.cli.main import main
    from uig.data.datasets import SyntheticMultiDomainDataset

    doms = SyntheticMultiDomainDataset(2, n=6, load_size=36, seed=0)
    dirs = doms.write_png_dirs(str(tmp_path / "data"))
    run_dir = os.path.join(tmp_path, "v2run")

    rc = main([
        "train", "--preset", "starganv2_256", "--max-steps", "4",
        "--set", "model.image_size=32", "--set", "model.num_domains=2",
        "--set", "model.g_base_features=8", "--set", "model.d_base_features=8",
        "--set", "model.v2_max_features=32", "--set", "model.v2_style_dim=8",
        "--set", "model.v2_latent_dim=4",
        "--set", "model.compute_dtype=float32",
        "--set", "data.batch_size=4", "--set", "data.load_size=36",
        "--set", "data.source=folders",
        "--set", "data.domain_dirs=" + ",".join(dirs),
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=2",
        "--set", "parallel.multihost=False",
        "--set", f"run.workdir={tmp_path}", "--set", "run.name=v2run",
        "--set", "run.ckpt_every=4", "--set", "run.log_every=2",
        "--set", "eval.sample_grid_every=0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    # latent-driven translation: two seeds -> two modes
    outs = {}
    for seed in (0, 7):
        out_dir = os.path.join(tmp_path, f"translated_s{seed}")
        rc = main(["translate", "--run-dir", run_dir, "--input-dir", dirs[0],
                   "--output-dir", out_dir, "--target-domain", "1",
                   "--style-seed", str(seed), "--batch-size", "3"])
        assert rc == 0
        files = sorted(os.listdir(out_dir))
        assert len(files) == 6
        outs[seed] = np.asarray(Image.open(os.path.join(out_dir, files[0])))
    assert not np.array_equal(outs[0], outs[7])

    # reference-guided translation
    ref = os.path.join(dirs[1], sorted(os.listdir(dirs[1]))[0])
    out_dir = os.path.join(tmp_path, "translated_ref")
    rc = main(["translate", "--run-dir", run_dir, "--input-dir", dirs[0],
               "--output-dir", out_dir, "--target-domain", "1",
               "--style-ref", ref, "--batch-size", "3"])
    assert rc == 0
    assert len(os.listdir(out_dir)) == 6
