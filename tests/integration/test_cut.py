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


@pytest.mark.smoke
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


def test_flip_equivariance_feature_flip_semantics():
    """flip_q=True must equal externally pre-flipping the QUERY features —
    and the keys must NOT be flipped."""
    import jax.numpy as jnp

    mesh = make_mesh(1)
    tr = CUTTrainer(_cfg(2), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    g = jax.device_get(state.g_params)
    # per-tap channel dims must match the projection heads' init
    from uig.models import ResNetGenerator

    shapes = [f.shape for f in tr.generator.apply(
        g["gen"], jnp.zeros((2, 16, 16, 3)), tr.taps,
        method=ResNetGenerator.encode_features)]
    rng = np.random.default_rng(1)
    f_src = [jnp.asarray(rng.normal(size=s).astype(np.float32))
             for s in shapes]
    f_dst = [jnp.asarray(rng.normal(size=s).astype(np.float32))
             for s in shapes]
    key = jax.random.PRNGKey(7)
    on = tr._nce_from_feats(g, f_src, f_dst, key,
                            flip_q=jnp.asarray(True))
    pre = tr._nce_from_feats(g, f_src, [f[:, :, ::-1, :] for f in f_dst],
                             key, flip_q=None)
    np.testing.assert_allclose(float(on), float(pre), rtol=1e-6)
    off = tr._nce_from_feats(g, f_src, f_dst, key,
                             flip_q=jnp.asarray(False))
    base = tr._nce_from_feats(g, f_src, f_dst, key, flip_q=None)
    np.testing.assert_allclose(float(off), float(base), rtol=1e-6)
    assert abs(float(on) - float(base)) > 1e-7  # the flip actually matters


def test_fastcut_preset_trains():
    """FastCUT recipe: no identity NCE pass, lambda_nce=10,
    flip-equivariance — steps run, metrics finite, nce_idt stays zero."""
    cfg = _cfg(2)
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(
            cfg.loss, nce_include_identity=False, lambda_nce=10.0,
            nce_flip_equivariance=True))
    mesh = make_mesh(2)
    tr = CUTTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    batch = shard_batch(mesh, (a, b))
    for _ in range(4):
        state, m = tr.train_step(state, batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        assert vals["nce_idt"] == 0.0
        assert vals["nce"] > 0

    from uig.config import get_preset

    p = get_preset("fastcut256")
    assert p.model.kind == "cut"
    assert not p.loss.nce_include_identity
    assert p.loss.nce_flip_equivariance
    assert p.loss.lambda_nce == 10.0


def test_cut_antialias_resample_trains():
    """model.resample=antialias (the official CUT generator's default
    topology — blur-pool downs, blur-upsample ups) trains end to end; taps
    index the shifted antialias layer list."""
    cfg = _cfg(2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, resample="antialias",
                                       nce_layers=(0, 4, 6, 10)))
    mesh = make_mesh(2)
    tr = CUTTrainer(cfg, mesh)
    assert tr.generator.num_layers == 3 + 8 + 1 + 8 + 2
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)
    batch = shard_batch(mesh, (a, b))
    losses = []
    for _ in range(6):
        state, m = tr.train_step(state, batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        losses.append(vals)
    assert losses[-1]["g_loss"] < losses[0]["g_loss"]

    import jax.numpy as jnp

    y = tr.translate(state.ema, jnp.zeros((1, 16, 16, 3)))
    assert y.shape == (1, 16, 16, 3)
