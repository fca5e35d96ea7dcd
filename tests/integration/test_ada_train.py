"""ADA in the compiled step (train/ada.py): the controller moves p from the
overfitting heuristic, the p state checkpoints/carries, fixed-p DiffAugment
works without a controller, and both CycleGAN and CUT wire it."""

import dataclasses

import jax
import numpy as np
import pytest

from uig.config import apply_overrides, get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.cut import CUTTrainer
from uig.train.cyclegan import CycleGANTrainer


def _cfg(extra=()):
    cfg = get_preset("smoke64")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=16, n_res_blocks=1,
                                  d_layers=2, nce_layers=(0, 2)),
        data=dataclasses.replace(cfg.data, batch_size=2, load_size=20),
        opt=dataclasses.replace(cfg.opt, pool_size=4),
    )
    return apply_overrides(cfg, list(extra))


def _batch(mesh):
    from uig.data.datasets import SyntheticUnpairedDataset

    syn = SyntheticUnpairedDataset(4, 20, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    return shard_batch(mesh, (a, b))


def test_controller_moves_p_and_carries_state():
    # tiny speed => |Δp| = 2/(0.01·1000) = 0.2 per step: p must move every
    # step, whichever direction the heuristic picks
    mesh = make_mesh(1)
    cfg = _cfg(["loss.ada_target=0.6", "loss.ada_p_init=0.5",
                "loss.ada_speed_kimg=0.01"])
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    assert float(state.ada_p) == pytest.approx(0.5)
    batch = _batch(mesh)
    ps = []
    for _ in range(4):
        state, m = tr.train_step(state, batch)
        assert np.isfinite(list(map(float, m.values()))).all(), m
        ps.append(float(m["ada_p"]))
        assert -1.0 <= float(m["ada_rt"]) <= 1.0
    assert all(abs(a - b) > 1e-6 or {a, b} <= {0.0, 1.0}
               for a, b in zip(ps, ps[1:])), ps
    assert float(state.ada_p) == pytest.approx(ps[-1])


def test_fixed_p_diffaugment_no_controller():
    mesh = make_mesh(1)
    cfg = _cfg(["loss.ada_p_init=0.8"])  # ada_target stays 0
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh)
    state, m = tr.train_step(state, batch)
    assert float(m["ada_p"]) == pytest.approx(0.8)
    assert "ada_rt" not in m
    state, m = tr.train_step(state, batch)
    assert float(m["ada_p"]) == pytest.approx(0.8)  # fixed


def test_ada_off_has_no_ada_metrics():
    mesh = make_mesh(1)
    tr = CycleGANTrainer(_cfg(), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, m = tr.train_step(state, _batch(mesh))
    assert "ada_p" not in m and "ada_rt" not in m


def test_cut_ada_controller():
    mesh = make_mesh(1)
    cfg = _cfg(["model.kind=cut", "loss.ada_target=0.6",
                "loss.ada_p_init=0.5", "loss.ada_speed_kimg=0.01"])
    tr = CUTTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = _batch(mesh)
    ps = []
    for _ in range(3):
        state, m = tr.train_step(state, batch)
        assert np.isfinite(list(map(float, m.values()))).all(), m
        ps.append(float(m["ada_p"]))
    assert any(abs(p - 0.5) > 1e-6 for p in ps), ps


def test_adaptive_ada_rejects_wgan():
    mesh = make_mesh(1)
    cfg = _cfg(["loss.gan_mode=wgan", "loss.ada_target=0.6"])
    with pytest.raises(ValueError, match="decision boundary"):
        CycleGANTrainer(cfg, mesh)


def _unit_like_cfg(kind, extra=()):
    """Tiny config for the UNIT/MUNIT family at 32²."""
    preset = {"unit": "unit256", "munit": "munit256"}[kind]
    cfg = get_preset(preset)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, g_base_features=8,
            unit_private_res=1, unit_shared_res=1, d_layers=2,
            d_num_scales=2, compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, source="synthetic",
                                 batch_size=2, load_size=36),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )
    return apply_overrides(cfg, list(extra))


def _ab_batch(mesh, load=36):
    from uig.data.datasets import SyntheticUnpairedDataset

    syn = SyntheticUnpairedDataset(4, load, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    return shard_batch(mesh, (a, b))


ADA_ON = ("loss.ada_target=0.6", "loss.ada_p_init=0.5",
          "loss.ada_speed_kimg=0.01")


def test_unit_ada_controller():
    from uig.train.unit_trainer import UNITTrainer

    mesh = make_mesh(1)
    tr = UNITTrainer(_unit_like_cfg("unit", ADA_ON), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = _ab_batch(mesh)
    ps = []
    for _ in range(3):
        state, m = tr.train_step(state, batch)
        assert np.isfinite(list(map(float, m.values()))).all(), m
        ps.append(float(m["ada_p"]))
        assert -1.0 <= float(m["ada_rt"]) <= 1.0
    assert any(abs(p - 0.5) > 1e-6 for p in ps), ps
    assert float(state.ada_p) == pytest.approx(ps[-1])


def test_munit_ada_controller_multiscale_heuristic():
    from uig.train.munit_trainer import MUNITTrainer

    mesh = make_mesh(1)
    tr = MUNITTrainer(_unit_like_cfg("munit", ADA_ON), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    batch = _ab_batch(mesh)
    ps = []
    for _ in range(3):
        state, m = tr.train_step(state, batch)
        assert np.isfinite(list(map(float, m.values()))).all(), m
        ps.append(float(m["ada_p"]))
        assert -1.0 <= float(m["ada_rt"]) <= 1.0
    assert any(abs(p - 0.5) > 1e-6 for p in ps), ps


def test_stargan_fixed_p_diffaugment_with_wgan():
    """The canonical StarGAN recipe is WGAN-GP: the adaptive controller is
    rejected (no decision boundary) but fixed-p DiffAugment must run."""
    from uig.train.stargan_trainer import StarGANTrainer

    cfg = get_preset("stargan128")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, num_domains=2, g_base_features=8,
            d_base_features=8, n_res_blocks=1, d_layers=3,
            compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, source="synthetic", batch_size=2,
                                 load_size=36, synthetic_len=12),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )
    mesh = make_mesh(1)
    with pytest.raises(ValueError, match="decision boundary"):
        StarGANTrainer(apply_overrides(cfg, ["loss.ada_target=0.6"]), mesh)

    tr = StarGANTrainer(apply_overrides(cfg, ["loss.ada_p_init=0.7"]), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    from uig.data.datasets import SyntheticMultiDomainDataset

    doms = SyntheticMultiDomainDataset(2, n=4, load_size=36, seed=0).domains
    raw = np.stack([doms[0][0], doms[1][0]])
    batch = shard_batch(mesh, (raw,))[0]
    for _ in range(2):
        state, m = tr.train_step(state, batch)
        assert np.isfinite(list(map(float, m.values()))).all(), m
        assert float(m["ada_p"]) == pytest.approx(0.7)
        assert "ada_rt" not in m


def test_vaegan_ada_controller_frozen_during_warmup():
    from uig.train.vaegan_trainer import VAEGANTrainer

    cfg = get_preset("vqgan512")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, kind="vaegan", image_size=32, vq_base_features=16,
            vq_channel_mults=(1, 2), vq_embed_dim=8,
            vq_attn_resolutions=(16,), d_layers=2, compute_dtype="float32",
            vq_beta=0.01),
        data=dataclasses.replace(cfg.data, batch_size=2, load_size=36),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )
    mesh = make_mesh(1)
    batch = _ab_batch(mesh)

    # D warmup (vq_disc_start in the future): p must not move
    warm = apply_overrides(cfg, list(ADA_ON) + ["loss.vq_disc_start=1000"])
    tr = VAEGANTrainer(warm, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    for _ in range(2):
        state, m = tr.train_step(state, batch)
        assert np.isfinite(list(map(float, m.values()))).all(), m
        assert float(m["ada_p"]) == pytest.approx(0.5)

    # D active: the controller moves p
    live = apply_overrides(cfg, list(ADA_ON) + ["loss.vq_disc_start=0"])
    tr = VAEGANTrainer(live, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    ps = []
    for _ in range(3):
        state, m = tr.train_step(state, batch)
        ps.append(float(m["ada_p"]))
    assert any(abs(p - 0.5) > 1e-6 for p in ps), ps


def test_dp2_matches_dp1_with_ada_off_shapes():
    """ADA state field must not break the sharded step (8-device mesh)."""
    mesh = make_mesh(2)
    cfg = _cfg(["loss.ada_target=0.6", "loss.ada_p_init=0.2",
                "loss.ada_speed_kimg=0.01"])
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, m = tr.train_step(state, _batch(mesh))
    assert np.isfinite(list(map(float, m.values()))).all(), m
    # p is replicated: one scalar, consistent across the mesh
    assert 0.0 <= float(state.ada_p) <= 1.0
