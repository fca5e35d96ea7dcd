"""steps_per_dispatch (k-step scan per dispatch, train/multi_step.py):
identical math to k separate dispatches, loud cadence validation, and the
fit() integration path."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from uig.config import apply_overrides, get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.cyclegan import CycleGANTrainer
from uig.train.multi_step import build_multi_step, validate_dispatch_alignment


def _cfg(batch=2):
    c = get_preset("smoke64")
    return dataclasses.replace(
        c,
        model=dataclasses.replace(c.model, image_size=16, n_res_blocks=1,
                                  d_layers=2, compute_dtype="float32"),
        data=dataclasses.replace(c.data, batch_size=batch, load_size=20),
        opt=dataclasses.replace(c.opt, pool_size=4),
    )


def test_multi_step_matches_single_steps():
    """k=2 over 4 steps == 4 single dispatches: same scanned body, same
    per-step keys (derived from state.step in the carry) — final params and
    last-step metrics must match to float-determinism tolerance."""
    rng = np.random.default_rng(0)
    batches = [
        (rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8),
         rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8))
        for _ in range(4)
    ]

    mesh = make_mesh(2)
    # sgd: XLA may fuse the scan body differently from the standalone step
    # program (reassociation-level fp noise), and adam's g/sqrt(v) amplifies
    # that to ~lr scale — same choice as the remat/fused-applies equivalence
    # tests
    cfg = _cfg(2)
    cfg = dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, optimizer="sgd"))
    tr = CycleGANTrainer(cfg, mesh)

    state = tr.init_state(jax.random.PRNGKey(0))
    for a, b in batches:
        state, m_single = tr.train_step(state, shard_batch(mesh, (a, b)))
    single_params = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state.g_params))
    m_single = {k: float(v) for k, v in m_single.items()}

    step_k = build_multi_step(tr, 2)
    state2 = tr.init_state(jax.random.PRNGKey(0))
    dev = [shard_batch(mesh, p) for p in batches]
    state2, _ = step_k(state2, dev[:2])
    state2, m_multi = step_k(state2, dev[2:])
    multi_params = jax.tree_util.tree_map(
        np.asarray, jax.device_get(state2.g_params))
    m_multi = {k: float(v) for k, v in m_multi.items()}

    assert int(state2.step) == 4
    for k_ in m_single:
        np.testing.assert_allclose(m_single[k_], m_multi[k_], rtol=1e-5,
                                   atol=1e-6, err_msg=k_)
    for x, y in zip(jax.tree_util.tree_leaves(single_params),
                    jax.tree_util.tree_leaves(multi_params)):
        np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-6)


def test_dispatch_alignment_validation():
    cfg = _cfg(2)
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, steps_per_dispatch=4,
                                     log_every=6, ckpt_every=8))
    with pytest.raises(ValueError, match="log_every"):
        validate_dispatch_alignment(cfg)
    ok = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, log_every=8))
    validate_dispatch_alignment(ok)  # no raise
    with pytest.raises(ValueError, match=">= 2"):
        build_multi_step(CycleGANTrainer(_cfg(2), make_mesh(1)), 1)


def test_fit_with_steps_per_dispatch(tmp_path):
    """fit() drives the k-dispatch path end to end: metrics logged at
    aligned boundaries, checkpoint written, run completes."""
    from uig.train.loop import fit

    cfg = apply_overrides(_cfg(2), [
        "run.steps_per_dispatch=2", "run.log_every=2", "run.ckpt_every=4",
        "opt.total_steps=6", "eval.sample_grid_every=0",
        "data.source=synthetic", "data.synthetic_len=8",
        "data.num_workers=1",
        f"run.workdir={tmp_path}", "run.name=msrun",
        "parallel.num_devices=2",
    ])
    final = fit(cfg)
    assert final and all(np.isfinite(v) for v in final.values())
    lines = [json.loads(line) for line in
             open(os.path.join(tmp_path, "msrun", "metrics.jsonl"))]
    steps = [r["step"] for r in lines if "g_loss" in r]
    assert steps == [2, 4, 6], steps
    assert os.path.isdir(os.path.join(tmp_path, "msrun", "ckpt"))


def test_multi_step_prior_trainer():
    """The VQGAN-prior trainer threads frozen stage-1 params as an extra
    replicated argument — build_multi_step must pass it through."""
    import jax.numpy as jnp

    from uig.models.vqgan import VQGANGenerator
    from uig.train.prior_trainer import PriorTrainer

    cfg = apply_overrides(get_preset("smoke64"), [
        "model.kind=vqgan_prior", "model.image_size=16",
        "model.vq_channel_mults=(1,2)", "model.vq_base_features=16",
        "model.vq_embed_dim=16", "model.vq_codebook_size=64",
        "model.vq_attn_resolutions=(8,)", "model.attn_impl=xla",
        "model.prior_dim=64", "model.prior_depth=1", "model.prior_heads=4",
        "model.compute_dtype=float32",
        "data.batch_size=2", "data.load_size=20",
        "opt.optimizer=sgd",
    ])
    vq = VQGANGenerator(base_features=16, channel_mults=(1, 2), embed_dim=16,
                        codebook_size=64, attn_resolutions=(8,),
                        attn_impl="xla")
    vq_params = vq.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))
    mesh = make_mesh(2)
    tr = PriorTrainer(cfg, mesh, vqgan_params=vq_params)

    rng = np.random.default_rng(1)
    batches = [
        shard_batch(mesh, (rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8),
                           rng.integers(0, 255, (2, 20, 20, 3), dtype=np.uint8)))
        for _ in range(2)
    ]
    state = tr.init_state(jax.random.PRNGKey(0))
    for bt in batches:
        state, m1 = tr.train_step(state, bt)
    p1 = jax.tree_util.tree_map(np.asarray, jax.device_get(state.params))

    step_k = build_multi_step(tr, 2)
    state2 = tr.init_state(jax.random.PRNGKey(0))
    state2, m2 = step_k(state2, batches)
    p2 = jax.tree_util.tree_map(np.asarray, jax.device_get(state2.params))

    assert int(state2.step) == 2
    for k_ in {k: float(v) for k, v in m1.items()}:
        np.testing.assert_allclose(float(m1[k_]), float(m2[k_]), rtol=1e-5,
                                   atol=1e-6, err_msg=k_)
    for x, y in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-6)
