"""VQGAN trainer: step sanity, codebook behavior, disc gating, loop run."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uig.config import get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.vqgan_trainer import VQGANTrainer
import pytest


def _cfg(batch=2, disc_start=0):
    cfg = get_preset("vqgan512")
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, vq_base_features=16,
            vq_channel_mults=(1, 2), vq_embed_dim=8, vq_codebook_size=32,
            vq_attn_resolutions=(16,), d_layers=2, compute_dtype="float32",
            attn_impl="pallas"),
        loss=dataclasses.replace(cfg.loss, vq_disc_start=disc_start),
        data=dataclasses.replace(cfg.data, batch_size=batch, load_size=36),
        opt=dataclasses.replace(cfg.opt, lr=1e-3),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )
    return cfg


def test_vqgan_quantizer_properties():
    from uig.models.vqgan import VectorQuantizer

    vq = VectorQuantizer(codebook_size=16, embed_dim=4)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 3, 4))
    params = vq.init(jax.random.PRNGKey(1), z)
    out = vq.apply(params, z)
    assert out.codes.shape == (2, 3, 3)
    assert out.codes.dtype == jnp.int32
    assert float(out.perplexity) <= 16.0
    # straight-through: forward value equals codebook entry
    emb = vq.apply(params, out.codes, method=VectorQuantizer.embed)
    np.testing.assert_allclose(np.asarray(out.quantized), np.asarray(emb),
                               atol=1e-6)
    # gradient flows to z (straight-through), not blocked
    g = jax.grad(lambda z: jnp.sum(vq.apply(params, z).quantized))(z)
    assert np.abs(np.asarray(g)).sum() > 0


@pytest.mark.smoke
def test_vqgan_trains_and_reconstructs():
    from uig.data.datasets import SyntheticUnpairedDataset

    mesh = make_mesh(2)
    # pure autoencoder phase (disc gated off) — recon must fall
    tr = VQGANTrainer(_cfg(2, disc_start=1000), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    syn = SyntheticUnpairedDataset(4, 36, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    batch = shard_batch(mesh, (a, b))
    recs = []
    for _ in range(20):
        state, m = tr.train_step(state, batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        recs.append(vals["rec"])
    assert min(recs[10:]) < recs[0], f"recon loss did not fall: {recs}"

    y = tr.translate(state.ema, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)
    codes = jnp.zeros((1, 16, 16), jnp.int32)
    img = tr.decode_codes(state.ema, codes)
    assert img.shape == (1, 32, 32, 3)


def test_disc_gating():
    """Before vq_disc_start, D params must not move and d_loss metric is 0."""
    mesh = make_mesh(1)
    tr = VQGANTrainer(_cfg(2, disc_start=100), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    d0 = jax.tree_util.tree_map(np.asarray, jax.device_get(state.d_params))
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, (2, 36, 36, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (2, 36, 36, 3), dtype=np.uint8)
    batch = shard_batch(mesh, (a, b))
    state, m = tr.train_step(state, batch)
    assert float(m["d_loss"]) == 0.0
    d1 = jax.tree_util.tree_map(np.asarray, jax.device_get(state.d_params))
    for x, y in zip(jax.tree_util.tree_leaves(d0), jax.tree_util.tree_leaves(d1)):
        np.testing.assert_array_equal(x, y)


def test_vqgan_adaptive_adversarial_weight():
    """loss.vq_adaptive_weight=True: lambda_adapt follows the grad-norm
    ratio (finite, positive, not pinned at the off-value 1.0 once D is on)."""
    import jax.numpy as jnp

    cfg = _cfg(batch=2, disc_start=0)
    cfg = dataclasses.replace(
        cfg, loss=dataclasses.replace(cfg.loss, vq_adaptive_weight=True))
    mesh = make_mesh(2)
    tr = VQGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, (
        rng.integers(0, 255, (2, 36, 36, 3), dtype=np.uint8),
        rng.integers(0, 255, (2, 36, 36, 3), dtype=np.uint8)))
    lams = []
    for _ in range(4):
        state, m = tr.train_step(state, batch)
        lam = float(m["lambda_adapt"])
        assert np.isfinite(lam) and lam >= 0
        lams.append(lam)
    assert any(abs(l - 1.0) > 1e-6 for l in lams), lams

    # off -> metric stays exactly 1.0 (the vqgan512 preset enables it, so
    # disable explicitly)
    cfg_off = _cfg(batch=2, disc_start=0)
    cfg_off = dataclasses.replace(
        cfg_off, loss=dataclasses.replace(cfg_off.loss,
                                          vq_adaptive_weight=False))
    tr0 = VQGANTrainer(cfg_off, mesh)
    s0 = tr0.init_state(jax.random.PRNGKey(0))
    s0, m0 = tr0.train_step(s0, batch)
    assert float(m0["lambda_adapt"]) == 1.0
