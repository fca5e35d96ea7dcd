"""VAE-GAN trainer: KL behavior, recon falls, unconditional sampling."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from uig.config import get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.vaegan_trainer import VAEGANTrainer
import pytest


def _cfg(batch=2):
    cfg = get_preset("vqgan512")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, kind="vaegan", image_size=32, vq_base_features=16,
            vq_channel_mults=(1, 2), vq_embed_dim=8,
            vq_attn_resolutions=(16,), d_layers=2, compute_dtype="float32",
            vq_beta=0.01),
        loss=dataclasses.replace(cfg.loss, vq_disc_start=1000),
        data=dataclasses.replace(cfg.data, batch_size=batch, load_size=36),
        opt=dataclasses.replace(cfg.opt, lr=1e-3),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )


@pytest.mark.smoke
def test_vaegan_trains_and_samples():
    from uig.data.datasets import SyntheticUnpairedDataset

    mesh = make_mesh(2)
    tr = VAEGANTrainer(_cfg(2), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    syn = SyntheticUnpairedDataset(4, 36, 0)
    a = np.stack([syn.domain_a[0], syn.domain_a[1]])
    b = np.stack([syn.domain_b[0], syn.domain_b[1]])
    batch = shard_batch(mesh, (a, b))
    recs, kls = [], []
    for _ in range(15):
        state, m = tr.train_step(state, batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        recs.append(vals["rec"])
        kls.append(vals["kl"])
    assert min(recs[8:]) < recs[0], f"recon did not fall: {recs}"
    assert all(k >= 0 for k in kls)

    y = tr.translate(state.ema, jnp.zeros((1, 32, 32, 3)))
    assert y.shape == (1, 32, 32, 3)
    samples = tr.sample(state.ema, jax.random.PRNGKey(1), 2)
    assert samples.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(samples)).all()


def test_vaegan_via_build_trainer(tmp_path):
    from uig.train.loop import build_trainer

    cfg = _cfg(2)
    tr = build_trainer(cfg, make_mesh(1))
    assert type(tr).__name__ == "VAEGANTrainer"
