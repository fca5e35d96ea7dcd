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
