"""opt.grad_accum — in-graph gradient accumulation (train/microbatch.py).

The contract: grad_accum=k is the SAME training trajectory as grad_accum=1
(all uig losses are batch means, so a mean of per-microbatch mean-gradients
equals the full-batch mean gradient; fp reassociation only), at ~B/k peak
activation memory.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_microbatch_value_and_grad_matches_full_batch():
    from uig.train.microbatch import microbatch_value_and_grad

    rng = np.random.default_rng(0)
    w = {"w": jnp.asarray(rng.standard_normal((6, 3)), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((8, 6)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)

    def loss_fn(params, mb, mb_i):
        del mb_i
        xb, yb = mb
        pred = xb @ params["w"]
        loss = jnp.mean(jnp.square(pred - yb))
        return loss, {"loss_scalar": loss, "pred": pred}

    (l1, aux1), g1 = microbatch_value_and_grad(loss_fn, w, (x, y), 1)
    for k in (2, 4, 8):
        (lk, auxk), gk = microbatch_value_and_grad(loss_fn, w, (x, y), k)
        np.testing.assert_allclose(float(lk), float(l1), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(gk["w"]), np.asarray(g1["w"]),
                                   rtol=1e-5, atol=1e-7)
        # scalar aux leaves average back to the full-batch value
        np.testing.assert_allclose(float(auxk["loss_scalar"]), float(l1),
                                   rtol=1e-6)
        # batch-leading aux leaves reassemble in original order
        np.testing.assert_allclose(np.asarray(auxk["pred"]),
                                   np.asarray(aux1["pred"]), rtol=1e-6)


def test_microbatch_indivisible_batch_raises():
    from uig.train.microbatch import microbatch_value_and_grad

    w = {"w": jnp.ones((2, 2))}
    x = jnp.ones((6, 2))

    def loss_fn(params, mb, mb_i):
        return jnp.mean(mb @ params["w"]), {}

    with pytest.raises(ValueError, match="not divisible"):
        microbatch_value_and_grad(loss_fn, w, x, 4)


def _cfg(grad_accum, ada_p=0.0, fused=False):
    from uig.config import get_preset

    c = get_preset("smoke64")
    return dataclasses.replace(
        c,
        # fp32 + sgd: Adam's g/sqrt(v) amplifies fp-reassociation noise of
        # near-zero grads to ~lr scale (same choice as the remat and
        # fused_applies equivalence tests)
        model=dataclasses.replace(c.model, image_size=16, n_res_blocks=1,
                                  d_layers=2, compute_dtype="float32",
                                  fused_applies=fused),
        data=dataclasses.replace(c.data, batch_size=4, load_size=16),
        opt=dataclasses.replace(c.opt, optimizer="sgd",
                                grad_accum=grad_accum),
        loss=dataclasses.replace(c.loss, r1_gamma=0.1, ada_p_init=ada_p),
    )


@pytest.mark.parametrize("fused", [False, True])
def test_cyclegan_grad_accum_matches_single_step(fused):
    from uig.runtime import make_mesh, shard_batch
    from uig.train.cyclegan import CycleGANTrainer

    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    outs = {}
    for k in (1, 2, 4):
        mesh = make_mesh(1)
        tr = CycleGANTrainer(_cfg(k, fused=fused), mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        for _ in range(2):
            state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
        outs[k] = (
            {name: float(v) for name, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)),
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.d_params)),
            np.asarray(jax.device_get(state.pool_a.buffer)),
        )
    for k in (2, 4):
        for name in outs[1][0]:
            np.testing.assert_allclose(outs[1][0][name], outs[k][0][name],
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"k={k}:{name}")
        for i in (1, 2):
            for x, y in zip(jax.tree_util.tree_leaves(outs[1][i]),
                            jax.tree_util.tree_leaves(outs[k][i])):
                np.testing.assert_allclose(x, y, atol=5e-5)
        # the replay pool saw the same fakes in the same slots
        np.testing.assert_allclose(outs[1][3], outs[k][3], atol=5e-5)


def test_grad_accum_with_ada_trains():
    """With ADA on, draws are re-sampled per microbatch (documented), so no
    exact-match claim — but the step must run and stay finite."""
    from uig.runtime import make_mesh, shard_batch
    from uig.train.cyclegan import CycleGANTrainer

    rng = np.random.default_rng(1)
    a = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (4, 16, 16, 3)).astype(np.float32)
    mesh = make_mesh(1)
    tr = CycleGANTrainer(_cfg(2, ada_p=0.5), mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
    assert all(np.isfinite(float(v)) for v in m.values())


def test_vqgan_grad_accum_matches_single_step():
    """VQGAN is the memory-bound rung grad_accum exists for (512²): k>1
    must reproduce the k=1 step exactly (no reparam noise, ADA not used in
    the VQGAN G path; perplexity is documented as a mean-of-microbatch
    metric and excluded from the strict check)."""
    from uig.config import get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.vqgan_trainer import VQGANTrainer

    def cfg(k):
        c = get_preset("vqgan512")
        return dataclasses.replace(
            c,
            model=dataclasses.replace(
                c.model, image_size=16, vq_channel_mults=(1, 2),
                vq_base_features=8, vq_embed_dim=8, vq_codebook_size=16,
                vq_attn_resolutions=(8,), attn_impl="xla", d_layers=2,
                compute_dtype="float32", remat="none"),
            data=dataclasses.replace(c.data, batch_size=2, load_size=16),
            opt=dataclasses.replace(c.opt, optimizer="sgd", grad_accum=k),
            loss=dataclasses.replace(c.loss, vq_disc_start=0,
                                     vq_adaptive_weight=False),
        )

    rng = np.random.default_rng(11)
    a = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    outs = {}
    for k in (1, 2, 4):  # union batch is 2B=4 per device
        mesh = make_mesh(1)
        tr = VQGANTrainer(cfg(k), mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        for _ in range(2):
            state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
        outs[k] = (
            {name: float(v) for name, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)),
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.d_params)),
        )
    for k in (2, 4):
        for name in outs[1][0]:
            if name == "perplexity":
                continue
            np.testing.assert_allclose(outs[1][0][name], outs[k][0][name],
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"k={k}:{name}")
        for i in (1, 2):
            for x, y in zip(jax.tree_util.tree_leaves(outs[1][i]),
                            jax.tree_util.tree_leaves(outs[k][i])):
                np.testing.assert_allclose(x, y, atol=5e-5)


def test_vqgan_grad_accum_rejects_adaptive_weight():
    from uig.config import get_preset
    from uig.runtime import make_mesh
    from uig.train.vqgan_trainer import VQGANTrainer

    c = get_preset("vqgan512")
    c = dataclasses.replace(
        c,
        model=dataclasses.replace(c.model, image_size=16,
                                  vq_channel_mults=(1, 2),
                                  vq_base_features=8, vq_embed_dim=8,
                                  vq_codebook_size=16,
                                  vq_attn_resolutions=(8,), attn_impl="xla"),
        data=dataclasses.replace(c.data, batch_size=2, load_size=16),
        opt=dataclasses.replace(c.opt, grad_accum=2),
        loss=dataclasses.replace(c.loss, vq_adaptive_weight=True),
    )
    with pytest.raises(ValueError, match="vq_adaptive_weight"):
        VQGANTrainer(c, make_mesh(1))


def test_grad_accum_validation():
    from uig.runtime import make_mesh
    from uig.train.cut import CUTTrainer
    from uig.train.cyclegan import CycleGANTrainer

    # unsupported trainer rejects loudly at construction
    cfg = _cfg(2)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, kind="cut",
                                       nce_layers=(0, 2)))
    with pytest.raises(ValueError, match="grad_accum"):
        CUTTrainer(cfg, make_mesh(1))

    # per-device batch must divide by k
    with pytest.raises(ValueError, match="not divisible"):
        CycleGANTrainer(_cfg(3), make_mesh(1))

    with pytest.raises(ValueError, match="grad_accum"):
        CycleGANTrainer(_cfg(0), make_mesh(1))
