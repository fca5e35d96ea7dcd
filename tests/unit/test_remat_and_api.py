import dataclasses

import jax
import numpy as np


def test_remat_step_matches_no_remat():
    """jax.checkpoint must not change the math, only the schedule."""
    from uig.config import get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.cyclegan import CycleGANTrainer

    def cfg(remat):
        c = get_preset("smoke64")
        return dataclasses.replace(
            c,
            model=dataclasses.replace(c.model, image_size=16, n_res_blocks=1,
                                      d_layers=2, remat=remat),
            data=dataclasses.replace(c.data, batch_size=2, load_size=16),
            opt=dataclasses.replace(c.opt, optimizer="sgd"),
        )

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    outs = {}
    # False/True exercise the legacy bool surface (→ none/full); "blocks"
    # is the per-residual-block jax.checkpoint scope (compiler-friendlier
    # remat for 512² — VERDICT round-1 item 5)
    for remat in (False, True, "blocks"):
        mesh = make_mesh(1)
        tr = CycleGANTrainer(cfg(remat), mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
        outs[remat] = (
            {k: float(v) for k, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)),
        )
    for variant in (True, "blocks"):
        for k in outs[False][0]:
            np.testing.assert_allclose(outs[False][0][k], outs[variant][0][k],
                                       rtol=1e-5, err_msg=f"{variant}:{k}")
        for x, y in zip(jax.tree_util.tree_leaves(outs[False][1]),
                        jax.tree_util.tree_leaves(outs[variant][1])):
            np.testing.assert_allclose(x, y, atol=1e-6)


def test_fused_applies_matches_separate():
    """model.fused_applies batches same-params G/D passes at 2B — the same
    math (InstanceNorm is per-example), so a full train step must produce
    the same metrics and params up to conv-batch fp reassociation."""
    from uig.config import get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.cyclegan import CycleGANTrainer

    def cfg(fused):
        c = get_preset("smoke64")
        return dataclasses.replace(
            c,
            # fp32 compute + one step: in bf16, conv-batch reassociation
            # noise gets amplified to ~lr scale by Adam's g/sqrt(v)
            model=dataclasses.replace(c.model, image_size=16, n_res_blocks=1,
                                      d_layers=2, fused_applies=fused,
                                      compute_dtype="float32"),
            data=dataclasses.replace(c.data, batch_size=2, load_size=16),
            # sgd: adam's g/sqrt(v) turns any reassociation-level sign flip
            # of a near-zero grad into a ±lr param difference (same choice
            # as test_remat_step_matches_no_remat)
            opt=dataclasses.replace(c.opt, optimizer="sgd"),
        )

    rng = np.random.default_rng(3)
    a = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    outs = {}
    for fused in (False, True):
        mesh = make_mesh(1)
        tr = CycleGANTrainer(cfg(fused), mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
        outs[fused] = (
            {k: float(v) for k, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)),
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.d_params)),
        )
    for k in outs[False][0]:
        np.testing.assert_allclose(outs[False][0][k], outs[True][0][k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for i in (1, 2):
        for x, y in zip(jax.tree_util.tree_leaves(outs[False][i]),
                        jax.tree_util.tree_leaves(outs[True][i])):
            np.testing.assert_allclose(x, y, atol=5e-5)


def test_cut_fused_applies_matches_separate():
    """CUT under model.fused_applies: fake+idt as one 2B apply and the four
    NCE encoder passes as one 4B apply — same math, same patch ids (the
    nce/nce_idt keys are untouched)."""
    from uig.config import apply_overrides, get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.cut import CUTTrainer

    def cfg(fused):
        c = get_preset("cut256_multihost")
        return apply_overrides(c, [
            "model.image_size=16", "model.n_res_blocks=1", "model.d_layers=2",
            "model.nce_layers=(0,3)", "model.nce_patches=16",
            "model.compute_dtype=float32", f"model.fused_applies={fused}",
            "data.batch_size=2", "data.load_size=16", "opt.optimizer=sgd",
            "parallel.multihost=false",
        ])

    rng = np.random.default_rng(7)
    a = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    outs = {}
    for fused in (False, True):
        mesh = make_mesh(1)
        tr = CUTTrainer(cfg(fused), mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
        outs[fused] = (
            {k: float(v) for k, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)),
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.d_params)),
        )
    for k in outs[False][0]:
        np.testing.assert_allclose(outs[False][0][k], outs[True][0][k],
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for i in (1, 2):
        for x, y in zip(jax.tree_util.tree_leaves(outs[False][i]),
                        jax.tree_util.tree_leaves(outs[True][i])):
            np.testing.assert_allclose(x, y, atol=5e-5)


def test_remat_blocks_param_paths_invariant():
    """nn.remat renames wrapped module classes (CheckpointFoo); every model
    must pin explicit block names so toggling model.remat never changes the
    param tree — i.e. checkpoints stay loadable and init streams identical."""
    import jax.tree_util as tu

    from uig.models.resnet_gen import ResNetGenerator
    from uig.models.unit import UNITGenerator
    from uig.models.vqgan import VQGANDecoder, VQGANEncoder

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    z = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8))
    cases = [
        (ResNetGenerator(base_features=8, n_res_blocks=1),
         ResNetGenerator(base_features=8, n_res_blocks=1, remat_blocks=True),
         (x,)),
        (UNITGenerator(base_features=8, n_private_res=1, n_shared_res=1),
         UNITGenerator(base_features=8, n_private_res=1, n_shared_res=1,
                       remat_blocks=True),
         (x, x)),
        (VQGANEncoder(base_features=8, channel_mults=(1, 2),
                      attn_resolutions=(16,), attn_impl="xla", embed_dim=8),
         VQGANEncoder(base_features=8, channel_mults=(1, 2),
                      attn_resolutions=(16,), attn_impl="xla", embed_dim=8,
                      remat_blocks=True),
         (x,)),
        (VQGANDecoder(base_features=8, channel_mults=(1, 2),
                      attn_resolutions=(16,), attn_impl="xla"),
         VQGANDecoder(base_features=8, channel_mults=(1, 2),
                      attn_resolutions=(16,), attn_impl="xla",
                      remat_blocks=True),
         (z,)),
    ]
    for m0, m1, args in cases:
        p0 = m0.init(jax.random.PRNGKey(0), *args)
        p1 = m1.init(jax.random.PRNGKey(0), *args)
        f0 = tu.tree_flatten_with_path(p0)[0]
        f1 = tu.tree_flatten_with_path(p1)[0]
        name = type(m0).__name__
        assert ([tu.keystr(p) for p, _ in f0]
                == [tu.keystr(p) for p, _ in f1]), name
        for (_, a), (_, b) in zip(f0, f1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=name)


def test_swap_ema_roundtrip():
    from uig.config import get_preset
    from uig.runtime import make_mesh
    from uig.train.cyclegan import CycleGANTrainer
    from uig.train.ema import swap_ema

    c = get_preset("smoke64")
    c = dataclasses.replace(
        c, model=dataclasses.replace(c.model, image_size=16, n_res_blocks=1,
                                     d_layers=2),
        data=dataclasses.replace(c.data, batch_size=1, load_size=16))
    tr = CycleGANTrainer(c, make_mesh(1))
    state = tr.init_state(jax.random.PRNGKey(0))
    swapped = swap_ema(state)
    back = swap_ema(swapped)
    for x, y in zip(jax.tree_util.tree_leaves(state.g_params),
                    jax.tree_util.tree_leaves(back.g_params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_top_level_api_lazy_exports():
    import uig

    assert callable(uig.get_preset)
    assert callable(uig.make_mesh)
    assert callable(uig.fit)
    assert uig.Config is not None


def test_ugatit_fused_applies_matches_separate():
    """U-GAT-IT under model.fused_applies: translate+identity per generator
    as one 2B apply (per-pass CAM logits split back out) and each D's
    real+fake as one 2B apply (SN power iteration is input-independent
    given W, so the combined-pass update is the same update)."""
    from uig.config import apply_overrides, get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.ugatit_trainer import UGATITTrainer

    def cfg(fused):
        c = get_preset("ugatit256")
        return apply_overrides(c, [
            "model.image_size=32", "model.g_base_features=8",
            "model.d_base_features=4", "model.n_res_blocks=1",
            "model.ugatit_d_global_layers=4", "model.ugatit_d_local_layers=3",
            "model.compute_dtype=float32", f"model.fused_applies={fused}",
            "data.batch_size=2", "data.load_size=32", "opt.optimizer=sgd",
            "parallel.multihost=false",
        ])

    rng = np.random.default_rng(11)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    outs = {}
    for fused in (False, True):
        mesh = make_mesh(1)
        tr = UGATITTrainer(cfg(fused), mesh)
        state = tr.init_state(jax.random.PRNGKey(0))
        state, m = tr.train_step(state, shard_batch(mesh, (a, b)))
        outs[fused] = (
            {k: float(v) for k, v in m.items()},
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.g_params)),
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.d_params)),
            jax.tree_util.tree_map(np.asarray, jax.device_get(state.d_sn)),
        )
    for k in outs[False][0]:
        np.testing.assert_allclose(outs[False][0][k], outs[True][0][k],
                                   rtol=1e-4, atol=1e-4, err_msg=k)
    for i in (1, 2, 3):
        for x, y in zip(jax.tree_util.tree_leaves(outs[False][i]),
                        jax.tree_util.tree_leaves(outs[True][i])):
            np.testing.assert_allclose(x, y, atol=5e-5)
