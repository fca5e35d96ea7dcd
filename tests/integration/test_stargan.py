"""StarGAN trainer: multi-domain translation with one conditioned G and an
auxiliary-classifier D.

Covers the multi-domain extension of the SURVEY.md §0 lineage (StarGAN):
  * label conditioning changes the generator output; fixed label is
    bit-identical (deterministic serving),
  * D returns (patch src map, (B, N) domain logits); WGAN-GP and the
    domain-classification CE behave analytically,
  * the N-domain pipeline interleaves domains round-robin and resumes from
    the one-integer cursor,
  * training on a DP-2 mesh: finite metrics, falling reconstruction,
    n_critic gating of the G update,
  * full CLI train -> ckpt -> translate --target-domain roundtrip over
    folder domains.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.config import get_preset
from uig.models.stargan import StarGANDiscriminator, StarGANGenerator
from uig.runtime import make_mesh, shard_batch
from uig.train.stargan_trainer import StarGANTrainer


def _cfg(batch=6, n_dom=3, n_critic=2):
    cfg = get_preset("stargan128")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, image_size=32, num_domains=n_dom, g_base_features=8,
            d_base_features=8, n_res_blocks=1, d_layers=3,
            compute_dtype="float32"),
        data=dataclasses.replace(cfg.data, source="synthetic",
                                 batch_size=batch, load_size=36,
                                 synthetic_len=12),
        opt=dataclasses.replace(cfg.opt, lr=1e-3, d_steps_per_g=n_critic),
        parallel=dataclasses.replace(cfg.parallel, multihost=False),
    )


def _flat_names(tree):
    return {"/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_stargan_generator_label_conditioning():
    g = StarGANGenerator(num_domains=3, base_features=8, n_res_blocks=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    params = g.init(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    y0 = g.apply(params, x, jnp.array([0, 0], jnp.int32))
    y0b = g.apply(params, x, jnp.array([0, 0], jnp.int32))
    y1 = g.apply(params, x, jnp.array([1, 1], jnp.int32))
    assert y0.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y0b))
    assert np.abs(np.asarray(y0) - np.asarray(y1)).max() > 1e-6
    # per-example conditioning: example 0's output depends only on its label
    y_mixed = g.apply(params, x, jnp.array([0, 1], jnp.int32))
    np.testing.assert_allclose(np.asarray(y_mixed[0]), np.asarray(y0[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y_mixed[1]), np.asarray(y1[1]),
                               atol=1e-6)


def test_stargan_discriminator_heads_and_losses():
    from uig.train import losses as L

    d = StarGANDiscriminator(num_domains=4, base_features=8, n_layers=3)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = d.init(jax.random.PRNGKey(1), x)
    src, cls = d.apply(params, x)
    assert src.shape == (2, 4, 4, 1)
    assert cls.shape == (2, 4)
    # canonical WGAN-GP D carries no normalization layers
    names = _flat_names(params)
    assert not any("Norm" in n for n in names)
    # too-small input fails loudly at init
    with pytest.raises(ValueError, match="too small"):
        StarGANDiscriminator(num_domains=2, n_layers=6).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))

    # wgan losses: exact means
    r = jnp.full((2, 3, 3, 1), 2.0)
    f = jnp.full((2, 3, 3, 1), -1.0)
    assert float(L.gan_loss_d(r, f, "wgan")) == pytest.approx(-3.0)
    assert float(L.gan_loss_g(f, "wgan")) == pytest.approx(1.0)

    # gradient penalty, analytic: D(x) = <w, x> has ∇ₓD = w everywhere,
    # so gp = (‖w‖₂ − 1)² regardless of the interpolate
    w = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 3))
    gp = L.gradient_penalty(
        lambda x: jnp.sum(x * w, axis=(1, 2, 3)),
        jnp.zeros((2, 4, 4, 3)), jnp.ones((2, 4, 4, 3)),
        jax.random.PRNGKey(3))
    want = (float(jnp.linalg.norm(w)) - 1.0) ** 2
    assert float(gp) == pytest.approx(want, rel=1e-5)

    # domain CE: uniform logits -> ln N; one-hot-ish logits -> small
    n = 4
    uni = jnp.zeros((2, n))
    lab = jnp.array([1, 3], jnp.int32)
    assert float(L.domain_cls_loss(uni, lab)) == pytest.approx(np.log(n))
    sharp = jax.nn.one_hot(lab, n) * 20.0
    assert float(L.domain_cls_loss(sharp, lab)) < 1e-6


def test_multidomain_pipeline_interleaves_and_resumes():
    from uig.data.datasets import SyntheticMultiDomainDataset
    from uig.data.pipeline import MultiDomainPipeline

    doms = SyntheticMultiDomainDataset(3, n=9, load_size=36, seed=0).domains
    pipe = MultiDomainPipeline(doms, 6, mesh=None, seed=0, num_workers=1)
    b0 = pipe._load_batch(0)
    assert b0.shape == (6, 36, 36, 3) and b0.dtype == np.uint8
    # position i holds domain (i % 3), sample via the pure index stream
    for i in range(6):
        d = i % 3
        idx = pipe.streams[d].indices_at(i // 3, 1)[0]
        np.testing.assert_array_equal(b0[i], doms[d][idx])
    # resume: consuming two batches then restoring the cursor replays batch 2
    n1 = next(pipe)
    n2 = next(pipe)
    state = pipe.state_dict()
    assert state == {"t_consumed": 2}
    pipe2 = MultiDomainPipeline(doms, 6, mesh=None, seed=0, num_workers=1)
    pipe2.load_state_dict(state)
    np.testing.assert_array_equal(next(pipe2), pipe._load_batch(2))
    del n1, n2

    # batch not divisible by domain count fails loudly
    with pytest.raises(ValueError, match="multiple of"):
        MultiDomainPipeline(doms, 5, mesh=None)


@pytest.mark.smoke
def test_stargan_trains_dp2_and_translates():
    from uig.data.datasets import SyntheticMultiDomainDataset

    mesh = make_mesh(2)
    cfg = _cfg(batch=6, n_dom=3, n_critic=2)
    tr = StarGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    doms = SyntheticMultiDomainDataset(3, n=4, load_size=36, seed=0).domains
    raw = np.stack([doms[i % 3][i // 3] for i in range(6)])
    batch = shard_batch(mesh, (raw,))[0]
    recs, active = [], []
    for _ in range(14):
        state, m = tr.train_step(state, batch)
        vals = {k: float(v) for k, v in m.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        active.append(vals["g_active"])
        if vals["g_active"]:
            recs.append(vals["g_rec"])
    # n_critic=2: G updates on every second step exactly
    assert active == [0.0, 1.0] * 7
    assert min(recs[3:]) < recs[0], f"reconstruction did not fall: {recs}"

    ema = jax.device_get(state.ema)
    x = jnp.zeros((2, 32, 32, 3))
    y1 = tr.translate(ema, x, 1)
    y1b = tr.translate(ema, x, 1)
    y2 = tr.translate(ema, x, 2)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y1b))
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6
    with pytest.raises(ValueError, match="out of range"):
        tr.translate(ema, x, 3)

    # per-device batch must be a multiple of num_domains
    bad = _cfg(batch=8, n_dom=3)
    with pytest.raises(ValueError, match="multiple of"):
        StarGANTrainer(bad, mesh)


def test_stargan_cli_train_ckpt_translate_roundtrip(tmp_path):
    from PIL import Image

    from uig.cli.main import main
    from uig.data.datasets import SyntheticMultiDomainDataset

    doms = SyntheticMultiDomainDataset(3, n=6, load_size=36, seed=0)
    dirs = doms.write_png_dirs(str(tmp_path / "data"))
    run_dir = os.path.join(tmp_path, "starrun")

    rc = main([
        "train", "--preset", "stargan128", "--max-steps", "4",
        "--set", "model.image_size=32", "--set", "model.num_domains=3",
        "--set", "model.g_base_features=8", "--set", "model.d_base_features=8",
        "--set", "model.n_res_blocks=1", "--set", "model.d_layers=3",
        "--set", "model.compute_dtype=float32",
        "--set", "opt.d_steps_per_g=2",
        "--set", "data.batch_size=6", "--set", "data.load_size=36",
        "--set", "data.source=folders",
        "--set", "data.domain_dirs=" + ",".join(dirs),
        "--set", "data.num_workers=1", "--set", "parallel.num_devices=2",
        "--set", "parallel.multihost=False",
        "--set", f"run.workdir={tmp_path}", "--set", "run.name=starrun",
        "--set", "run.ckpt_every=4", "--set", "run.log_every=2",
        "--set", "eval.sample_grid_every=0",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(run_dir, "config.json"))

    outs = {}
    for t in (1, 2):
        out_dir = os.path.join(tmp_path, f"translated_{t}")
        rc = main(["translate", "--run-dir", run_dir, "--input-dir", dirs[0],
                   "--output-dir", out_dir, "--target-domain", str(t),
                   "--batch-size", "3"])
        assert rc == 0
        files = sorted(os.listdir(out_dir))
        assert len(files) == 6
        outs[t] = np.asarray(Image.open(os.path.join(out_dir, files[0])))
    # different target domains must produce different translations
    assert not np.array_equal(outs[1], outs[2])


def test_stargan_period_fusion_matches_single_steps():
    """build_period_step (one statically-unrolled n_critic period per
    dispatch) must produce the same params/EMA as n_critic aligned single steps up
    to fp reassociation (different XLA program, same math) — the PRNG
    folds the carried step and the static g-turn positions match the
    lax.cond schedule exactly."""
    n_critic = 3
    cfg = _cfg(batch=6, n_dom=3, n_critic=n_critic)
    # SGD: generator conv biases feeding InstanceNorm have mathematically
    # ZERO gradient (IN subtracts the mean, annihilating bias), so their
    # numeric grads are pure cancellation noise — Adam NORMALIZES that
    # noise into ±lr-sized program-dependent drift. SGD keeps it at
    # noise scale so the comparison measures the schedule, not Adam's
    # amplification of zero-grads (same reasoning as test_dp_equivalence).
    cfg = dataclasses.replace(
        cfg, opt=dataclasses.replace(cfg.opt, optimizer="sgd"))
    mesh = make_mesh(2)
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 255, (6, 36, 36, 3), dtype=np.uint8)
               for _ in range(2 * n_critic)]

    # arm 1: single steps
    tr = StarGANTrainer(cfg, mesh)
    s1 = tr.init_state(jax.random.PRNGKey(0))
    for b in batches:
        s1, m1 = tr.train_step(s1, shard_batch(mesh, (b,)))

    # arm 2: two fused periods
    tr2 = StarGANTrainer(cfg, mesh)
    s2 = tr2.init_state(jax.random.PRNGKey(0))
    period = tr2.build_period_step()
    dev = [shard_batch(mesh, (b,)) for b in batches]
    s2, m2a = period(s2, dev[:n_critic])
    s2, m2 = period(s2, dev[n_critic:])

    assert int(jax.device_get(s1.step)) == int(jax.device_get(s2.step)) == 6
    # identical MATH; the fused program is a different XLA program, so
    # fusion/reassociation choices differ -> fp-noise-level diffs only
    for name in ("g_params", "d_params", "ema"):
        f1 = jax.tree_util.tree_leaves(getattr(s1, name))
        f2 = jax.tree_util.tree_leaves(getattr(s2, name))
        for x, y in zip(f1, f2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=5e-5, atol=5e-7)
    # last-sub-step metrics match what aligned single-stepping logged
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=5e-4,
                                   atol=1e-5, err_msg=k)
    # misuse is loud
    import pytest as _pytest
    with _pytest.raises(ValueError):
        period(s2, dev[:n_critic - 1])
