"""VQGAN latent prior (models/prior.py + train/prior_trainer.py): causality,
KV-cache decode parity with the teacher-forced forward, stage-2 training on
frozen VQGAN codes, and prior sampling through the decoder."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uig.models.prior import CodePrior, sample_codes


def _tiny_prior(vocab=32, seq_len=16):
    return CodePrior(vocab=vocab, seq_len=seq_len, dim=32, depth=2, heads=4)


def test_causal_mask():
    """Logits at position t must not depend on codes[t:]."""
    m = _tiny_prior()
    codes = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 32)
    params = m.init(jax.random.PRNGKey(1), codes)
    base = m.apply(params, codes)
    # perturb the future of position 5 (inputs are shifted right, so
    # logits[:, :6] depend only on codes[:, :5])
    altered = codes.at[:, 5:].set((codes[:, 5:] + 7) % 32)
    out = m.apply(params, altered)
    np.testing.assert_allclose(np.asarray(base[:, :6]),
                               np.asarray(out[:, :6]), rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(base[:, 6:]), np.asarray(out[:, 6:]))


def test_decode_step_matches_full_forward():
    """KV-cache incremental decode == teacher-forced full-sequence logits."""
    m = _tiny_prior()
    codes = jax.random.randint(jax.random.PRNGKey(2), (3, 16), 0, 32)
    params = m.init(jax.random.PRNGKey(3), codes)
    full = np.asarray(m.apply(params, codes))  # (B, L, K)

    caches = m.init_cache(3)
    toks = jnp.concatenate(
        [jnp.full((3, 1), m.vocab, codes.dtype), codes[:, :-1]], axis=1)
    for t in range(m.seq_len):
        logits, caches = m.apply(params, toks[:, t], jnp.int32(t), caches,
                                 method=CodePrior.decode_step)
        np.testing.assert_allclose(np.asarray(logits), full[:, t],
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"position {t}")


def test_sample_codes_valid():
    m = _tiny_prior()
    params = m.init(jax.random.PRNGKey(4),
                    jnp.zeros((1, 16), jnp.int32))
    codes = jax.jit(
        lambda p, r: sample_codes(m, p, r, 4, 4, temperature=1.0, top_k=8)
    )(params, jax.random.PRNGKey(5))
    codes = np.asarray(codes)
    assert codes.shape == (4, 4, 4)
    assert codes.min() >= 0 and codes.max() < 32
    # with top_k=8 and random logits, grids should not be constant
    assert len(np.unique(codes)) > 1


@pytest.fixture(scope="module")
def prior_setup(mesh8):
    """Tiny frozen VQGAN + PriorTrainer on the 8-device mesh."""
    from uig.config import apply_overrides, get_preset
    from uig.models.vqgan import VQGANGenerator
    from uig.train.prior_trainer import PriorTrainer

    cfg = get_preset("smoke64")
    cfg = apply_overrides(cfg, [
        "model.kind=vqgan_prior",
        "model.image_size=16",
        "model.vq_channel_mults=(1,2)",  # grid 8x8 -> seq_len 64
        "model.vq_base_features=16",
        "model.vq_embed_dim=16",
        "model.vq_codebook_size=64",
        "model.vq_attn_resolutions=(8,)",
        "model.attn_impl=xla",
        "model.prior_dim=64",
        "model.prior_depth=2",
        "model.prior_heads=4",
        "model.compute_dtype=float32",
        "data.batch_size=8",
        "data.load_size=20",
        "data.synthetic_len=16",
    ])
    vq = VQGANGenerator(
        base_features=16, channel_mults=(1, 2), embed_dim=16,
        codebook_size=64, attn_resolutions=(8,), attn_impl="xla")
    vq_params = vq.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))
    import uig.runtime as rt

    trainer = PriorTrainer(cfg, mesh8, vqgan_params=vq_params)
    return cfg, trainer


@pytest.mark.smoke
def test_prior_trains_and_samples(prior_setup, mesh8):
    from uig.data import make_input_pipeline

    cfg, trainer = prior_setup
    state = trainer.init_state(jax.random.PRNGKey(0))
    pipe = make_input_pipeline(cfg, mesh8, start=False)
    first = None
    for i in range(12):
        state, m = trainer.train_step(state, next(pipe))
        if first is None:
            first = float(m["nll"])
    last = float(m["nll"])
    assert np.isfinite(last)
    # 16 synthetic images, 12 steps: the prior must be memorizing
    assert last < first, (first, last)
    assert float(m["acc"]) >= 0.0

    imgs = trainer.sample(state, jax.random.PRNGKey(1), 2, temperature=1.0,
                          top_k=16)
    imgs = np.asarray(imgs)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(imgs).all()
    assert imgs.min() >= -1.001 and imgs.max() <= 1.001


@pytest.mark.slow
def test_two_stage_pipeline_end_to_end(tmp_path):
    """The canonical two-stage recipe through the PUBLIC surface:
    fit() a tiny stage-1 vqgan run (checkpointed), fit() a vqgan_prior run
    pointed at it (frozen EMA params loaded from the run dir), then
    run_sample() from the prior run — prior codes, not random codes."""
    from uig.cli.sample import run_sample
    from uig.config import apply_overrides, get_preset
    from uig.train.loop import fit

    common = [
        "model.image_size=16",
        "model.vq_channel_mults=(1,2)",
        "model.vq_base_features=16",
        "model.vq_embed_dim=16",
        "model.vq_codebook_size=32",
        "model.vq_attn_resolutions=(8,)",
        "model.attn_impl=xla",
        "model.compute_dtype=float32",
        "model.d_layers=2",
        "data.batch_size=8",
        "data.load_size=20",
        "data.synthetic_len=12",
        "data.num_workers=1",
        f"run.workdir={tmp_path}",
        "run.ckpt_every=3",
        "run.log_every=1",
        "eval.sample_grid_every=0",
        "eval.fid_every=0",
    ]
    vq_cfg = apply_overrides(get_preset("smoke64"), common + [
        "model.kind=vqgan", "run.name=vq_stage1", "opt.total_steps=3"])
    fit(vq_cfg)

    prior_cfg = apply_overrides(get_preset("smoke64"), common + [
        "model.kind=vqgan_prior", "run.name=vq_prior",
        f"model.prior_vqgan_run={tmp_path}/vq_stage1",
        "model.prior_dim=32", "model.prior_depth=1", "model.prior_heads=4",
        "opt.total_steps=3"])
    metrics = fit(prior_cfg)
    assert np.isfinite(metrics["nll"])

    out = tmp_path / "samples"
    n = run_sample(str(tmp_path / "vq_prior"), str(out), n=2, seed=0)
    assert n == 2
    import glob

    assert len(glob.glob(str(out / "*.png"))) == 2


def test_prior_requires_vqgan_run(mesh8):
    from uig.config import apply_overrides, get_preset
    from uig.train.prior_trainer import PriorTrainer

    cfg = apply_overrides(get_preset("smoke64"), ["model.kind=vqgan_prior"])
    with pytest.raises(ValueError, match="prior_vqgan_run"):
        PriorTrainer(cfg, mesh8)


# ---------------------------------------------------------------------------
# Masked (MaskGIT-style) prior
# ---------------------------------------------------------------------------


def _tiny_masked(vocab=32, seq_len=16):
    from uig.models.prior import MaskedPrior

    return MaskedPrior(vocab=vocab, seq_len=seq_len, dim=32, depth=2,
                       heads=4)


def test_masked_prior_is_bidirectional():
    """Unlike the AR prior, every logit may depend on every position."""
    m = _tiny_masked()
    toks = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 32)
    params = m.init(jax.random.PRNGKey(1), toks)
    base = np.asarray(m.apply(params, toks))
    assert base.shape == (2, 16, 32)
    altered = toks.at[:, 10].set((toks[:, 10] + 7) % 32)
    out = np.asarray(m.apply(params, altered))
    # position 0's logits change when position 10 changes
    assert not np.allclose(base[:, 0], out[:, 0])


def test_random_code_mask_properties():
    from uig.models.prior import mask_schedule, random_code_mask

    mask = np.asarray(random_code_mask(jax.random.PRNGKey(0), 64, 32))
    counts = mask.sum(axis=1)
    assert counts.min() >= 1 and counts.max() <= 32
    # spread across the schedule, not a constant corruption rate
    assert len(np.unique(counts)) > 3
    # expected mask fraction under gamma(u)=cos(pi/2 u), u~U(0,1) is 2/pi
    assert abs(counts.mean() / 32 - 2 / np.pi) < 0.12
    # schedule endpoints
    assert float(mask_schedule(jnp.float32(0))) == pytest.approx(1.0)
    assert float(mask_schedule(jnp.float32(1))) == pytest.approx(0.0, abs=1e-7)


def test_sample_codes_maskgit_valid_and_deterministic():
    from uig.models.prior import sample_codes_maskgit

    m = _tiny_masked()
    params = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 16), jnp.int32))
    fn = jax.jit(lambda p, r: sample_codes_maskgit(m, p, r, 4, 4, steps=4))
    codes = np.asarray(fn(params, jax.random.PRNGKey(3)))
    assert codes.shape == (4, 4, 4)
    # every position resolved to a REAL codebook entry (no MASK id left)
    assert codes.min() >= 0 and codes.max() < 32
    again = np.asarray(fn(params, jax.random.PRNGKey(3)))
    np.testing.assert_array_equal(codes, again)
    other = np.asarray(fn(params, jax.random.PRNGKey(4)))
    assert not np.array_equal(codes, other)


def test_maskgit_memorizes_constant_grid():
    """End-to-end objective+sampler check: trained on ONE fixed grid, the
    masked prior must reproduce it from all-MASK."""
    import optax as ox

    from uig.models.prior import random_code_mask, sample_codes_maskgit

    m = _tiny_masked(vocab=16, seq_len=16)
    target = jax.random.randint(jax.random.PRNGKey(5), (1, 16), 0, 16)
    codes = jnp.tile(target, (8, 1))
    params = m.init(jax.random.PRNGKey(6), codes)
    tx = ox.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        mask = random_code_mask(key, codes.shape[0], 16)
        inputs = jnp.where(mask, m.vocab, codes)

        def loss_fn(p):
            ce = ox.softmax_cross_entropy_with_integer_labels(
                m.apply(p, inputs), codes)
            return jnp.where(mask, ce, 0.0).sum() / jnp.maximum(mask.sum(), 1)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return ox.apply_updates(params, up), opt, loss

    key = jax.random.PRNGKey(7)
    for i in range(150):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k)
    assert float(loss) < 0.5, float(loss)

    sampled = np.asarray(sample_codes_maskgit(
        m, params, jax.random.PRNGKey(8), 2, 4, steps=4, choice_temp=0.0))
    want = np.asarray(target).reshape(4, 4)
    match = (sampled == want[None]).mean()
    assert match > 0.9, (match, sampled, want)


@pytest.fixture(scope="module")
def maskgit_setup(mesh8):
    """Tiny frozen VQGAN + maskgit-style PriorTrainer on the 8-device mesh."""
    from uig.config import apply_overrides, get_preset
    from uig.models.vqgan import VQGANGenerator
    from uig.train.prior_trainer import PriorTrainer

    cfg = get_preset("smoke64")
    cfg = apply_overrides(cfg, [
        "model.kind=vqgan_prior",
        "model.prior_style=maskgit",
        "model.image_size=16",
        "model.vq_channel_mults=(1,2)",
        "model.vq_base_features=16",
        "model.vq_embed_dim=16",
        "model.vq_codebook_size=64",
        "model.vq_attn_resolutions=(8,)",
        "model.attn_impl=xla",
        "model.prior_dim=64",
        "model.prior_depth=2",
        "model.prior_heads=4",
        "model.prior_sample_steps=4",
        "model.compute_dtype=float32",
        "data.batch_size=8",
        "data.load_size=20",
        "data.synthetic_len=16",
    ])
    vq = VQGANGenerator(
        base_features=16, channel_mults=(1, 2), embed_dim=16,
        codebook_size=64, attn_resolutions=(8,), attn_impl="xla")
    vq_params = vq.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3), jnp.float32))
    trainer = PriorTrainer(cfg, mesh8, vqgan_params=vq_params)
    return cfg, trainer


def test_maskgit_trainer_trains_and_samples(maskgit_setup, mesh8):
    from uig.data import make_input_pipeline

    cfg, trainer = maskgit_setup
    assert trainer.style == "maskgit"
    state = trainer.init_state(jax.random.PRNGKey(0))
    pipe = make_input_pipeline(cfg, mesh8, start=False)
    first = None
    for i in range(12):
        state, m = trainer.train_step(state, next(pipe))
        if first is None:
            first = float(m["nll"])
    last = float(m["nll"])
    assert np.isfinite(last)
    assert last < first, (first, last)

    imgs = trainer.sample(state, jax.random.PRNGKey(1), 2)
    imgs = np.asarray(imgs)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(imgs).all()

    with pytest.raises(ValueError, match="top_k"):
        trainer.sample(state, jax.random.PRNGKey(1), 2, top_k=8)


def test_prior_style_validated(mesh8):
    from uig.config import apply_overrides, get_preset
    from uig.train.prior_trainer import PriorTrainer

    cfg = apply_overrides(get_preset("smoke64"), [
        "model.kind=vqgan_prior", "model.prior_style=diffusion"])
    with pytest.raises(ValueError, match="prior_style"):
        PriorTrainer(cfg, mesh8, vqgan_params={})
