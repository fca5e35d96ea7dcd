"""VQGAN two-stage quality run at 256² (VERDICT r4 weak #5 / r5 item 8):
the stretch family's first >64² trajectory through the production path —
stage-1 VQGAN (reconstruction + adversarial) with its loss trajectory,
stage-2 latent prior over the 16×16 code grid, then prior samples vs
random-code decodes on KID against the real set (the same protocol
scripts/prior_quality.py validated at 64²).

Defaults sized for a ~15-min chip run; UIG_PQ_STEPS1/2 resize.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_vqgan256.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import numpy as np


def main():
    import jax.numpy as jnp

    from uig.cli.translate import load_run
    from uig.config import apply_overrides, get_preset
    from uig.eval.fid import compute_kid, make_feature_fn
    from uig.train.loop import fit

    steps1 = int(os.environ.get("UIG_PQ_STEPS1", "1500"))
    steps2 = int(os.environ.get("UIG_PQ_STEPS2", "1500"))
    workdir = os.environ.get("UIG_PQ_WORKDIR", tempfile.mkdtemp(
        prefix="uig_quality_vqgan256_"))
    print("workdir:", workdir, flush=True)

    # 256² with the vqgan512 preset's 4-downsample trunk -> 16×16 code grid
    # (seq 256), same prior size the 64² run validated
    common = [
        "model.image_size=256",
        "model.remat=none",
        "data.source=synthetic",
        "data.synthetic_len=200",
        "data.load_size=288",
        "data.batch_size=8",
        "data.augment=xla",
        "loss.lambda_lpips=0",
        f"run.workdir={workdir}",
        "run.log_every=100",
        "eval.fid_every=0",
        "eval.sample_grid_every=0",
        "parallel.multihost=False",
    ]
    vq_cfg = apply_overrides(get_preset("vqgan512"), common + [
        "model.kind=vqgan", "run.name=vq256",
        f"opt.total_steps={steps1}",
        f"run.ckpt_every={steps1}",
        "loss.vq_disc_start=500",
    ])
    print(f"=== stage 1: vqgan 256^2, {steps1} steps ===", flush=True)
    m1 = fit(vq_cfg)
    print("stage-1 final:", {k: round(v, 4) for k, v in m1.items()},
          flush=True)

    prior_cfg = apply_overrides(get_preset("vqgan512"), common + [
        "model.kind=vqgan_prior", "run.name=prior256",
        f"model.prior_vqgan_run={workdir}/vq256",
        "model.prior_dim=256", "model.prior_depth=4", "model.prior_heads=8",
        f"opt.total_steps={steps2}",
        f"run.ckpt_every={steps2}",
        "opt.lr=3e-4",
    ])
    print(f"=== stage 2: code prior, {steps2} steps ===", flush=True)
    m2 = fit(prior_cfg)
    print("stage-2 final:", {k: round(v, 4) for k, v in m2.items()},
          flush=True)

    print("=== eval: KID vs real (extractor per converter availability) ===",
          flush=True)
    _, trainer, state = load_run(os.path.join(workdir, "prior256"))
    n_samples, bs = 64, 8
    rng = jax.random.PRNGKey(0)

    from uig.models.vqgan import VQGANGenerator

    @jax.jit
    def decode_random(key):
        codes = jax.random.randint(
            key, (bs, trainer.grid_hw, trainer.grid_hw), 0,
            trainer.prior.vocab)
        return trainer.vqgan.apply(
            trainer.vqgan_params, codes,
            method=VQGANGenerator.decode_codes).astype(jnp.float32)

    prior_imgs, rand_imgs = [], []
    for _ in range(n_samples // bs):
        k1, k2, rng = jax.random.split(rng, 3)
        prior_imgs.append(np.asarray(trainer.sample(state, k1, bs)))
        rand_imgs.append(np.asarray(decode_random(k2)))

    from uig.data.datasets import SyntheticUnpairedDataset
    from uig.kernels import center_crop_normalize

    syn = SyntheticUnpairedDataset(200, 288, 0)
    real = [np.asarray(center_crop_normalize(
        jnp.asarray(np.stack([dom[i] for i in range(64)])), 256))
        for dom in (syn.domain_a, syn.domain_b)]
    real = np.concatenate(real, 0)

    cfg_eval = apply_overrides(get_preset("smoke64"), ["model.image_size=256"])
    feature_fn, fname = make_feature_fn(cfg_eval)

    def batches(arr):
        for s in range(0, len(arr), bs):
            yield jnp.asarray(arr[s:s + bs])

    kid_prior = compute_kid(batches(real), batches(np.concatenate(prior_imgs)),
                            feature_fn, subset_size=48)
    kid_rand = compute_kid(batches(real), batches(np.concatenate(rand_imgs)),
                           feature_fn, subset_size=48)
    print(f"extractor: {fname}", flush=True)
    print(f"KID(real, prior samples) = {kid_prior[0]:.4f} ± {kid_prior[1]:.4f}")
    print(f"KID(real, random codes)  = {kid_rand[0]:.4f} ± {kid_rand[1]:.4f}")
    ratio = kid_rand[0] / max(kid_prior[0], 1e-9)
    print(f"prior improves KID {ratio:.1f}x over random-code decoding",
          flush=True)


if __name__ == "__main__":
    main()
