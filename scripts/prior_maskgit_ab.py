"""Stage-2 prior A/B on the real chip: autoregressive (canonical VQGAN
recipe) vs MaskGIT-style masked parallel decoding (model.prior_style).

Trains ONE stage-1 VQGAN on the synthetic 64² set, then both stage-2
styles with matched transformer sizes/steps against the same frozen
stage-1 EMA params, and compares (a) sample quality — KID vs the real
distribution (random-feature extractor, relative numbers only in this
zero-egress environment) — and (b) sampling throughput: the AR sampler is
L=256 sequential KV-cache steps per batch, the masked sampler is
``prior_sample_steps`` full-grid forwards.

Run (real chip): PYTHONPATH=src:$PYTHONPATH python -u scripts/prior_maskgit_ab.py
Env: UIG_PQ_STEPS1 / UIG_PQ_STEPS2 resize stages; UIG_PQ_WORKDIR reuses a
workdir (skips stage 1 / either stage 2 if its run dir already has a
finished checkpoint).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import numpy as np


def _have_run(d):
    return os.path.isdir(os.path.join(d, "checkpoints"))


def main():
    import jax.numpy as jnp

    from uig.cli.translate import load_run
    from uig.config import apply_overrides, get_preset
    from uig.eval.fid import compute_kid, make_feature_fn
    from uig.train.loop import fit

    steps1 = int(os.environ.get("UIG_PQ_STEPS1", "1500"))
    steps2 = int(os.environ.get("UIG_PQ_STEPS2", "2000"))
    workdir = os.environ.get("UIG_PQ_WORKDIR", "")
    if not workdir:
        import tempfile

        workdir = tempfile.mkdtemp(prefix="uig_prior_ab_")
    print("workdir:", workdir, flush=True)

    common = [
        "model.image_size=64",
        "model.vq_channel_mults=(1,2,4)",  # 64 -> 16x16 grid, seq 256
        "model.vq_base_features=64",
        "model.vq_embed_dim=64",
        "model.vq_codebook_size=256",
        "model.vq_attn_resolutions=(16,)",
        "data.source=synthetic",
        "data.synthetic_len=200",
        "data.load_size=72",
        "data.batch_size=16",
        "data.augment=xla",
        "loss.lambda_lpips=0",
        f"run.workdir={workdir}",
        "run.log_every=200",
        "eval.fid_every=0",
        "eval.sample_grid_every=0",
    ]
    vq_dir = os.path.join(workdir, "vq64")
    if not _have_run(vq_dir):
        vq_cfg = apply_overrides(get_preset("vqgan512"), common + [
            "model.kind=vqgan", "run.name=vq64",
            f"opt.total_steps={steps1}",
            f"run.ckpt_every={steps1}",
            "loss.vq_disc_start=500",
        ])
        print(f"=== stage 1: vqgan 64^2, {steps1} steps ===", flush=True)
        m1 = fit(vq_cfg)
        print("stage-1 final:", {k: round(v, 4) for k, v in m1.items()},
              flush=True)

    stage2_common = common + [
        "model.kind=vqgan_prior",
        f"model.prior_vqgan_run={vq_dir}",
        "model.prior_dim=256", "model.prior_depth=4", "model.prior_heads=8",
        f"opt.total_steps={steps2}",
        f"run.ckpt_every={steps2}",
        "opt.lr=3e-4",
    ]
    for style, name in (("ar", "prior_ar"), ("maskgit", "prior_mg")):
        if _have_run(os.path.join(workdir, name)):
            continue
        cfg = apply_overrides(get_preset("vqgan512"), stage2_common + [
            f"model.prior_style={style}", f"run.name={name}"])
        print(f"=== stage 2 ({style}): {steps2} steps ===", flush=True)
        m = fit(cfg)
        print(f"stage-2 {style} final:",
              {k: round(v, 4) for k, v in m.items()}, flush=True)

    # ---- eval: KID + sampling throughput for both styles ----------------
    from uig.data.datasets import SyntheticUnpairedDataset
    from uig.kernels import center_crop_normalize

    syn = SyntheticUnpairedDataset(200, 72, 0)
    real = [np.asarray(center_crop_normalize(
        jnp.asarray(np.stack([dom[i] for i in range(100)])), 64))
        for dom in (syn.domain_a, syn.domain_b)]
    real = np.concatenate(real, 0)
    cfg_eval = apply_overrides(get_preset("smoke64"), ["model.image_size=64"])
    feature_fn, fname = make_feature_fn(cfg_eval)
    print(f"extractor: {fname}", flush=True)

    n_samples, bs = 128, 16

    def batches(arr):
        for s in range(0, len(arr), bs):
            yield jnp.asarray(arr[s:s + bs])

    for style, name in (("ar", "prior_ar"), ("maskgit", "prior_mg")):
        _, trainer, state = load_run(os.path.join(workdir, name))
        rng = jax.random.PRNGKey(0)
        imgs = []
        for i in range(n_samples // bs):
            rng, k = jax.random.split(rng)
            imgs.append(np.asarray(trainer.sample(state, k, bs)))
        kid = compute_kid(batches(real), batches(np.concatenate(imgs)),
                          feature_fn, subset_size=64)
        # throughput: warm sampler, then time 5 dispatches (device_get-
        # blocked — axon block_until_ready on small outputs returns early)
        rng, k = jax.random.split(rng)
        np.asarray(trainer.sample(state, k, bs))
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            rng, k = jax.random.split(rng)
            np.asarray(trainer.sample(state, k, bs))
        dt = (time.perf_counter() - t0) / reps
        print(f"{style}: KID(real, samples) = {kid[0]:.4f} ± {kid[1]:.4f}; "
              f"sampling {bs / dt:.1f} img/s ({dt * 1e3:.0f} ms/batch-of-"
              f"{bs})", flush=True)


if __name__ == "__main__":
    main()
