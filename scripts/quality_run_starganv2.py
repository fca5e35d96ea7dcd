"""StarGAN v2 quality run: 64² 3-domain style-based translation on the
synthetic multi-domain set, through the FULL production path (CLI train →
3-stream multi-domain pipeline → one jitted shard_map step with all four
network updates → EMA of G/F/E → in-training multi-domain FID →
checkpoints).

Besides the FID trajectory (all-domains → domain 0 vs domain-0 reals),
this measures the claims that make v2 v2:
  * latent multimodality: the same inputs translated with different
    mapping-network seeds produce measurably different images (mean
    pairwise L1 across seeds) — the diversity-sensitive loss at work,
  * reference-guided styles: two different target-domain reference images
    steer the same inputs to different outputs, and the same reference is
    deterministic,
  * domain transfer: different target domains differ more than different
    styles within one domain.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_starganv2.py [steps]
"""

import sys

from quality_harness import (load_eval_batch, mean_pairwise_l1,
                             run_and_summarize)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

OVERRIDES = [
    "model.image_size=64",
    "model.num_domains=3",
    "model.g_base_features=32",
    "model.d_base_features=32",
    "model.v2_max_features=256",
    "data.batch_size=6", "data.load_size=72", "data.source=synthetic",
    "data.synthetic_len=200",
    f"opt.total_steps={STEPS}", f"opt.decay_start_step={STEPS}",
    f"loss.ds_decay_steps={STEPS}",
    "run.log_every=100", "run.ckpt_every=1000",
    "eval.fid_every=250", "eval.fid_num_samples=200",
    f"eval.sample_grid_every={STEPS}",
    "parallel.multihost=False",
]


def main():
    workdir, _, _, _ = run_and_summarize(
        "starganv2_256", "/tmp/uig_quality_starganv2", "v2_64", OVERRIDES,
        loss_keys=[("g_sty", "7.3f"), ("g_ds", "6.3f"), ("g_cyc", "6.3f"),
                   ("d_loss", "7.3f")])

    import jax
    import numpy as np

    from uig.data import multidomain_eval_datasets
    from uig.kernels import center_crop_normalize

    cfg, trainer, state, x = load_eval_batch(workdir, n=6, domain=0)
    ema = jax.device_get(state.ema)
    n = cfg.model.num_domains

    # latent multimodality: 4 seeds into domain 1
    seeds = [0, 1, 2, 3]
    outs = [np.asarray(trainer.translate(ema, x, 1, style_seed=s))
            for s in seeds]
    print(f"latent multimodality: mean pairwise L1 over {len(seeds)} seeds "
          f"(-> domain 1) = {mean_pairwise_l1(outs):.4f} "
          f"(0 would mean the style is ignored)")

    # reference-guided: two refs steer differently; same ref deterministic
    domains = multidomain_eval_datasets(cfg)
    ref_raw = np.stack([domains[1][i] for i in range(2)])
    xr = center_crop_normalize(jax.numpy.asarray(ref_raw),
                               cfg.model.image_size)
    s_refs = trainer.encode_style(ema, xr, 1)
    y_r0 = np.asarray(trainer.translate(ema, x, 1, style=s_refs[:1]))
    y_r0b = np.asarray(trainer.translate(ema, x, 1, style=s_refs[:1]))
    y_r1 = np.asarray(trainer.translate(ema, x, 1, style=s_refs[1:2]))
    print(f"reference-guided: ref0-vs-ref1 L1 = "
          f"{float(np.abs(y_r0 - y_r1).mean()):.4f}; deterministic = "
          f"{bool(np.array_equal(y_r0, y_r0b))}")

    # domain transfer at a fixed seed
    douts = [np.asarray(trainer.translate(ema, x, t, style_seed=0))
             for t in range(n)]
    print(f"domain transfer: mean pairwise L1 over {n} targets = "
          f"{mean_pairwise_l1(douts):.4f}")


if __name__ == "__main__":
    main()
