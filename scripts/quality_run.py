"""Quality run v2 (VERDICT round-1 item 9): 64² CycleGAN on the synthetic
blobs↔stripes pair, 5000 steps with in-training FID — A/B'ing the round-1
failure mode fix (D overpowers G on small data: d_loss→0.04 and FID drifts
up after step ~2000).

Variants:
  base        round-1 recipe reproduction
  dreg        d_lr_ratio=0.5 + r1_gamma=0.05 (weakened/regularized D)
  dreg_resize dreg + upsample=resize_conv (checkerboard ablation)

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run.py [variants]
Outputs FID trajectory summaries; full metrics land in the run workdirs.
"""

import sys

from quality_harness import collect_fids, read_metrics, run_cli_train

VARIANTS = {
    "base": [],
    "dreg": ["opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05"],
    "dreg_resize": ["opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05",
                    "model.upsample=resize_conv"],
    # round-3 ADA variants on top of the best round-2 recipe: the adaptive
    # controller (speed scaled to this run's 40 kimg budget — canonical 500
    # kimg would cap p at 0.08) and fixed-p DiffAugment
    "dreg_resize_ada": ["opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05",
                        "model.upsample=resize_conv",
                        "loss.ada_target=0.6", "loss.ada_speed_kimg=20"],
    "dreg_resize_diffaug": ["opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05",
                            "model.upsample=resize_conv",
                            "loss.ada_p_init=0.3"],
}

COMMON = [
    "model.image_size=64", "model.n_res_blocks=6",
    "data.batch_size=8", "data.load_size=72", "data.source=synthetic",
    "data.synthetic_len=200",
    "opt.total_steps=5000", "opt.decay_start_step=2500",
    "run.log_every=100", "run.ckpt_every=1000",
    "eval.fid_every=250", "eval.fid_num_samples=200",
    "eval.sample_grid_every=2500",
]


def run_variant(name: str, overrides):
    workdir, _ = run_cli_train("smoke64", "/tmp/uig_quality_r2", name,
                               COMMON + overrides)
    fids = collect_fids(read_metrics(workdir))
    if not fids:
        print(f"{name}: no FID records!")
        return
    best = min(fids, key=lambda t: t[1])
    print(f"{name}: best FID {best[1]:.4f} @ step {best[0]}; "
          f"final {fids[-1][1]:.4f} @ {fids[-1][0]}; "
          f"trajectory {[(s, round(v, 3)) for s, v in fids]}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        run_variant(n, VARIANTS[n])
