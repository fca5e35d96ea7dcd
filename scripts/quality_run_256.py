"""Training-dynamics run at the HEADLINE rung (256² CycleGAN) — round 3.

Every quality run so far was 64²; this drives the full production path
(CLI train → pipeline → jitted step → EMA → in-training FID → sample
grids → checkpoints) at the BASELINE.json rung-3 resolution on the real
chip, with the validated small-data recipe (TTUR + R1; the synthetic set
has only 200 images/domain, so an unregularized D overpowers G exactly
like the 64² round-1 failure mode).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_256.py [steps]
"""

import json
import sys

from quality_harness import collect_fids, read_metrics, run_cli_train


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    overrides = [
        "data.source=synthetic", "data.synthetic_len=200",
        "data.batch_size=8", "data.augment=xla",
        # headline-bench parity: no LPIPS term (bench.py measures without)
        "loss.lambda_lpips=0",
        # validated small-data recipe (BASELINE.md quality run v2)
        "opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05",
        f"opt.total_steps={steps}", f"opt.decay_start_step={steps // 2}",
        "run.log_every=100", f"run.ckpt_every={steps // 2}",
        "eval.fid_every=250", "eval.fid_num_samples=128",
        "eval.fid_batch_size=8",
        f"eval.sample_grid_every={steps // 2}",
    ]
    workdir, _ = run_cli_train("cyclegan256_dp", "/tmp/uig_quality_256",
                               "dreg256", overrides)
    records = read_metrics(workdir)
    fids = collect_fids(records)
    dloss = [(r["step"], r["d_loss"]) for r in records if "d_loss" in r]
    rate = [r["images_per_sec"] for r in records if "images_per_sec" in r]
    best = min(fids, key=lambda t: t[1]) if fids else None
    print(json.dumps({
        "steps": steps,
        "best_fid": best,
        "final_fid": fids[-1] if fids else None,
        "fid_trajectory": [(s, round(v, 4)) for s, v in fids],
        "d_loss_last": dloss[-1] if dloss else None,
        "median_img_s": sorted(rate)[len(rate) // 2] if rate else None,
    }), flush=True)


if __name__ == "__main__":
    main()
