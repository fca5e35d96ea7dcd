"""CUT training-dynamics run at 256² (VERDICT r4 weak #5 / r5 item 8):
the first >64² quality trajectory for a second family, through the FULL
production path (CLI train → pipeline → jitted step → EMA → in-training
FID → best-FID checkpoint retention), with the validated small-data
recipe (TTUR + R1) on the synthetic 200-images/domain set.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_cut256.py [steps]
"""

import json
import sys

from quality_harness import collect_fids, read_metrics, run_cli_train


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    overrides = [
        "data.source=synthetic", "data.synthetic_len=200",
        "data.batch_size=8", "data.augment=xla",
        "loss.lambda_lpips=0",
        # validated small-data recipe (BASELINE.md quality run v2)
        "opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05",
        f"opt.total_steps={steps}", f"opt.decay_start_step={steps // 2}",
        "run.log_every=100", f"run.ckpt_every={steps // 4}",
        "eval.fid_every=250", "eval.fid_num_samples=128",
        "eval.fid_batch_size=8",
        f"eval.sample_grid_every={steps // 2}",
        "parallel.multihost=False",
    ]
    workdir, wall = run_cli_train("cut256_multihost", "/tmp/uig_quality_cut256",
                                  "cut256q", overrides)
    records = read_metrics(workdir)
    fids = collect_fids(records)
    nce = [(r["step"], r.get("g_nce", 0.0)) for r in records if "g_loss" in r]
    rate = [r["images_per_sec"] for r in records if "images_per_sec" in r]
    best = min(fids, key=lambda t: t[1]) if fids else None
    print(json.dumps({
        "steps": steps,
        "wall_s": round(wall, 1),
        "best_fid": best,
        "final_fid": fids[-1] if fids else None,
        "fid_trajectory": [(s, round(v, 4)) for s, v in fids],
        "g_nce_last": nce[-1] if nce else None,
        "median_img_s": sorted(rate)[len(rate) // 2] if rate else None,
    }), flush=True)


if __name__ == "__main__":
    main()
