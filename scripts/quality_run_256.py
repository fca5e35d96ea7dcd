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
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    from uig.cli.main import main as cli

    workdir = "/tmp/uig_quality_256"
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
        f"run.workdir={workdir}", "run.name=dreg256",
    ]
    args = ["train", "--preset", "cyclegan256_dp"]
    for o in overrides:
        args += ["--set", o]
    rc = cli(args)
    assert rc == 0

    fids, dloss, rate = [], [], []
    with open(os.path.join(workdir, "dreg256", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "fid" in rec:
                fids.append((rec["step"], rec["fid"]))
            if "d_loss" in rec:
                dloss.append((rec["step"], rec["d_loss"]))
            if "images_per_sec" in rec:
                rate.append(rec["images_per_sec"])
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
