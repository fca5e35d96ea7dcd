"""UNIT quality run: 64² shared-latent UNIT on the synthetic blobs↔stripes
pair, driven through the FULL production path (CLI train → packed pipeline →
jitted shard_map step → EMA → in-training FID → checkpoints), with the
round-2-validated small-data D regularization (TTUR + R1).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_unit.py [steps]
Prints the FID trajectory summary; full metrics land in the run workdir.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000

OVERRIDES = [
    "model.image_size=64",
    "model.g_base_features=32",
    "model.unit_private_res=2", "model.unit_shared_res=2",
    "model.d_layers=3",
    "data.batch_size=8", "data.load_size=72", "data.source=synthetic",
    "data.synthetic_len=200",
    f"opt.total_steps={STEPS}", f"opt.decay_start_step={STEPS // 2}",
    "opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05",
    "run.log_every=100", "run.ckpt_every=1000",
    "eval.fid_every=250", "eval.fid_num_samples=200",
    f"eval.sample_grid_every={STEPS}",
]


def main():
    from uig.cli.main import main as cli

    workdir = "/tmp/uig_quality_unit/unit64"
    args = ["train", "--preset", "unit256"]
    for o in OVERRIDES + ["run.workdir=/tmp/uig_quality_unit",
                          "run.name=unit64"]:
        args += ["--set", o]
    rc = cli(args)
    assert rc == 0
    fids, losses = [], []
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "fid" in rec:
                fids.append((rec["step"], rec["fid"]))
            if "g_rec" in rec:
                losses.append((rec["step"], rec["g_rec"], rec["g_cc"],
                               rec.get("d_loss", 0.0)))
    for s, r, c, d in losses[:: max(1, len(losses) // 8)]:
        print(f"step {s:5d}  g_rec {r:7.3f}  g_cc {c:7.3f}  d {d:6.3f}")
    if fids:
        best = min(fids, key=lambda t: t[1])
        print(f"FID trajectory: first {fids[0][1]:.4f} @ {fids[0][0]} "
              f"... best {best[1]:.4f} @ {best[0]} "
              f"... final {fids[-1][1]:.4f} @ {fids[-1][0]}")


if __name__ == "__main__":
    main()
