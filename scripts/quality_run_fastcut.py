"""CUT vs FastCUT quality A/B: 64² on the synthetic blobs↔stripes pair,
full production path (CLI train → jitted step → EMA → in-training FID).
The CUT paper's claim for its second recipe: FastCUT trains ~2× faster
(no identity NCE pass) at somewhat weaker quality; both trajectories and
wall-clock land here so the trade is measured, not asserted.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_fastcut.py [steps]
"""

import sys

from quality_harness import collect_fids, read_metrics, run_cli_train

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

COMMON = [
    "model.image_size=64", "model.n_res_blocks=6",
    "model.nce_layers=(0,4,8,12)",
    "data.batch_size=8", "data.load_size=72", "data.source=synthetic",
    "data.synthetic_len=200",
    f"opt.total_steps={STEPS}", f"opt.decay_start_step={STEPS // 2}",
    "opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05",
    "run.log_every=100", "run.ckpt_every=1000",
    "eval.fid_every=250", "eval.fid_num_samples=200",
    f"eval.sample_grid_every={STEPS}",
    "parallel.multihost=False",
]

VARIANTS = {
    "cut64": ("cut256_multihost", []),
    "fastcut64": ("fastcut256", []),
}

WORKROOT = "/tmp/uig_quality_fastcut"


def run_variant(name, preset, extra):
    workdir, wall = run_cli_train(preset, WORKROOT, name, COMMON + extra)
    fids = collect_fids(read_metrics(workdir))
    best = min(fids, key=lambda t: t[1]) if fids else (0, float("nan"))
    print(f"{name:<10s} wall {wall:7.1f}s  "
          f"FID first {fids[0][1]:.4f} @ {fids[0][0]} "
          f"... best {best[1]:.4f} @ {best[0]} "
          f"... final {fids[-1][1]:.4f} @ {fids[-1][0]}", flush=True)
    return wall, best[1]


def main():
    results = {}
    for name, (preset, extra) in VARIANTS.items():
        results[name] = run_variant(name, preset, extra)
    (wc, fc), (wf, ff) = results["cut64"], results["fastcut64"]
    print(f"FastCUT vs CUT: {wc / wf:.2f}x faster wall-clock, "
          f"best FID {ff:.4f} vs {fc:.4f}")


if __name__ == "__main__":
    main()
