"""MUNIT quality run: 64² multimodal content/style MUNIT on the synthetic
blobs↔stripes pair, driven through the FULL production path (CLI train →
pipeline → jitted shard_map step → EMA → in-training FID → checkpoints),
with the round-2-validated small-data D regularization (TTUR + R1).

Besides the FID trajectory, this checks the claim that makes MUNIT MUNIT:
after training, different style seeds produce measurably different
translations of the same content (multimodality), reported as the mean
pairwise L1 between 4 style seeds on the eval batch.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_munit.py [steps]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

OVERRIDES = [
    "model.image_size=64",
    "model.g_base_features=32",
    "model.munit_content_res=2", "model.munit_style_dim=8",
    "model.munit_mlp_dim=128",
    "model.d_layers=3", "model.d_num_scales=2",
    "data.batch_size=8", "data.load_size=72", "data.source=synthetic",
    "data.synthetic_len=200",
    f"opt.total_steps={STEPS}", f"opt.decay_start_step={STEPS // 2}",
    "opt.d_lr_ratio=0.5", "loss.r1_gamma=0.05",
    "run.log_every=100", "run.ckpt_every=1000",
    "eval.fid_every=250", "eval.fid_num_samples=200",
    f"eval.sample_grid_every={STEPS}",
    "parallel.multihost=False",
]

WORKROOT = "/tmp/uig_quality_munit"


def main():
    from uig.cli.main import main as cli

    workdir = os.path.join(WORKROOT, "munit64")
    args = ["train", "--preset", "munit256"]
    for o in OVERRIDES + [f"run.workdir={WORKROOT}", "run.name=munit64"]:
        args += ["--set", o]
    rc = cli(args)
    assert rc == 0
    fids, losses = [], []
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "fid" in rec:
                fids.append((rec["step"], rec["fid"]))
            if "g_rec_x" in rec:
                losses.append((rec["step"], rec["g_rec_x"], rec["g_rec_s"],
                               rec.get("d_loss", 0.0)))
    for s, rx, rs, d in losses[:: max(1, len(losses) // 8)]:
        print(f"step {s:5d}  g_rec_x {rx:7.3f}  g_rec_s {rs:6.3f}  "
              f"d {d:6.3f}")
    if fids:
        best = min(fids, key=lambda t: t[1])
        print(f"FID trajectory: first {fids[0][1]:.4f} @ {fids[0][0]} "
              f"... best {best[1]:.4f} @ {best[0]} "
              f"... final {fids[-1][1]:.4f} @ {fids[-1][0]}")

    # multimodality: same content, 4 style seeds -> mean pairwise L1
    import jax
    import numpy as np

    from uig.cli.translate import load_run
    from uig.data import eval_datasets
    from uig.kernels import center_crop_normalize

    cfg, trainer, state = load_run(workdir)
    ds_a, _ = eval_datasets(cfg)
    raw = np.stack([ds_a[i] for i in range(8)])
    x = center_crop_normalize(jax.numpy.asarray(raw), cfg.model.image_size)
    outs = [np.asarray(trainer.translate(
        state.ema, x, "a2b", style_rng=jax.random.PRNGKey(s)))
        for s in range(4)]
    dists = [np.abs(outs[i] - outs[j]).mean()
             for i in range(4) for j in range(i + 1, 4)]
    print(f"multimodality: mean pairwise L1 over 4 style seeds = "
          f"{float(np.mean(dists)):.4f} (0 would mean style is ignored)")


if __name__ == "__main__":
    main()
