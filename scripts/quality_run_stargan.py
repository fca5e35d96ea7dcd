"""StarGAN quality run: 64² 3-domain translation on the synthetic
blobs/stripes/checker set, through the FULL production path (CLI train →
multi-domain pipeline → jitted shard_map step with the lax.cond n_critic
gate → EMA → in-training multi-domain FID → checkpoints).

Besides the FID trajectory (all-domains → domain 0 vs domain-0 reals),
this checks the two claims that make StarGAN StarGAN:
  * domain transfer: after training, translating the same inputs to
    different target domains produces measurably different images
    (mean pairwise L1 across the N targets), and
  * the D's auxiliary classifier learns the domains (cls CE → well under
    ln N on real images).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_stargan.py [steps]
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

OVERRIDES = [
    "model.image_size=64",
    "model.num_domains=3",
    "model.g_base_features=32",
    "model.n_res_blocks=2",
    "model.d_layers=4",
    "data.batch_size=6", "data.load_size=72", "data.source=synthetic",
    "data.synthetic_len=200",
    f"opt.total_steps={STEPS}", f"opt.decay_start_step={STEPS // 2}",
    "opt.d_steps_per_g=5",
    "run.log_every=100", "run.ckpt_every=1000",
    "eval.fid_every=250", "eval.fid_num_samples=200",
    f"eval.sample_grid_every={STEPS}",
    "parallel.multihost=False",
]

WORKROOT = "/tmp/uig_quality_stargan"


def main():
    from uig.cli.main import main as cli

    workdir = os.path.join(WORKROOT, "stargan64")
    args = ["train", "--preset", "stargan128"]
    for o in OVERRIDES + [f"run.workdir={WORKROOT}", "run.name=stargan64"]:
        args += ["--set", o]
    rc = cli(args)
    assert rc == 0
    fids, losses = [], []
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "fid" in rec:
                fids.append((rec["step"], rec["fid"]))
            if "d_cls" in rec:
                losses.append((rec["step"], rec.get("g_rec", 0.0),
                               rec["d_cls"], rec.get("d_loss", 0.0)))
    for s, gr, dc, d in losses[:: max(1, len(losses) // 8)]:
        print(f"step {s:5d}  g_rec {gr:7.3f}  d_cls {dc:6.3f}  d {d:7.3f}")
    if fids:
        best = min(fids, key=lambda t: t[1])
        print(f"FID trajectory: first {fids[0][1]:.4f} @ {fids[0][0]} "
              f"... best {best[1]:.4f} @ {best[0]} "
              f"... final {fids[-1][1]:.4f} @ {fids[-1][0]}")

    # domain transfer: same inputs to each target -> mean pairwise L1
    import jax
    import numpy as np

    from uig.cli.translate import load_run
    from uig.data import multidomain_eval_datasets
    from uig.kernels import center_crop_normalize

    cfg, trainer, state = load_run(workdir)
    domains = multidomain_eval_datasets(cfg)
    raw = np.stack([domains[0][i] for i in range(6)])
    x = center_crop_normalize(jax.numpy.asarray(raw), cfg.model.image_size)
    n = cfg.model.num_domains
    outs = [np.asarray(trainer.translate(state.ema, x, t)) for t in range(n)]
    dists = [np.abs(outs[i] - outs[j]).mean()
             for i in range(n) for j in range(i + 1, n)]
    print(f"domain transfer: mean pairwise L1 over {n} targets = "
          f"{float(np.mean(dists)):.4f} (0 would mean the label is ignored)")


if __name__ == "__main__":
    main()
