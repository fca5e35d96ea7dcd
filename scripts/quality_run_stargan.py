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

import sys

from quality_harness import (load_eval_batch, mean_pairwise_l1,
                             run_and_summarize)

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


def main():
    workdir, _, _, _ = run_and_summarize(
        "stargan128", "/tmp/uig_quality_stargan", "stargan64", OVERRIDES,
        loss_keys=[("d_cls", "6.3f"), ("g_rec", "7.3f"),
                   ("d_loss", "7.3f")])

    # domain transfer: same inputs to each target -> mean pairwise L1
    import numpy as np

    cfg, trainer, state, x = load_eval_batch(workdir, n=6, domain=0)
    n = cfg.model.num_domains
    outs = [np.asarray(trainer.translate(state.ema, x, t)) for t in range(n)]
    print(f"domain transfer: mean pairwise L1 over {n} targets = "
          f"{mean_pairwise_l1(outs):.4f} (0 would mean the label is ignored)")


if __name__ == "__main__":
    main()
