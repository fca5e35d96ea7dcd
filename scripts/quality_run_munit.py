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

import sys

from quality_harness import (load_eval_batch, mean_pairwise_l1,
                             run_and_summarize)

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


def main():
    workdir, _, _, _ = run_and_summarize(
        "munit256", "/tmp/uig_quality_munit", "munit64", OVERRIDES,
        loss_keys=[("g_rec_x", "7.3f"), ("g_rec_s", "6.3f"),
                   ("d_loss", "6.3f")])

    # multimodality: same content, 4 style seeds -> mean pairwise L1
    import jax
    import numpy as np

    cfg, trainer, state, x = load_eval_batch(workdir, n=8)
    outs = [np.asarray(trainer.translate(
        state.ema, x, "a2b", style_rng=jax.random.PRNGKey(s)))
        for s in range(4)]
    print(f"multimodality: mean pairwise L1 over 4 style seeds = "
          f"{mean_pairwise_l1(outs):.4f} (0 would mean style is ignored)")


if __name__ == "__main__":
    main()
