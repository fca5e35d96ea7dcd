"""UNIT quality run: 64² shared-latent UNIT on the synthetic blobs↔stripes
pair, driven through the FULL production path (CLI train → packed pipeline →
jitted shard_map step → EMA → in-training FID → checkpoints), with the
round-2-validated small-data D regularization (TTUR + R1).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_unit.py [steps]
Prints the FID trajectory summary; full metrics land in the run workdir.
"""

import sys

from quality_harness import run_and_summarize

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


if __name__ == "__main__":
    run_and_summarize(
        "unit256", "/tmp/uig_quality_unit", "unit64", OVERRIDES,
        loss_keys=[("g_rec", "7.3f"), ("g_cc", "7.3f"), ("d_loss", "6.3f")])
