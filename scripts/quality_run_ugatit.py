"""U-GAT-IT quality run: 64² CAM-attention U-GAT-IT on the synthetic
blobs↔stripes pair, driven through the FULL production path (CLI train →
pipeline → jitted shard_map step → EMA → in-training FID → checkpoints),
with the round-2-validated small-data D regularization (TTUR + R1).

Besides the FID trajectory, this checks the claim that makes U-GAT-IT
U-GAT-IT: after training, each generator's CAM attention classifier
separates its source domain from the other domain (the λ_cam=1000 BCE
objective), and the attention heatmap is input-dependent rather than a
constant mask. Reported as the source-vs-target CAM logit separation and
the across-image heatmap variance, both through the EMA serving weights.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_ugatit.py [steps]
"""

import sys

from quality_harness import run_and_summarize

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

OVERRIDES = [
    "model.image_size=64",
    "model.g_base_features=32", "model.d_base_features=32",
    "model.n_res_blocks=3",
    # published depths (7/5) bottom out below a 1×1 logit map at 64²;
    # 6/4 keep the same global(deep)/local(shallow) split at this scale
    "model.ugatit_d_global_layers=6", "model.ugatit_d_local_layers=4",
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
        "ugatit256", "/tmp/uig_quality_ugatit", "ugatit64", OVERRIDES,
        loss_keys=[("g_cycle", "7.3f"), ("g_cam", "9.2f"),
                   ("d_loss", "6.3f")])

    # the attention claim: a2b's CAM classifier fires on domain A (its
    # translation source) and not on domain B (its identity input)
    import jax
    import numpy as np

    from uig.cli.translate import load_run
    from uig.data import eval_datasets
    from uig.kernels import center_crop_normalize

    cfg, trainer, state = load_run(workdir)
    ds_a, ds_b = eval_datasets(cfg)
    xa = center_crop_normalize(
        jax.numpy.asarray(np.stack([ds_a[i] for i in range(16)])),
        cfg.model.image_size)
    xb = center_crop_normalize(
        jax.numpy.asarray(np.stack([ds_b[i] for i in range(16)])),
        cfg.model.image_size)
    g = trainer.eval_generator
    cam_src = np.asarray(g.apply(state.ema["a2b"], xa)[1]).mean(-1)
    cam_tgt = np.asarray(g.apply(state.ema["a2b"], xb)[1]).mean(-1)
    acc = float(np.mean((cam_src[:, None] > cam_tgt[None, :])))
    print(f"CAM separation (a2b): source-domain logit mean "
          f"{cam_src.mean():+.3f} vs target {cam_tgt.mean():+.3f}  "
          f"pairwise ranking accuracy {acc:.3f} (0.5 = chance)")
    heat = np.asarray(trainer.attention_heatmap(state.ema, xa, "a2b"))
    per_img = heat.reshape(heat.shape[0], -1)
    spatial_var = float(per_img.var(axis=1).mean())
    across_img = float(per_img.mean(axis=1).var())
    print(f"attention heatmap: mean within-image spatial variance "
          f"{spatial_var:.4f}, across-image variance {across_img:.4f} "
          f"(both ≈0 would mean a constant, input-ignoring mask)")


if __name__ == "__main__":
    main()
