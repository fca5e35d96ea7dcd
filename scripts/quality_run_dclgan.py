"""DCLGAN quality run: 64² dual-contrastive translation on the synthetic
blobs↔stripes pair, through the FULL production path (CLI train → pipeline
→ one jitted shard_map step → EMA both directions → in-training FID →
checkpoints), with the round-2-validated small-data D regularization
(TTUR + R1).

Besides the FID trajectory, this measures the claims that make DCLGAN
DCLGAN, through the EMA serving weights:
  * content preservation WITHOUT a cycle loss: the dual cross-embedding
    PatchNCE is the only content constraint, yet the (never-trained) cycle
    reconstruction G_b2a(G_a2b(x)) should stay far closer to x than to a
    different image — NCE holds the content, not a cycle term;
  * the two directions are independently trained generators: a2b and b2a
    diverge on the same inputs.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_dclgan.py [steps]
"""

import sys

from quality_harness import load_eval_batch, run_and_summarize

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

OVERRIDES = [
    "model.image_size=64",
    "model.g_base_features=32", "model.d_base_features=32",
    "model.n_res_blocks=3",
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


def main():
    workdir, _, _, _ = run_and_summarize(
        "dclgan256", "/tmp/uig_quality_dclgan", "dclgan64", OVERRIDES,
        loss_keys=[("nce_a", "6.3f"), ("nce_b", "6.3f"),
                   ("g_adv", "6.3f"), ("d_loss", "6.3f")])

    import jax
    import numpy as np

    cfg, trainer, state, x = load_eval_batch(workdir, n=8)
    ema = jax.device_get(state.ema)

    # content preservation without a cycle loss: the untrained cycle
    # reconstruction must sit far closer to its own input than to other
    # images (the dual NCE is the only thing holding content in place)
    y = trainer.translate(ema, x, "a2b")
    cyc = np.asarray(trainer.translate(ema, jax.numpy.asarray(y), "b2a"))
    xn = np.asarray(x)
    own = float(np.abs(cyc - xn).mean())
    cross = float(np.abs(cyc - np.roll(xn, 1, axis=0)).mean())
    print(f"content preservation (cycle NEVER trained): own-input cycle L1 "
          f"{own:.4f} vs rolled-pairing {cross:.4f} "
          f"({cross / max(own, 1e-9):.1f}x)")

    y_ab = np.asarray(y)
    y_ba = np.asarray(trainer.translate(ema, x, "b2a"))
    print(f"direction sensitivity: a2b-vs-b2a L1 = "
          f"{float(np.abs(y_ab - y_ba).mean()):.4f}")


if __name__ == "__main__":
    main()
