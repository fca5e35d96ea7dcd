"""NICE-GAN quality run: 64² encoder-reuse translation on the synthetic
blobs↔stripes pair, through the FULL production path (CLI train → pipeline
→ one jitted shard_map step with the decoupled D-then-decoder updates →
EMA → in-training FID → checkpoints), with the round-2-validated
small-data D regularization (TTUR + R1).

Besides the FID trajectory, this measures the claims that make NICE-GAN
NICE-GAN, through the EMA serving weights:
  * the reused encoding is TRANSLATION-USEFUL: Dec_src(E_src(x))
    reconstructs the input (the λ_rec objective) far better than decoding
    a shuffled encoding — the encoder inside D carries image content, not
    just critic features;
  * direction sensitivity: a2b and b2a diverge on the same inputs.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/quality_run_nicegan.py [steps]
"""

import sys

from quality_harness import load_eval_batch, run_and_summarize

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

OVERRIDES = [
    "model.image_size=64",
    "model.g_base_features=32", "model.d_base_features=32",
    "model.n_res_blocks=3",
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
        "nicegan256", "/tmp/uig_quality_nicegan", "nicegan64", OVERRIDES,
        loss_keys=[("g_rec", "7.3f"), ("g_cycle", "7.3f"),
                   ("d_loss", "7.3f")])

    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg, trainer, state, x = load_eval_batch(workdir, n=8)
    ema = jax.device_get(state.ema)

    # encoding usefulness: own-encoding decode reconstructs the input;
    # decoding a batch-shuffled encoding must be much worse
    z = trainer.eval_encoder.apply(
        {"params": ema["e"]["a"]["params"], "sn": ema["e_sn"]["a"]},
        x.astype(jnp.float32), False)
    rec = trainer.eval_decoder.apply(ema["dec"]["a"], z)
    rec_err = float(np.abs(np.asarray(rec) - np.asarray(x)).mean())
    shuf = trainer.eval_decoder.apply(ema["dec"]["a"], z[::-1])
    shuf_err = float(np.abs(np.asarray(shuf) - np.asarray(x)).mean())
    print(f"encoding usefulness: own-encoding recon L1 {rec_err:.4f} vs "
          f"shuffled-encoding {shuf_err:.4f} "
          f"({shuf_err / max(rec_err, 1e-9):.1f}x worse)")

    y_ab = np.asarray(trainer.translate(ema, x, "a2b"))
    y_ba = np.asarray(trainer.translate(ema, x, "b2a"))
    print(f"direction sensitivity: a2b-vs-b2a L1 = "
          f"{float(np.abs(y_ab - y_ba).mean()):.4f}")


if __name__ == "__main__":
    main()
