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

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

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

WORKROOT = "/tmp/uig_quality_nicegan"


def main():
    from uig.cli.main import main as cli

    workdir = os.path.join(WORKROOT, "nicegan64")
    args = ["train", "--preset", "nicegan256"]
    for o in OVERRIDES + [f"run.workdir={WORKROOT}", "run.name=nicegan64"]:
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
                losses.append((rec["step"], rec["g_rec"], rec["g_cycle"],
                               rec.get("d_loss", 0.0)))
    for s, gr, gc, d in losses[:: max(1, len(losses) // 8)]:
        print(f"step {s:5d}  g_rec {gr:7.3f}  g_cyc {gc:7.3f}  d {d:7.3f}")
    if fids:
        best = min(fids, key=lambda t: t[1])
        print(f"FID trajectory: first {fids[0][1]:.4f} @ {fids[0][0]} "
              f"... best {best[1]:.4f} @ {best[0]} "
              f"... final {fids[-1][1]:.4f} @ {fids[-1][0]}")

    import jax
    import numpy as np

    from uig.cli.translate import load_run
    from uig.data import eval_datasets
    from uig.kernels import center_crop_normalize

    cfg, trainer, state = load_run(workdir)
    ema = jax.device_get(state.ema)
    ds_a, _ = eval_datasets(cfg)
    raw = np.stack([ds_a[i] for i in range(8)])
    x = center_crop_normalize(jax.numpy.asarray(raw), cfg.model.image_size)

    # encoding usefulness: own-encoding decode reconstructs the input;
    # decoding a batch-shuffled encoding must be much worse
    import jax.numpy as jnp

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
