"""Quickstart: train a tiny CycleGAN on the built-in synthetic unpaired set,
then translate a few images — everything on whatever accelerator is present.

    PYTHONPATH=src python examples/quickstart.py [workdir]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax

# Robust backend pick: if an env pins JAX_PLATFORMS to an accelerator that
# can't initialize here (e.g. a TPU tunnel that is not claimable), fall
# back to CPU instead of crashing the quickstart.
try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from uig import apply_overrides, fit, get_preset


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/uig_quickstart"
    cfg = apply_overrides(get_preset("smoke64"), [
        f"run.workdir={workdir}", "run.name=quickstart",
        "run.ckpt_every=50", "run.log_every=10",
        "data.batch_size=2", "opt.pool_size=16",
        "parallel.num_devices=1",
        "eval.sample_grid_every=50", "eval.sample_grid_n=3",
    ])
    print("training 100 steps on synthetic blobs↔stripes ...")
    metrics = fit(cfg, max_steps=100)
    print("final:", {k: round(v, 3) for k, v in metrics.items()})

    # translate through the saved EMA generator
    from uig.cli.translate import load_run
    from uig.data import eval_datasets
    from uig.kernels import center_crop_normalize, denormalize_to_u8

    run_dir = os.path.join(workdir, "quickstart")
    cfg, trainer, state = load_run(run_dir)
    ds_a, _ = eval_datasets(cfg)
    import jax.numpy as jnp

    raw = jnp.asarray(np.stack([ds_a[i] for i in range(3)]))
    x = center_crop_normalize(raw, cfg.model.image_size)
    y = trainer.translate(state.ema, x, "a2b")
    out = np.asarray(denormalize_to_u8(y))
    from PIL import Image

    os.makedirs(os.path.join(run_dir, "quickstart_out"), exist_ok=True)
    for i, img in enumerate(out):
        Image.fromarray(img).save(
            os.path.join(run_dir, "quickstart_out", f"{i}.png"))
    print("translated 3 images ->", os.path.join(run_dir, "quickstart_out"))
    print("sample grids ->", os.path.join(run_dir, "samples"))


if __name__ == "__main__":
    main()
