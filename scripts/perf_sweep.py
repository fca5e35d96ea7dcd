"""256² CycleGAN step-time sweep on the real chip: batch size × upsample
method (× augment impl). Appends results to BASELINE.md by hand afterwards.

Run: PYTHONPATH=src python scripts/perf_sweep.py [--quick]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import numpy as np

from uig.config import apply_overrides, get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.cyclegan import CycleGANTrainer

PEAK = 197e12  # v5e bf16


def measure(overrides, steps=10):
    cfg = apply_overrides(get_preset("cyclegan256_dp"), overrides)
    mesh = make_mesh()
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = cfg.data.batch_size
    L = cfg.data.load_size
    a = rng.integers(0, 255, (B, L, L, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (B, L, L, 3), dtype=np.uint8)
    batch = shard_batch(mesh, (a, b))
    state, m = tr.train_step(state, batch)
    jax.device_get(m)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = tr.train_step(state, batch)
    jax.device_get(m)
    dt = (time.perf_counter() - t0) / steps
    flops = 0.0
    try:
        c = tr._train_step.lower(state, batch[0], batch[1]).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        flops = float(c.get("flops", 0.0))
    except Exception:
        pass
    frac = (flops / PEAK) / dt if flops else 0.0
    return B / dt, dt * 1000, flops / 1e12, frac


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    grid = []
    for batch in ([8] if quick else [8, 16, 32]):
        for up in (["conv_transpose"] if quick else ["conv_transpose",
                                                     "resize_conv"]):
            grid.append([f"data.batch_size={batch}",
                         f"model.upsample={up}",
                         "data.augment=xla", "loss.lambda_lpips=0"])
    for ov in grid:
        try:
            img_s, ms, tf, frac = measure(ov)
            print(f"{ov}: {img_s:.1f} img/s  {ms:.1f} ms/step  "
                  f"{tf:.2f} TFLOP/step  roofline {frac:.3f}", flush=True)
        except Exception as e:
            print(f"{ov}: FAIL {str(e)[:140]}", flush=True)
