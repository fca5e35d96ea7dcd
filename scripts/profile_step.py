"""Capture a jax.profiler trace of N training steps on the real chip.

Run: PYTHONPATH=src:$PYTHONPATH python scripts/profile_step.py [outdir] [steps]
View: tensorboard --logdir <outdir>  (profile plugin) or perfetto.
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


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/uig_profile"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cfg = apply_overrides(get_preset("cyclegan256_dp"), [
        "data.batch_size=16", "data.augment=xla", "loss.lambda_lpips=0"])
    mesh = make_mesh()
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    L = cfg.data.load_size
    a = rng.integers(0, 255, (16, L, L, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (16, L, L, 3), dtype=np.uint8)
    bd = shard_batch(mesh, (a, b))
    state, m = tr.train_step(state, bd)
    jax.device_get(m)

    jax.profiler.start_trace(outdir)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = tr.train_step(state, bd)
    jax.device_get(m)
    jax.profiler.stop_trace()
    print(f"trace -> {outdir} ({steps} steps, "
          f"{(time.perf_counter()-t0)/steps*1000:.0f} ms/step)")


if __name__ == "__main__":
    main()
