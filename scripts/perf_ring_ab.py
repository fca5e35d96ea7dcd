"""Step-level A/B of reflect ring-delta formulations (see ring_delta_v2.py).

The fused reflect conv costs ~9% of the 256² step vs padding=zeros and the
round-3 analysis attributes it to HLO op count. This times the REAL 256²
CycleGAN train step with each formulation monkeypatched into
uig.models.layers (both reflect_conv2d and the s2d head path read the
module global, so one patch covers every callsite).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/perf_ring_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

import ring_delta_v2 as rd
from uig.models import layers


def measure(name, batch=16, steps=15, repeats=3):
    from uig.config import apply_overrides, get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.cyclegan import CycleGANTrainer

    cfg = apply_overrides(get_preset("cyclegan256_dp"), [
        f"data.batch_size={batch}", "data.augment=xla",
        "loss.lambda_lpips=0",
    ])
    mesh = make_mesh()
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    L = cfg.data.load_size
    a = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
    dev = shard_batch(mesh, (a, b))
    state, m = tr.train_step(state, dev)
    jax.device_get(m)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, m = tr.train_step(state, dev)
        jax.device_get(m)
        best = min(best, (time.perf_counter() - t0) / steps)
    print(f"{name:<10s} {best*1e3:7.1f} ms/step  {batch/best:6.1f} img/s",
          flush=True)
    return best


def main():
    shipped = layers.add_reflect_ring_delta
    variants = {
        "ship": shipped,
        "v2": rd.ring_delta_v2,
        "v3": rd.ring_delta_v3,
    }
    names = sys.argv[1:] or list(variants)
    for n in names:
        layers.add_reflect_ring_delta = variants[n]
        try:
            measure(n)
        finally:
            layers.add_reflect_ring_delta = shipped


if __name__ == "__main__":
    main()
