"""Step-level config ablations for the 256² CycleGAN train step — measures
the REAL in-graph effect of config levers (isolated-op numbers mislead:
see the conv_impl saga in BASELINE.md).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/perf_ablate.py [names...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import numpy as np

ABLATIONS = {
    "baseline": [],
    "pad_explicit": ["model.pad_impl=explicit"],
    # head_s2d=4 became the preset default in round 3 — ablate it OFF
    "head_s2d_off": ["model.head_s2d=0"],
    "stem_s2d": ["model.stem_s2d=4"],
    "head_s2d8": ["model.head_s2d=8"],
    "down_s2d": ["model.down_s2d=2"],
    "all_s2d": ["model.stem_s2d=4", "model.head_s2d=8", "model.down_s2d=2"],
    "fused_applies": ["model.fused_applies=true"],
    "pad_zeros": ["model.padding=zeros"],
    "resize_conv": ["model.upsample=resize_conv"],
    "remat_blocks": ["model.remat=blocks"],
    "no_idt": ["loss.lambda_identity=0"],
    "augment_pallas": ["data.augment=pallas"],
    "batch32": [],
}


def measure(name, overrides, batch=16, steps=15, repeats=3):
    from uig.config import apply_overrides, get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.cyclegan import CycleGANTrainer

    cfg = apply_overrides(get_preset("cyclegan256_dp"), [
        f"data.batch_size={batch}", "data.augment=xla",
        "loss.lambda_lpips=0",
    ] + overrides)
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
    # FLOPs from the compiled step for roofline context
    try:
        c = tr._train_step.lower(state, dev[0], dev[1]).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        tf_step = float(ca.get("flops", 0.0)) / 1e12
    except Exception:
        tf_step = 0.0
    frac = tf_step * 1e12 / 197e12 / best if tf_step else 0.0
    print(f"{name:<16s} {best*1e3:7.1f} ms/step  {batch/best:6.1f} img/s  "
          f"{tf_step:6.2f} TF/step  roofline {frac:.3f}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(ABLATIONS)
    for n in names:
        measure(n, ABLATIONS[n], batch=32 if n == "batch32" else 16)
