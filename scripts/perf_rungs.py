"""Roofline fractions for EVERY BASELINE.json rung (VERDICT round-2 item 6:
"no blank roofline cells") — measures img/s + XLA-cost-model FLOPs for each
trainer family at its headline config, on the real chip.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/perf_rungs.py [names...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import numpy as np

PEAK_BF16 = 197e12  # v5e

# name -> (preset, overrides, batch)
RUNGS = {
    "cyclegan128": ("cyclegan128", [], 16),
    "cyclegan256": ("cyclegan256_dp", [], 16),
    "cut256": ("cut256_multihost", ["parallel.multihost=False"], 16),
    # the official CUT topology (blur-pool/blur-up resampling); taps shifted
    # to the antialias layer list (stem / both post-IN-relu down features /
    # mid-trunk — the same stages the strided taps hit)
    "cut256_antialias": ("cut256_multihost", [
        "parallel.multihost=False", "model.resample=antialias",
        "model.nce_layers=(0,6,10,15)"], 16),
    "fastcut256": ("fastcut256", [], 16),
    "dclgan256": ("dclgan256", [], 16),
    "gcgan256": ("gcgan256", [], 16),
    "unit256": ("unit256", [], 16),
    "munit256": ("munit256", ["parallel.multihost=False"], 16),
    # batch 12: per-device batch must be a multiple of num_domains=3
    "stargan128": ("stargan128", [], 12),
    "starganv2_256": ("starganv2_256", [], 12),
    "ugatit256": ("ugatit256", [], 8),
    "nicegan256": ("nicegan256", [], 8),
    "vaegan256": ("vaegan256", [], 8),
    "vqgan256": ("vqgan512", ["model.image_size=256", "model.remat=none"], 4),
    "vqgan512": ("vqgan512", ["model.remat=blocks"], 8),
    # grad-accum-vs-remat A/B at the memory-bound rung: both memory levers
    # fit 512² B=8; remat pays recompute FLOPs, grad_accum pays microbatch
    # (B=2) execution efficiency. Adaptive weight off in BOTH arms (accum
    # cannot run it — see VQGANTrainer validation), so the pair is fair.
    "vqgan512_remat": ("vqgan512", ["model.remat=blocks",
                                    "loss.vq_adaptive_weight=false"], 8),
    # k=8 -> microbatch 2 over the 2B=16 union batch (microbatch 4 OOMs at
    # remat=none: fp32 GroupNorm temps are 520 MB each at 512² batch 4)
    "vqgan512_accum": ("vqgan512", ["model.remat=none", "opt.grad_accum=8",
                                    "loss.vq_adaptive_weight=false"], 8),
    # and the composition of both levers at microbatch 4
    "vqgan512_accum_remat": ("vqgan512", ["model.remat=blocks",
                                          "opt.grad_accum=4",
                                          "loss.vq_adaptive_weight=false"], 8),
}


def measure(name, steps=12, repeats=3):
    preset, overrides, batch = RUNGS[name]
    from uig.config import apply_overrides, get_preset
    from uig.runtime import make_mesh, shard_batch
    from uig.train.loop import build_trainer

    cfg = apply_overrides(get_preset(preset), [
        f"data.batch_size={batch}", "data.augment=xla",
        "loss.lambda_lpips=0",
    ] + overrides)
    mesh = make_mesh()
    tr = build_trainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    L = cfg.data.load_size
    a = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
    # stargan consumes ONE interleaved multi-domain array; v2 takes THREE
    if cfg.model.kind == "stargan":
        dev = shard_batch(mesh, (a,))
    elif cfg.model.kind == "starganv2":
        c = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
        dev = shard_batch(mesh, (a, b, c))
    else:
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
    tf_step = 0.0
    try:
        c = tr._train_step.lower(state, *(
            (tr.vqgan_params, dev[0], dev[1])
            if hasattr(tr, "vqgan_params") else tuple(dev))).compile()
        ca = c.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        tf_step = float(ca.get("flops", 0.0)) / 1e12
    except Exception as e:
        print(f"  (cost analysis failed: {e})", flush=True)
    frac = tf_step * 1e12 / PEAK_BF16 / best if tf_step else 0.0
    print(f"{name:<14s} {best*1e3:7.1f} ms/step  {batch/best:6.1f} img/s  "
          f"{tf_step:6.2f} TF/step  roofline {frac:.3f}", flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or list(RUNGS)
    for n in names:
        try:
            measure(n)
        except Exception as e:
            print(f"{n:<14s} FAILED: {type(e).__name__}: {e}", flush=True)
