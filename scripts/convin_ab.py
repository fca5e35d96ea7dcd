"""A/B: 256² CycleGAN headline step with the trunk conv+IN(+ReLU) pairs
routed through the fused Pallas kernel (model.convin_pallas) vs the XLA
lowering — VERDICT r5 item 2's byte-cutting experiment. Interleaved arms,
best-of-N, plus the XLA-cost-model FLOPs so the roofline frac is
comparable to the recorded headline.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/convin_ab.py [steps] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".xla_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import numpy as np

from uig.config import apply_overrides, get_preset
from uig.runtime import make_mesh, shard_batch
from uig.train.cyclegan import CycleGANTrainer

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 10
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
BATCH = 16

mesh = make_mesh()
rng = np.random.default_rng(0)


def make(arm_convin):
    cfg = apply_overrides(get_preset("cyclegan256_dp"), [
        f"data.batch_size={BATCH}", "data.augment=xla",
        "loss.lambda_lpips=0",
        f"model.convin_pallas={arm_convin}"])
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    L = cfg.data.load_size
    a = rng.integers(0, 255, (BATCH, L, L, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (BATCH, L, L, 3), dtype=np.uint8)
    dev = shard_batch(mesh, (a, b))
    state, m = tr.train_step(state, dev)
    jax.device_get(m)
    return tr, state, dev


def bench(tr, state, dev):
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, m = tr.train_step(state, dev)
        jax.device_get(m)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    return best, state


arms = {}
trs = {k: make(k) for k in (False, True)}
for rnd in range(2):  # interleave
    for k in (False, True):
        tr, state, dev = trs[k]
        t, state = bench(tr, state, dev)
        trs[k] = (tr, state, dev)
        arms[k] = min(arms.get(k, float("inf")), t)

for k, t in arms.items():
    label = "convin_pallas" if k else "xla baseline "
    print(f"{label}: {t * 1e3:8.2f} ms/step  {BATCH / t:6.2f} img/s")
sp = arms[False] / arms[True]
print(f"speedup: {sp:.4f}x   "
      f"({'WIN' if sp > 1.01 else 'NEGATIVE' if sp < 0.99 else 'NEUTRAL'})")
