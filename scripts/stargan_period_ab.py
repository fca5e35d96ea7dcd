"""A/B: stargan128 single-step (lax.cond n_critic schedule) vs the
period-fused program (build_period_step, run.n_critic_fuse) on the real
chip — VERDICT r4 item 7. Both arms measure a full n_critic PERIOD so
img/s is schedule-averaged and directly comparable to the rung number.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/stargan_period_ab.py
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
from uig.train.stargan_trainer import StarGANTrainer

BATCH = 12
cfg = apply_overrides(get_preset("stargan128"), [
    f"data.batch_size={BATCH}", "data.augment=xla", "loss.lambda_lpips=0"])
mesh = make_mesh()
rng = np.random.default_rng(0)
L = cfg.data.load_size
k = cfg.opt.d_steps_per_g
arrs = [rng.integers(0, 255, (BATCH, L, L, 3), dtype=np.uint8)
        for _ in range(k)]
devs = [shard_batch(mesh, (a,)) for a in arrs]

REPEATS, PERIODS = 5, 20


def bench_single(tr):
    state = tr.init_state(jax.random.PRNGKey(0))
    for d in devs:
        state, m = tr.train_step(state, d)
    jax.device_get(m)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(PERIODS):
            for d in devs:
                state, m = tr.train_step(state, d)
        jax.device_get(m)
        best = min(best, (time.perf_counter() - t0) / (PERIODS * k))
    return best


def bench_fused(tr):
    step_p = tr.build_period_step()
    state = tr.init_state(jax.random.PRNGKey(0))
    state, m = step_p(state, devs)
    jax.device_get(m)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for _ in range(PERIODS):
            state, m = step_p(state, devs)
        jax.device_get(m)
        best = min(best, (time.perf_counter() - t0) / (PERIODS * k))
    return best


# interleave arms so tunnel drift can't masquerade as a win
s1 = bench_single(StarGANTrainer(cfg, mesh))
f1 = bench_fused(StarGANTrainer(cfg, mesh))
s2 = bench_single(StarGANTrainer(cfg, mesh))
f2 = bench_fused(StarGANTrainer(cfg, mesh))
ms_single = min(s1, s2) * 1e3
ms_fused = min(f1, f2) * 1e3
print(f"n_critic={k} batch={BATCH} load={L}")
print(f"single-step : {ms_single:.2f} ms/step  {BATCH / ms_single * 1e3:.1f} img/s")
print(f"period-fused: {ms_fused:.2f} ms/step  {BATCH / ms_fused * 1e3:.1f} img/s")
print(f"speedup: {ms_single / ms_fused:.3f}x")
