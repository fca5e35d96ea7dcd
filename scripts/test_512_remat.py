"""512² VQGAN on-chip memory/remat probe (VERDICT round-1 item 5).

Round-1 finding: model.remat=full at 512² deterministically fails the
environment's remote compiler (HTTP 500); without remat 512² fits only at
batch ≤ 2. This script tries remat=blocks (per-residual-block
jax.checkpoint) at growing batch sizes and records what compiles + runs.

Run: PYTHONPATH=src:$PYTHONPATH python scripts/test_512_remat.py [remat] [batches]
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
from uig.train.vqgan_trainer import VQGANTrainer


def main():
    remat = sys.argv[1] if len(sys.argv) > 1 else "blocks"
    batches = [int(b) for b in
               (sys.argv[2] if len(sys.argv) > 2 else "4,2").split(",")]
    for batch in batches:
        cfg = apply_overrides(get_preset("vqgan512"), [
            f"model.remat={remat}",
            f"data.batch_size={batch}",
            "data.augment=xla",
            "loss.vq_adaptive_weight=false",
        ])
        try:
            mesh = make_mesh()
            tr = VQGANTrainer(cfg, mesh)
            state = tr.init_state(jax.random.PRNGKey(0))
            rng = np.random.default_rng(0)
            L = cfg.data.load_size
            a = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
            b = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
            dev = shard_batch(mesh, (a, b))
            t0 = time.perf_counter()
            state, m = tr.train_step(state, dev)
            jax.device_get(m)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(5):
                state, m = tr.train_step(state, dev)
            jax.device_get(m)
            dt = (time.perf_counter() - t0) / 5
            print(f"512^2 VQGAN remat={remat} batch={batch}: OK  "
                  f"{dt*1000:.0f} ms/step ({batch/dt:.2f} img/s) "
                  f"[compile {compile_s:.0f}s] metrics="
                  f"{ {k: round(float(v), 3) for k, v in m.items()} }",
                  flush=True)
        except Exception as e:
            print(f"512^2 VQGAN remat={remat} batch={batch}: FAIL "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
