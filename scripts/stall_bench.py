"""Input-pipeline stall benchmark (BASELINE.json metric 3): run the REAL
host pipeline (decode → prefetch → device_put) against the real training
step and report images/sec + stall %.

Run: PYTHONPATH=src python scripts/stall_bench.py [steps] [batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax

from uig.config import apply_overrides, get_preset
from uig.data import make_input_pipeline
from uig.metrics import StepTimer
from uig.runtime import make_mesh
from uig.train.cyclegan import CycleGANTrainer


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = apply_overrides(get_preset("cyclegan256_dp"), [
        f"data.batch_size={batch}",
        "data.source=synthetic", "data.synthetic_len=64",
        "data.num_workers=8", "data.prefetch=3",
        "loss.lambda_lpips=0",
    ])
    mesh = make_mesh()
    tr = CycleGANTrainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    pipe = make_input_pipeline(cfg, mesh)
    # warmup/compile
    state, m = tr.train_step(state, next(pipe))
    jax.device_get(m)
    timer = StepTimer()
    for _ in range(steps):
        timer.data_start()
        b = next(pipe)
        timer.data_stop()
        state, m = tr.train_step(state, b)
        jax.device_get(m)  # block so stall attribution is exact
        timer.step_done(batch)
    pipe.stop()
    print(f"images/sec/chip: {timer.throughput / jax.device_count():.2f}  "
          f"stall: {timer.stall_pct:.2f}%  "
          f"({timer.sec_per_step*1000:.1f} ms/step)")


if __name__ == "__main__":
    main()
