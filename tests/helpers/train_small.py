"""Subprocess helper: tiny CPU training run for fault-injection tests.

Usage: python tests/helpers/train_small.py <workdir> <name> <max_steps>
                                           [sleep_per_step]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "..", "src"))

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

from uig.config import get_preset


def tiny_cfg(workdir: str, name: str):
    cfg = get_preset("smoke64")
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=16, n_res_blocks=1,
                                  d_layers=2),
        data=dataclasses.replace(cfg.data, batch_size=2, load_size=20,
                                 synthetic_len=12, num_workers=1),
        opt=dataclasses.replace(cfg.opt, pool_size=4, total_steps=100),
        parallel=dataclasses.replace(cfg.parallel, num_devices=1),
        run=dataclasses.replace(cfg.run, name=name, workdir=workdir,
                                log_every=1, ckpt_every=50),
        eval=dataclasses.replace(cfg.eval, sample_grid_every=0),
    )


if __name__ == "__main__":
    workdir, name, max_steps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    sleep = float(sys.argv[4]) if len(sys.argv) > 4 else 0.0
    if sleep:
        # slow the hot loop down so the parent can SIGTERM mid-run
        import uig.train.loop as loop_mod

        orig_next = type(iter([])).__next__  # unused; we patch via timer hook
        from uig.metrics import writer as writer_mod

        orig = writer_mod.StepTimer.step_done

        def slow_step(self, images):
            time.sleep(sleep)
            return orig(self, images)

        writer_mod.StepTimer.step_done = slow_step
    from uig.train.loop import fit

    fit(tiny_cfg(workdir, name), max_steps=max_steps)
    print("DONE")
