"""Observability: structured JSONL metrics + step/stall timing (SURVEY.md §1 L8, §5).

The three BASELINE.json first-class metrics are produced here:
  * images/sec/chip       — StepTimer.throughput
  * input-pipeline stall % — StepTimer.stall_pct (time blocked waiting on the
    host pipeline / total wall time)
  * FID                    — written by uig.eval.fid through MetricsWriter

TensorBoard output is optional (tf.summary if tensorflow importable); JSONL is
always on and is the artifact tests/benches read back.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsWriter:
    """One JSONL line per log event; optional TensorBoard mirror."""

    def __init__(self, workdir: str, name: str = "metrics", tensorboard: bool = False):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, f"{name}.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf  # optional, baked into the image

                self._tb = tf.summary.create_file_writer(
                    os.path.join(workdir, "tb")
                )
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: dict[str, Any]) -> None:
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    try:
                        tf.summary.scalar(k, float(v), step=step)
                    except (TypeError, ValueError):
                        pass

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class StepTimer:
    """Wall-time accounting for the hot loop.

    Usage per step:
        t.data_start(); batch = next(it); t.data_stop()
        state, m = train_step(state, batch)
        t.step_done(batch_images)

    ``stall_pct`` is (time blocked on the host input pipeline) / (total wall
    time) — with a prefetching pipeline this should be ~0 (BASELINE.json
    north star: "the TPU never stalls on host preprocessing").
    """

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._data_t = 0.0
        self._data_mark = None
        self._images = 0
        self._steps = 0

    def data_start(self) -> None:
        self._data_mark = time.perf_counter()

    def data_stop(self) -> None:
        if self._data_mark is not None:
            self._data_t += time.perf_counter() - self._data_mark
            self._data_mark = None

    def step_done(self, images: int) -> None:
        self._images += images
        self._steps += 1

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def throughput(self) -> float:
        """images/sec over the window (divide by chips for images/sec/chip)."""
        e = self.elapsed
        return self._images / e if e > 0 else 0.0

    @property
    def stall_pct(self) -> float:
        e = self.elapsed
        return 100.0 * self._data_t / e if e > 0 else 0.0

    @property
    def sec_per_step(self) -> float:
        return self.elapsed / self._steps if self._steps else 0.0
