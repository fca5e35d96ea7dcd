"""Checkpoint / exact resume — L5 (SURVEY.md §2 "Checkpointing", §5).

orbax-checkpoint, async, sharded. A checkpoint is the FULL training state
pytree (2G+2D params, both Adam states, EMA, replay-pool buffers + counters,
base PRNG key, step) plus the input-pipeline cursor and the resolved config —
so restore + continue reproduces the uninterrupted run bit-for-bit
(tests/integration/test_resume.py; SURVEY.md §5 "Failure detection":
preemption-safe final save + exact resume).

Retention: keep-last-N plus optional best-FID (``keep_best_fn``).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3,
                 best_metric: str | None = None, best_mode: str = "min"):
        """keep-last-N retention; with ``best_metric`` (e.g. "fid") the best
        checkpoint by that metric is additionally retained (SURVEY.md §5
        "keep-last-N + best-FID retention")."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        kwargs = {}
        if best_metric:
            kwargs = dict(
                best_fn=lambda m: m.get(best_metric, float("inf")),
                best_mode=best_mode,
            )
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True,
                **kwargs,
            ),
        )

    def save(self, step: int, state: Any, data_state: dict | None = None,
             extra: dict | None = None, force: bool = False,
             metrics: dict | None = None) -> None:
        """Async save of the state pytree + JSON side-state."""
        meta = {"data_state": data_state or {}, "extra": extra or {}}
        self._mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
            force=force,
            metrics=metrics,
        )

    def restore(self, state_template: Any, step: int | None = None):
        """Restore (state, data_state, extra) at ``step`` (default: latest).

        ``state_template`` provides structure/shardings — pass the freshly
        initialized state from Trainer.init_state so arrays land on the mesh
        with their original shardings.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if hasattr(x, "sharding")
            else x,
            state_template,
        )
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
        meta = restored["meta"]
        return restored["state"], meta.get("data_state", {}), meta.get("extra", {})

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def all_steps(self):
        return self._mngr.all_steps()

    def wait(self) -> None:
        """Block until in-flight async saves land (call before exit)."""
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.wait_until_finished()
        self._mngr.close()


def dump_run_config(cfg_dict: dict, workdir: str) -> None:
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, "config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=2, sort_keys=True)
