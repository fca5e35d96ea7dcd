"""Fault injection (SURVEY.md §5 "Failure detection / elastic recovery"):
SIGTERM a live training subprocess mid-run, restart, and require the resumed
trajectory to land exactly where an uninterrupted run lands."""

import json
import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

HELPER = os.path.join(os.path.dirname(__file__), "..", "helpers",
                      "train_small.py")


def _run(workdir, name, max_steps, wait=True, sleep=0.0):
    p = subprocess.Popen(
        [sys.executable, HELPER, str(workdir), name, str(max_steps),
         str(sleep)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    if wait:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-2000:]
    return p


def _final_state(workdir, name):
    sys.path.insert(0, os.path.join(os.path.dirname(HELPER)))
    from train_small import tiny_cfg

    from uig.checkpoint import CheckpointManager
    from uig.runtime.mesh import make_mesh
    from uig.train.loop import build_trainer

    cfg = tiny_cfg(str(workdir), name)
    tr = build_trainer(cfg, make_mesh(1))
    state = tr.init_state(jax.random.PRNGKey(cfg.run.seed))
    ckpt = CheckpointManager(os.path.join(workdir, name, "ckpt"))
    state, data_state, _ = ckpt.restore(state)
    ckpt.close()
    return jax.tree_util.tree_map(np.asarray, jax.device_get(state)), data_state


@pytest.mark.slow
def test_sigterm_resume_matches_uninterrupted(tmp_path):
    # golden: uninterrupted 6 steps
    _run(tmp_path, "gold", 6)

    # victim: run slowly, SIGTERM once it has logged >= 2 steps
    p = _run(tmp_path, "victim", 6, wait=False, sleep=0.6)
    metrics_path = os.path.join(tmp_path, "victim", "metrics.jsonl")
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(metrics_path) and sum(1 for _ in open(metrics_path)) >= 2:
            break
        if p.poll() is not None:
            raise AssertionError("victim exited early: " + p.stdout.read()[-2000:])
        time.sleep(0.3)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=300)
    assert p.returncode == 0, out[-2000:]  # clean preemption save + exit

    sg, _ = _final_state(tmp_path, "gold")
    sv, _ = _final_state(tmp_path, "victim")
    assert 0 < int(sv.step) < 6  # actually interrupted mid-run

    # resume the victim to 6 and compare bit-exact with the golden run
    _run(tmp_path, "victim", 6)
    sv, dv = _final_state(tmp_path, "victim")
    assert int(sv.step) == 6
    for x, y in zip(jax.tree_util.tree_leaves(sg),
                    jax.tree_util.tree_leaves(sv)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
