"""Golden/fidelity tests (SURVEY.md §4): fixed-seed 10-step training matches
a committed loss trajectory, guarding silent numerics drift in the models,
losses, pool, augmentation, or the input stream."""

import json
import os
import sys
import tempfile

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "helpers"))

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens",
                      "loss_trajectory.json")


def test_fixed_seed_trajectory_matches_golden():
    from train_small import tiny_cfg

    from uig.data import make_input_pipeline
    from uig.runtime.mesh import make_mesh
    from uig.train.loop import build_trainer

    cfg = tiny_cfg(tempfile.mkdtemp(), "golden")
    mesh = make_mesh(1)
    tr = build_trainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(cfg.run.seed))
    pipe = make_input_pipeline(cfg, mesh, start=False)
    traj = []
    for _ in range(10):
        state, m = tr.train_step(state, next(pipe))
        traj.append({k: float(v) for k, v in m.items()})

    if os.environ.get("UIG_REGEN_GOLDENS"):
        # regenerate under the exact CI env (device count / thread layout
        # shift fp reduction orders, which Adam then amplifies)
        with open(GOLDEN, "w") as f:
            json.dump({"config": "tests/helpers/train_small.tiny_cfg",
                       "env": "pytest (8 fake cpu devices)",
                       "steps": traj}, f, indent=1)
        return

    with open(GOLDEN) as f:
        golden = json.load(f)["steps"]
    for i, (got_m, want) in enumerate(zip(traj, golden)):
        for k, v in want.items():
            np.testing.assert_allclose(
                got_m[k], v, rtol=1e-4, atol=1e-5,
                err_msg=f"step {i} metric {k}: got {got_m[k]}, golden {v}")
