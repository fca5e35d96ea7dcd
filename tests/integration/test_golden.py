"""Golden/fidelity tests (SURVEY.md §4): fixed-seed 10-step training matches
a committed loss trajectory, guarding silent numerics drift in the models,
losses, pool, augmentation, or the input stream.

Tolerance model (VERDICT round-2 item 10 — the golden used to be valid only
under one exact pytest topology): the committed golden records the env
fingerprint (backend + fake-device count) it was generated under. When the
current env matches, the strict rtol=1e-4 pin applies. Under any other
topology (e.g. plain single-device CPU), fp reduction orders shift and ten
Adam steps of adversarial dynamics amplify them — the measured 1-vs-8-device
spread is up to 22% relative on g_adv — so the test falls back to
per-metric tolerances swept from that measurement (×3 safety), which still
catch gross breakage (sign flips, NaNs, wholesale divergence) everywhere.
"""

import json
import os
import sys
import tempfile

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "helpers"))

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "goldens",
                      "loss_trajectory.json")

# 3x the worst relative 1-device-vs-8-device divergence measured over the
# 10-step trajectory (2026-08-17 sweep), floored at 5%.
LOOSE_RTOL = {
    "d_a": 0.15, "d_b": 0.27, "d_loss": 0.19, "g_adv": 0.65,
    "g_cycle": 0.05, "g_idt": 0.05, "g_loss": 0.09,
}


def _fingerprint() -> str:
    return f"{jax.default_backend()}-{jax.device_count()}"


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
        with open(GOLDEN, "w") as f:
            json.dump({"config": "tests/helpers/train_small.tiny_cfg",
                       "env_fingerprint": _fingerprint(),
                       "steps": traj}, f, indent=1)
        return

    with open(GOLDEN) as f:
        golden = json.load(f)
    strict = golden.get("env_fingerprint") == _fingerprint()
    for i, (got_m, want) in enumerate(zip(traj, golden["steps"])):
        for k, v in want.items():
            assert np.isfinite(got_m[k]), f"step {i} metric {k} not finite"
            if strict:
                rtol, atol = 1e-4, 1e-5
            else:
                rtol, atol = LOOSE_RTOL.get(k, 0.05), 0.02
            np.testing.assert_allclose(
                got_m[k], v, rtol=rtol, atol=atol,
                err_msg=(f"step {i} metric {k}: got {got_m[k]}, golden {v} "
                         f"({'strict' if strict else 'loose'} env tolerance)"))
