"""REAL two-process multi-host DP (SURVEY.md §2 "multi-host DP over DCN",
§4 "Multi-host logic"): two OS processes, 4 fake CPU devices each, a global
8-device mesh via jax.distributed — the identical plumbing a TPU pod uses.
Verifies per-host input sharding assembles the global batch, the step runs,
and the pmean'd updates agree bit-wise across processes."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "..", "helpers",
                      "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"localhost:{port}", "2", str(i),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    views = []
    for i in range(2):
        with open(os.path.join(tmp_path, f"proc{i}.json")) as f:
            views.append(json.load(f))
    for v in views:
        assert v["devices"] == 8 and v["local_devices"] == 4
        assert all(np.isfinite(x) for x in v["metrics"].values())
    # replicated state + pmean'd metrics must agree exactly across hosts
    assert views[0]["checksum"] == views[1]["checksum"]
    for k in views[0]["metrics"]:
        assert views[0]["metrics"][k] == views[1]["metrics"][k], k
