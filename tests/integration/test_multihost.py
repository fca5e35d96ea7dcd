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
    # multi-host in-training FID: finite and identical on both hosts (the
    # per-host shard stats were reduced across processes)
    assert np.isfinite(views[0]["fid"]) and views[0]["fid"] >= 0
    assert views[0]["fid"] == views[1]["fid"]
    # with fewer eval images than hosts, the index-less host contributes
    # empty stats (no double-counting) and both hosts still agree
    assert np.isfinite(views[0]["fid_tiny"]) and views[0]["fid_tiny"] >= 0
    assert views[0]["fid_tiny"] == views[1]["fid_tiny"]
    # KID across ragged shards (24 vs 5 features, and 12 vs 0): the padded
    # allgather must reconstruct the global feature set identically
    for key in ("kid", "kid_empty"):
        assert np.isfinite(views[0][key]), key
        assert views[0][key] == views[1][key], key
    # distributed checkpoint roundtrip: the restored state matches what was
    # saved, and one continued step stays bit-identical across hosts
    for v in views:
        assert v["restore_checksum"] == v["checksum"]
    assert views[0]["continued_checksum"] == views[1]["continued_checksum"]
    for k in views[0]["continued_metrics"]:
        assert (views[0]["continued_metrics"][k]
                == views[1]["continued_metrics"][k]), k


def test_maybe_init_multihost_fails_loudly_not_silently(tmp_path):
    """ADVICE.md (high): multihost init must never be silently skipped.

    Three subprocess probes of uig.runtime.mesh.maybe_init_multihost:
      1. single-process, no coordinator env -> RuntimeWarning, continues
      2. backend already initialized (process_count() called first) ->
         RuntimeError, not a silent no-op
      3. enabled=False -> plain no-op
    """
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    src = os.path.join(os.path.dirname(__file__), "..", "..", "src")
    env["PYTHONPATH"] = src + os.pathsep + env.get("PYTHONPATH", "")

    def probe(body):
        code = ("import warnings, jax\n"
                "from uig.runtime.mesh import maybe_init_multihost\n" + body)
        return subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, env=env)

    r = probe(
        "with warnings.catch_warnings(record=True) as w:\n"
        "    warnings.simplefilter('always')\n"
        "    maybe_init_multihost(True)\n"
        "assert any('no distributed coordinator' in str(x.message) for x in w)\n"
        "print('WARNED-OK')\n")
    assert r.returncode == 0 and "WARNED-OK" in r.stdout, r.stdout + r.stderr

    r = probe(
        "jax.process_count()\n"
        "try:\n"
        "    maybe_init_multihost(True)\n"
        "except RuntimeError as e:\n"
        "    assert 'already' in str(e)\n"
        "    print('RAISED-OK')\n")
    assert r.returncode == 0 and "RAISED-OK" in r.stdout, r.stdout + r.stderr

    r = probe("maybe_init_multihost(False)\nprint('NOOP-OK')\n")
    assert r.returncode == 0 and "NOOP-OK" in r.stdout, r.stdout + r.stderr
