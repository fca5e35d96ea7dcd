"""The per-op step-time budget behind the headline roofline number
(VERDICT round-3 item 2): capture a jax.profiler trace of the 256²
CycleGAN step on the real chip, aggregate DEVICE op time by HLO category,
and derive the practical composite ceiling C a skeptical reader can audit.

Method: the profiler's device lane records per-op `device_duration_ps`,
`model_flops` and `bytes_accessed`.  Per category this gives
  * achieved MXU fraction (flops / peak / time) for compute ops,
  * achieved HBM bandwidth for movement-bound ops.
The ceiling per class is measured, not asserted: convs are bounded by the
best conv-internal efficiency observed in-graph; loop fusions are
bandwidth-bound (they already run at ~94% of HBM peak), so their floor is
bytes/HBM_peak; the small rest (reverses, copies, scalar misc) is taken
at its measured time.  C = ideal_step / Σ(per-class floors).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/perf_budget.py [steps]
"""

import collections
import glob
import gzip
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import numpy as np

PEAK_TF = 197e12  # v5e bf16
PEAK_HBM = 819e9  # v5e HBM GB/s


def capture(steps, rung="cyclegan256"):
    from uig.config import apply_overrides, get_preset
    from uig.metrics.perf_rungs import RUNGS
    from uig.runtime import make_mesh, shard_batch
    from uig.train.loop import build_trainer

    preset, overrides, batch = RUNGS[rung]
    cfg = apply_overrides(get_preset(preset), [
        f"data.batch_size={batch}", "data.augment=xla",
        "loss.lambda_lpips=0"] + overrides)
    mesh = make_mesh()
    tr = build_trainer(cfg, mesh)
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    L = cfg.data.load_size
    a = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
    b = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
    if cfg.model.kind == "stargan":
        bd = shard_batch(mesh, (a,))
    elif cfg.model.kind == "starganv2":
        c = rng.integers(0, 255, (batch, L, L, 3), dtype=np.uint8)
        bd = shard_batch(mesh, (a, b, c))
    else:
        bd = shard_batch(mesh, (a, b))
    for _ in range(2):
        state, m = tr.train_step(state, bd)
    jax.device_get(m)
    outdir = tempfile.mkdtemp(prefix="uig_budget_trace_")
    jax.profiler.start_trace(outdir)
    for _ in range(steps):
        state, m = tr.train_step(state, bd)
    jax.device_get(m)
    jax.profiler.stop_trace()
    traces = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                       recursive=True)
    assert traces, f"no trace written under {outdir}"
    return max(traces, key=os.path.getmtime)


def budget(trace_path, steps):
    with gzip.open(trace_path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # device process: the pid whose metadata name is a /device: lane
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    ops = [e for e in ev if e.get("ph") == "X"
           and (e.get("pid"), e.get("tid")) in op_tids]
    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for e in ops:
        a = e.get("args", {})
        c = a.get("hlo_category", "?")
        agg[c][0] += float(a.get("device_duration_ps", 0))
        agg[c][1] += float(a.get("model_flops", 0) or 0)
        agg[c][2] += float(a.get("bytes_accessed", 0) or 0)
        agg[c][3] += 1
    tot_ps = sum(v[0] for v in agg.values())
    print(f"{'hlo_category':<26s} {'ms/step':>8s} {'%':>5s} {'TF/step':>8s} "
          f"{'mxu_frac':>8s} {'GB/s':>6s} {'n/step':>6s}")
    rows = {}
    for c, (d, f, b, n) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        ms = d / 1e12 * 1e3 / steps
        tf = f / steps / 1e12
        sec = d / 1e12 / steps
        frac = (f / steps) / PEAK_TF / sec if sec else 0.0
        bw = (b / steps) / sec / 1e9 if sec else 0.0
        rows[c] = (ms, tf, b / steps)
        if ms >= 0.005:
            print(f"{c:<26s} {ms:8.2f} {100 * d / tot_ps:5.1f} {tf:8.3f} "
                  f"{frac:8.3f} {bw:6.0f} {n // steps:6d}")
    total_ms = tot_ps / 1e12 * 1e3 / steps
    print(f"{'TOTAL (device)':<26s} {total_ms:8.2f}")

    # ---- practical composite ceiling ----
    conv_ms, conv_tf, _ = rows.get("convolution fusion", (0, 0, 0))
    loop_ms, _, loop_bytes = rows.get("loop fusion", (0, 0, 0))
    rest_ms = total_ms - conv_ms - loop_ms
    tot_tf = sum(v[1] for v in rows.values())
    conv_eff = conv_tf / (PEAK_TF / 1e12) / (conv_ms / 1e3) if conv_ms else 0
    # best conv-internal efficiency measured in this repo (isolated trunk
    # ResnetBlock fwd+bwd scan, scripts/perf_breakdown.py): 0.77
    conv_floor_ms = conv_tf / (PEAK_TF / 1e12) / 0.77 * 1e3
    loop_floor_ms = loop_bytes / PEAK_HBM * 1e3
    ideal_ms = tot_tf / (PEAK_TF / 1e12) * 1e3
    ceiling = ideal_ms / (conv_floor_ms + loop_floor_ms + rest_ms)
    ach = ideal_ms / total_ms
    print(f"\nconv-internal efficiency (in-graph): {conv_eff:.3f}")
    print(f"loop-fusion achieved bandwidth:      "
          f"{loop_bytes / (loop_ms / 1e3) / 1e9:.0f} GB/s "
          f"({100 * loop_bytes / (loop_ms / 1e3) / PEAK_HBM:.1f}% of HBM peak)")
    print(f"practical composite ceiling C:       {ceiling:.3f}  "
          f"(= {ideal_ms:.1f} ideal / [conv@0.77 {conv_floor_ms:.1f} + "
          f"bytes@HBM {loop_floor_ms:.1f} + rest {rest_ms:.1f}] ms)")
    print(f"achieved step roofline:              {ach:.3f}  "
          f"({100 * ach / ceiling:.1f}% of C)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rung = sys.argv[2] if len(sys.argv) > 2 else "cyclegan256"
    path = capture(n, rung)
    print(f"# rung: {rung}  trace: {path}")
    budget(path, n)
