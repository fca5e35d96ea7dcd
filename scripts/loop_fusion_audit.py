"""Audit the INDIVIDUAL loop fusions of a rung's step (default: the 256²
CycleGAN headline): top-N device ops by time with bytes/FLOPs, plus the
exact HLO computation behind each hot fusion (from the compiled module
text), so a byte-cutting lever (e.g. conv+IN-stats fusion, VERDICT r5
item 2) targets the ops that actually carry the 37 GB/step — not a guess.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/loop_fusion_audit.py \
        [steps] [rung] [topn]
"""
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".xla_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import numpy as np

PEAK_HBM = 819e9


def main(steps=4, rung="cyclegan256", topn=30):
    from uig.config import apply_overrides, get_preset
    from uig.metrics.perf_rungs import RUNGS
    from uig.runtime import make_mesh, shard_batch
    from uig.train.loop import build_trainer

    preset, overrides, batch = RUNGS[rung]
    extra = [o for o in os.environ.get("UIG_AUDIT_OVERRIDES", "").split(",")
             if o]
    cfg = apply_overrides(get_preset(preset), [
        f"data.batch_size={batch}", "data.augment=xla",
        "loss.lambda_lpips=0"] + overrides + extra)
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

    # compiled HLO text for fusion bodies
    try:
        hlo = tr._train_step.lower(state, *bd).compile().as_text()
    except Exception as e:
        hlo = ""
        print(f"# no HLO text: {e}")

    outdir = tempfile.mkdtemp(prefix="uig_fusion_audit_")
    jax.profiler.start_trace(outdir)
    for _ in range(steps):
        state, m = tr.train_step(state, bd)
    jax.device_get(m)
    jax.profiler.stop_trace()
    tracef = max(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                           recursive=True), key=os.path.getmtime)
    with gzip.open(tracef) as f:
        trj = json.load(f)
    ev = trj["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "/device:" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("args", {}).get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    agg = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0, ""])
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        a_ = e.get("args", {})
        key = e.get("name", "?")
        agg[key][0] += float(a_.get("device_duration_ps", 0))
        agg[key][1] += float(a_.get("model_flops", 0) or 0)
        agg[key][2] += float(a_.get("bytes_accessed", 0) or 0)
        agg[key][3] += 1
        agg[key][4] = a_.get("hlo_category", "?")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:topn]
    print(f"{'op':<34s} {'cat':<22s} {'ms/step':>8s} {'GB/step':>8s} "
          f"{'GB/s':>6s} {'n':>3s}")
    total = sum(v[0] for v in agg.values()) / 1e12 * 1e3 / steps
    shown = 0.0
    for name, (d, fl, by, n, cat) in rows:
        ms = d / 1e12 * 1e3 / steps
        shown += ms
        gb = by / steps / 1e9
        bw = by / (d / 1e12) / 1e9 if d else 0
        print(f"{name:<34s} {cat:<22s} {ms:8.3f} {gb:8.3f} {bw:6.0f} "
              f"{n // steps:3d}")
    print(f"# shown {shown:.1f} / total {total:.1f} ms/step")

    if hlo:
        hpath = os.path.join(outdir, "compiled.hlo.txt")
        with open(hpath, "w") as f:
            f.write(hlo)
        print(f"# HLO text: {hpath}")
        # print the body op-kinds of the top loop fusions
        for name, (d, fl, by, n, cat) in rows:
            if "fusion" not in cat and "fusion" not in name:
                continue
            mm = re.search(rf"%?{re.escape(name)} = [^\n]+ fusion\([^\n]*"
                           rf"calls=%?([\w.\-]+)", hlo)
            if not mm:
                continue
            cname = mm.group(1)
            cm = re.search(rf"%?{re.escape(cname)} [^\n]*\{{(.*?)\n\}}", hlo,
                           re.S)
            if not cm:
                continue
            body = cm.group(1)
            kinds = collections.Counter(
                re.findall(r"= *[\w\[\], ]+? (\w+)\(", body))
            shapes = collections.Counter(
                re.findall(r"= *(\w+\[[\d,]*\])", body))
            big = [s for s, c in shapes.most_common(6)]
            print(f"\n== {name} ({d / 1e12 * 1e3 / steps:.3f} ms/step) "
                  f"calls {cname}")
            print("   ops:", dict(kinds.most_common(12)))
            print("   top shapes:", big)


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rung = sys.argv[2] if len(sys.argv) > 2 else "cyclegan256"
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    main(steps, rung, topn)
