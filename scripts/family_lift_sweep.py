"""Round-5 family-lift sweeps (VERDICT r5 item 3): cheap measured levers
for the three rungs at 65-78% of their own ceilings — ugatit fused
applies + batch, nicegan batch, starganv2 batch refinements. Each row is
measure_rung with extra overrides; results print as a table.

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/family_lift_sweep.py [set]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".xla_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from uig.metrics import perf_rungs
from uig.metrics.perf_rungs import RUNGS, measure_rung

SETS = {
    "ugatit": [
        ("ugatit256", [], 16),
        ("ugatit256", ["model.fused_applies=True"], 16),
        ("ugatit256", ["model.fused_applies=True"], 8),
    ],
    "nicegan": [
        ("nicegan256", [], 8),
        ("nicegan256", [], 16),
        ("nicegan256", [], 12),
    ],
    "starganv2": [
        ("starganv2_256", [], 24),
        ("starganv2_256", [], 30),
    ],
}


def main(which):
    rows = []
    for preset_name, extra, batch in SETS[which]:
        base_preset, base_over, _ = RUNGS[preset_name]
        key = f"_sweep_{preset_name}_{batch}_{len(extra)}"
        RUNGS[key] = (base_preset, base_over + extra, batch)
        try:
            r = measure_rung(key, steps=12, repeats=3, target_s=2.0)
            r["config"] = f"{preset_name} B={batch} {' '.join(extra)}"
            rows.append(r)
            print(f"{r['config']:<55s} {r['ms_step']:8.2f} ms "
                  f"{r['img_s']:7.2f} img/s  roofline {r['roofline']:.4f} "
                  f"spread {r['spread']:.3f}", flush=True)
        except Exception as e:
            print(f"{preset_name} B={batch} {extra}: FAILED {e}", flush=True)
    return rows


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "ugatit")
